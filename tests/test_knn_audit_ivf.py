"""IVF-served label audit (queries_extensions.q_knn_label_audit_ivf)
— the at-scale serving recipe as tested code (r10 verdict, wrong #2).

The driver gate hash-checks the served path against an oracle that
REPLAYS the approximation, so it cannot see approximation QUALITY;
this pins it: at the audit's pinned nprobe, the served vote must
agree with the exact brute-force vote on >= 85% of audited vectors
(measured 91.5% on this corpus — near-uniform embeddings, the
hardest regime for IVF recall), and the vote stage itself is the
SAME function for both paths (knn_label_vote), so any residual
disagreement is neighbor recall, never vote logic.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_exact_vs_ivf_served_vote_agreement(spark):
    import time_series_storage_spark.operators.similarity as S
    import time_series_storage_spark.queries_extensions as QX

    emb = QX._emb(spark, SF_DIR)
    queries = emb.where(F.col("vec_id") < QX.KNN_AUDIT_N)
    exact = {
        r.q_id: (r.pred_label, r.is_mismatch)
        for r in S.knn_label_audit(
            queries, emb, k=QX.KNN_AUDIT_K
        ).collect()
    }
    index = QX._ivf_index(spark, SF_DIR, kmeans_iters=2)
    nn = index.topk(
        queries, k=QX.KNN_AUDIT_K, nprobe=QX.KNN_IVF_NPROBE
    )
    served = {
        r.q_id: (r.pred_label, r.is_mismatch)
        for r in S.knn_label_vote(nn, queries, emb).collect()
    }
    assert set(served) == set(exact)  # every audited vector voted
    agree = sum(1 for k in exact if exact[k] == served[k]) / len(exact)
    assert agree >= 0.85, f"vote agreement {agree:.3f} below pin"


def test_knn_label_vote_is_shared_stage(spark):
    """The exact audit must route through the same vote function the
    served path uses — brute-force neighbors into knn_label_vote
    reproduce knn_label_audit exactly."""
    import time_series_storage_spark.operators.similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5), 1.0], i % 3)
         for i in range(40)],
        "vec_id long, embedding array<double>, label int",
    )
    q = emb.where(F.col("vec_id") < 10)
    nn = S.brute_force_topk(q, emb, "vec_id", "embedding", k=5)
    via_vote = sorted(
        map(tuple, S.knn_label_vote(nn, q, emb).collect())
    )
    direct = sorted(
        map(tuple, S.knn_label_audit(q, emb, k=5).collect())
    )
    assert via_vote == direct and len(direct) == 10
