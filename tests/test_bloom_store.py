"""BloomFilterStore (operators/bloom_store.py) — the persisted
incremental decontamination bloom, the BITWISE-OR-merge member of the
snapshot store family.

The driver-level oracle row is decontaminate_incremental
(queries_extensions.py), whose SQL builds the one-shot bloom over the
concatenated benchmark; these tests pin what that oracle can't see:
the OR-merge property (absorb in any split = one-shot bitmap), probe
equivalence with the batch bloom_contamination operator, OR
idempotence (re-absorbing the same suite changes no bit), prune()
semantics (state collapses to one row per word index; prune-then-
absorb == absorb), exactly-once emission replay, per-stage
commit-crash recovery through the shared _SnapshotArtifactStore seam,
reopen/format/params pinning, and the streaming foreachBatch twin.

Reference scope: the reference engine has no text/benchmark surface
(SURVEY.md section 2.3) — published decontamination practice (GPT-3
appendix C style n-gram overlap) in suite-by-suite registration form.
"""

from __future__ import annotations

import json
import os

import pytest

from time_series_storage_spark.operators.bloom_store import BloomFilterStore
from time_series_storage_spark.operators.dedup import bloom_contamination

SCHEMA = "doc_id long, text string"
M = 1 << 14  # small filter so tests stay light; words still span rows

SUITE1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
]
SUITE2 = [
    (3, "how vexingly quick daft zebras jump"),
    (4, "the quick brown fox naps all afternoon"),
]
CORPUS = [
    (100, "the quick brown fox jumps over the lazy dog"),  # = suite1 doc
    (101, "how vexingly quick daft zebras jump today"),    # mostly suite2
    (102, "completely unrelated training material here"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _words(store):
    return {(r.wi, r.bits) for r in store.words().collect()}


def _probe_rows(df):
    return sorted(
        (r.doc_id, r.n_shingles, r.n_hit, r.contam_x1000, r.is_contaminated)
        for r in df.collect()
    )


def test_bloom_or_merge_equals_one_shot(spark, tmp_path):
    """absorb(suite1); absorb(suite2) == the batch bloom over
    suite1+suite2: identical words, identical probe rows."""
    store = BloomFilterStore(spark, str(tmp_path / "a"), k=8, m_bits=M)
    store.absorb(_df(spark, SUITE1))
    store.absorb(_df(spark, SUITE2))
    got = _probe_rows(store.probe(_df(spark, CORPUS)))
    want = _probe_rows(
        bloom_contamination(
            _df(spark, CORPUS), _df(spark, SUITE1 + SUITE2),
            "doc_id", "text", k=8, m_bits=M,
        )
    )
    assert got == want
    # the fully-contained doc is flagged; the unrelated one is not
    flags = {d: c for d, _, _, _, c in got}
    assert flags[100] == 1 and flags[102] == 0


def test_bloom_idempotent_reabsorb(spark, tmp_path):
    """Re-absorbing suite1 (no batch_id — a manual double-register)
    changes NO bit: OR idempotence, the discipline's signature."""
    store = BloomFilterStore(spark, str(tmp_path / "i"), k=8, m_bits=M)
    store.absorb(_df(spark, SUITE1))
    before = _words(store)
    store.absorb(_df(spark, SUITE1))
    assert _words(store) == before


def test_bloom_emission_receipt_and_replay(spark, tmp_path):
    """absorb emits (doc_id, n_shingles) receipts; replaying a
    committed batch_id re-reads them without appending state."""
    store = BloomFilterStore(spark, str(tmp_path / "r"), k=8, m_bits=M)
    out = store.absorb(_df(spark, SUITE1), batch_id=0)
    got = {r.doc_id: r.n_shingles for r in out.collect()}
    assert got == {d: _n_shingles(t) for d, t in SUITE1}
    files_before = sorted(os.listdir(store._current_dir()))
    replay = store.absorb(_df(spark, SUITE1), batch_id=0)
    assert {r.doc_id: r.n_shingles for r in replay.collect()} == got
    assert sorted(os.listdir(store._current_dir())) == files_before


def _n_shingles(text: str) -> int:
    """Distinct 8-char shingles per doc — hashed_shingles dedups."""
    n = max(len(text) - 7, 1)
    return len({text[i : i + 8] for i in range(n)})


def test_bloom_reopen_and_pins(spark, tmp_path):
    p = str(tmp_path / "o")
    store = BloomFilterStore(spark, p, k=8, m_bits=M)
    store.absorb(_df(spark, SUITE1))
    words = _words(store)
    again = BloomFilterStore(spark, p, k=8, m_bits=M)
    assert _words(again) == words
    meta = json.load(open(os.path.join(p, "_current")))
    assert meta["format"] == BloomFilterStore.FORMAT
    assert meta["params"] == [f"bloom-v1:m={M},k=8"]
    with pytest.raises(ValueError, match="params"):
        BloomFilterStore(spark, p, k=8, m_bits=M * 2)


@pytest.mark.parametrize(
    "stage", ["post_write", "mid_link", "post_link", "post_publish"]
)
def test_bloom_commit_crash_replay(spark, tmp_path, stage):
    """Per-stage crash leaves the bitmap on the old version; the retry
    under the same batch_id converges with no stray staging dirs."""
    store = BloomFilterStore(spark, str(tmp_path / "c"), k=8, m_bits=M)
    store.absorb(_df(spark, SUITE1), batch_id=0)
    before = _words(store)

    def boom(s):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    store._commit_fault = boom
    with pytest.raises(RuntimeError, match="injected"):
        store.absorb(_df(spark, SUITE2), batch_id=1)
    store._commit_fault = None
    assert json.load(
        open(os.path.join(tmp_path / "c", "_current"))
    )["batch"] == 0
    assert _words(store) == before

    store.absorb(_df(spark, SUITE2), batch_id=1)
    whole = BloomFilterStore(spark, str(tmp_path / "w"), k=8, m_bits=M)
    whole.absorb(_df(spark, SUITE1 + SUITE2))
    assert _words(store) == _words(whole)
    assert not [
        n for n in os.listdir(tmp_path / "c") if n.startswith(".staging-")
    ]


def test_bloom_prune_is_semantically_invisible(spark, tmp_path):
    """prune() collapses the words table to one row per distinct wi;
    probes are unchanged and a post-prune absorb equals the
    never-pruned twin."""
    pruned = BloomFilterStore(spark, str(tmp_path / "p"), k=8, m_bits=M)
    plain = BloomFilterStore(spark, str(tmp_path / "q"), k=8, m_bits=M)
    for s in (pruned, plain):
        s.absorb(_df(spark, SUITE1))
        s.absorb(_df(spark, SUITE2))
    before = _words(pruned)
    assert pruned.prune() > 0
    assert _words(pruned) == before
    raw = pruned._table("blm", "wi long, bits long")
    per_wi = raw.groupBy("wi").count().where("count > 1").count()
    assert per_wi == 0  # one row per word index after prune
    suite3 = [(5, "sphinx of black quartz judge my vow")]
    pruned.absorb(_df(spark, suite3))
    plain.absorb(_df(spark, suite3))
    assert _words(pruned) == _words(plain)


def test_bloom_foreach_batch_streaming(spark, tmp_path):
    """File-stream twin: suites register exactly once through
    foreachBatch; the final bitmap equals the one-shot build."""
    store = BloomFilterStore(spark, str(tmp_path / "s"), k=8, m_bits=M)
    src = str(tmp_path / "feed")
    _df(spark, SUITE1).coalesce(1).write.parquet(src + "/f0")
    _df(spark, SUITE2).coalesce(1).write.parquet(src + "/f1")

    emitted = {}

    def emit(df, bid):
        emitted[bid] = {r.doc_id: r.n_shingles for r in df.collect()}

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(
            store.foreach_batch("doc_id", "text", emit)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert len(emitted) == 2
    whole = BloomFilterStore(spark, str(tmp_path / "w"), k=8, m_bits=M)
    whole.absorb(_df(spark, SUITE1 + SUITE2))
    assert _words(store) == _words(whole)
    assert set().union(*(set(v) for v in emitted.values())) == {1, 2, 3, 4}
