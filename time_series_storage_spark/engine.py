"""The TimeSeries engine — public API mirroring the reference protocol.

One method per protocol entry of
/root/reference/src/time_series_storage/api.clj:3-47:

    init_schema / drop_schema / define_fact / define_dimension /
    update_dimension / facts / fact / dimensions / new_fact / inc /
    get_timeseries / get_histogram

plus idiomatic bulk entry points (``ingest_df``) and DataFrame-returning
query methods (``get_timeseries`` returns a DataFrame; the reference's
nested-map shape is available via ``get_timeseries_map`` for
behavioral-parity tests).

Read-path plan (reference lifecycle, SURVEY.md section 3.2), all one
Spark job:

    events (partition-pruned scan: fact = id, day range)
      -> filter: grouping dims present, non-nil equality filters,
         slice-bucket range (both endpoints inclusive after bucketing,
         postgres/query.clj:16-17)
      -> groupBy(series dims, date_trunc(step, slice_bucket + offset))
         with per-fact-type aggregate            [single shuffle]
      -> left join onto broadcast dense grid, coalesce(filler)
"""

from __future__ import annotations

import datetime as dt
from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import Catalog, Dimension, Fact
from .errors import (
    GroupOnlyDimensionError,
    InvalidStepError,
    NilCategoryError,
    NoTrackingDimensionError,
)
from .functions.time import STEPS, slice_datetime, slice_expr
from .operators.collapse import collapse, fill_range, measure_columns
from .operators.rollup import best_grouping
from .sources.events import EventStore, MemoryEventStore, ParquetEventStore


class TimeSeries:
    """PySpark-native re-implementation of the reference TimeSeries protocol."""

    def __init__(
        self,
        spark: SparkSession,
        store: Optional[EventStore] = None,
        events_path: Optional[str] = None,
        catalog_path: Optional[str] = None,
        rollup_store=None,
    ):
        self.spark = spark
        if store is None:
            store = (
                ParquetEventStore(spark, events_path)
                if events_path
                else MemoryEventStore(spark)
            )
        self.store = store
        # optional materialized-rollup layer (plans.RollupStore): reads
        # prefer a covering materialized rollup over raw-event
        # aggregation, the reference's read architecture
        # (postgres/query.clj:30-47)
        self.rollup_store = rollup_store
        self.catalog_path = catalog_path
        if catalog_path:
            try:
                self.catalog = Catalog.load(catalog_path)
            except FileNotFoundError:
                self.catalog = Catalog()
        else:
            self.catalog = Catalog()

    # -- schema lifecycle (api.clj init-schema!/drop-schema!) --------------

    def init_schema(self) -> None:
        """Create/reset the metadata registry (reference postgres.clj:15-17)."""
        self.catalog.clear()
        self._persist_catalog()

    def drop_schema(self) -> None:
        """Drop all engine-owned state and nothing else.

        The reference enumerates its own rollup tables from metadata and
        drops exactly those (postgres.clj:19-23, tested
        postgres_test.clj:185-201). Our state is the catalog file, the
        event store path, and any attached materialized-rollup store
        (reads prefer a covering rollup, so leaving one behind would
        silently serve pre-drop data after a re-define); streaming batch
        markers live under those two paths and go with them. External
        tables are untouched by construction.
        """
        self.store.clear()
        if self.rollup_store is not None:
            self.rollup_store.drop_all()
        self.catalog.clear()
        self._persist_catalog()

    def _persist_catalog(self) -> None:
        if self.catalog_path:
            self.catalog.save(self.catalog_path)

    # -- catalog (api.clj define-fact!/define-dimension!/...) --------------

    def define_fact(self, fact_id: str, fact_type: str, slice: int = 15, **options) -> Fact:
        f = self.catalog.define_fact(fact_id, fact_type, slice, **options)
        self._persist_catalog()
        return f

    def define_dimension(self, dim_id: str, **options) -> Dimension:
        d = self.catalog.define_dimension(dim_id, **options)
        self._persist_catalog()
        return d

    def update_dimension(self, dim_id: str, fact_id: str) -> Dimension:
        """Attach fact to dimension (postgres.clj:42-47).

        No backfill DDL is needed: rollups are derived from raw events, so
        the new (dimension x fact) combination is queryable immediately,
        including retroactively — a strict improvement over the reference,
        which only aggregates events arriving after the attach.

        Any previously materialized rollup for this (dimension x fact) is
        invalidated (the reference re-creates these tables at attach time,
        postgres/schema.clj:244-259): a stale snapshot from before a
        re-attach must not shadow the raw events. Queries fall back to
        raw until the rollup is materialized again.
        """
        d = self.catalog.update_dimension(dim_id, fact_id)
        if self.rollup_store is not None:
            self.rollup_store.invalidate(d, fact_id)
        self._persist_catalog()
        return d

    def facts(self) -> list[Fact]:
        return self.catalog.facts()

    def fact(self, fact_id: str) -> Fact:
        return self.catalog.fact(fact_id)

    def dimensions(self) -> list[Dimension]:
        return self.catalog.dimensions()

    def dimension(self, dim_id: str) -> Dimension:
        return self.catalog.dimension(dim_id)

    # -- ingest (api.clj new-fact!/inc!) -----------------------------------

    def _validate_event(self, fact_id: str, categories: Mapping[str, object]):
        """Reference validations, postgres.clj:58-81 (see SURVEY.md 3.1)."""
        if any(v is None for v in categories.values()):
            raise NilCategoryError()
        fact = self.catalog.fact(fact_id)  # raises UnknownFactError
        dims = self.catalog.dimensions_for(categories.keys())
        tracking = {k: d for k, d in dims.items() if fact.id in d.facts}
        if not tracking:
            raise NoTrackingDimensionError()
        return fact

    def new_fact(
        self,
        fact_id: str,
        value: float,
        categories: Mapping[str, str],
        ts: Optional[dt.datetime] = None,
    ) -> None:
        """Ingest one observation (reference new-fact!, postgres.clj:58-81).

        The reference's per-event fan-out of (dims x paths) upserts in one
        JDBC transaction collapses to a single append — rollups are
        derived at read time, so the all-or-nothing guarantee is the
        atomicity of the append itself.
        """
        self._validate_event(fact_id, categories)
        ts = ts or dt.datetime.now()
        self.store.append_rows(
            [(str(fact_id), ts, float(value), {str(k): str(v) for k, v in categories.items()})]
        )

    def inc(
        self,
        fact_id: str,
        categories: Mapping[str, str],
        ts: Optional[dt.datetime] = None,
    ) -> None:
        """Sugar: new_fact with value 1 (reference inc!, postgres.clj:83-101)."""
        self.new_fact(fact_id, 1, categories, ts)

    def ingest_df(
        self,
        fact_id: str,
        df: DataFrame,
        ts_col: str = "ts",
        value_col: str = "value",
        dim_cols: Optional[Mapping[str, str]] = None,
    ) -> None:
        """Bulk ingest: map a source DataFrame into engine events.

        ``dim_cols`` maps dimension id -> source column; values are cast
        to string (all dimension values are strings in the reference,
        postgres/schema.clj:190). The catalog validations of new_fact
        apply once to the mapping, not per row.
        """
        dim_cols = dict(dim_cols or {})
        self._validate_event(fact_id, {k: "x" for k in dim_cols})
        # create_map (not map_from_arrays): Catalyst simplifies
        # GetMapValue(CreateMap(...)) back to the source column, so dim
        # filters/projections reach the parquet scan untouched
        pairs = []
        for dim_id, src in dim_cols.items():
            pairs.append(F.lit(str(dim_id)))
            pairs.append(F.col(src).cast("string"))
        events = df.select(
            F.lit(str(fact_id)).alias("fact"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.col(value_col).cast("double").alias("value"),
            F.create_map(*pairs).alias("dims"),
        )
        self.store.append_df(events)

    # -- read path (api.clj get-timeseries / get-histogram) ----------------

    def _scan(
        self,
        fact: Fact,
        dimension: Dimension,
        grouping: list[str],
        query_data: Mapping[str, object],
        start: Optional[dt.datetime],
        finish: Optional[dt.datetime],
    ) -> DataFrame:
        """events -> filtered, slice-bucketed, series-projected rows.

        Mirrors the reference scan (postgres/query.clj:30-47) plus the
        write-path key constraint (event-key, update.clj:11-26): a rollup
        row exists only for events carrying *all* key dims, so we require
        every grouping dim present. Both range endpoints are inclusive
        after bucketing (query.clj:16-17).
        """
        slice_minutes = dimension.slice or fact.slice
        ev = self.store.events_df().where(F.col("fact") == fact.id)
        # partition pruning on day range when the store carries p_date
        if start is not None and finish is not None and "p_date" in ev.columns:
            lo = slice_datetime(start, slice_minutes).date()
            hi = slice_datetime(finish, slice_minutes).date()
            ev = ev.where(
                (F.col("p_date") >= F.lit(lo)) & (F.col("p_date") <= F.lit(hi))
            )
        for g in grouping:
            ev = ev.where(F.col("dims").getItem(g).isNotNull())
        # non-nil equality filters restricted to the grouping
        # (select-keys + (filter second), postgres/query.clj:39-40)
        for k, v in (query_data or {}).items():
            if v is not None and str(k) in grouping:
                ev = ev.where(F.col("dims").getItem(str(k)) == str(v))
        bucket = slice_expr(F.col("ts"), slice_minutes)
        if start is not None and finish is not None:
            lo = slice_datetime(start, slice_minutes)
            hi = slice_datetime(finish, slice_minutes)
            # exact predicate on the bucket expression, plus an implied
            # raw-ts range that Parquet row-group stats can prune on
            # (bucket(ts) >= lo implies ts >= lo; bucket(ts) <= hi
            # implies ts < hi + slice)
            ev = ev.where(
                (F.col("ts") >= F.lit(lo))
                & (F.col("ts") < F.lit(hi + dt.timedelta(minutes=slice_minutes)))
                & (bucket >= F.lit(lo))
                & (bucket <= F.lit(hi))
            )
        return ev.select(
            *[F.col("dims").getItem(g).alias(g) for g in grouping],
            bucket.alias("ts"),
            F.col("value"),
        )

    def rollup_df(
        self,
        fact_id: str,
        dimension_id: str,
        query_data: Optional[Mapping[str, object]] = None,
        grouping: Optional[list[str]] = None,
    ) -> DataFrame:
        """Materializable rollup at slice grain (reference W4/W5/W6 tables).

        The DataFrame equivalent of one ``(fact x grouping path)`` rollup
        table (naming postgres/common.clj:25-32, upsert maintenance
        update.clj:41-93): columns = grouping dims + ``ts`` (slice
        bucket) + measures. In the reference these are mutated per event;
        here they are derived — write this out (or feed it from
        Structured Streaming) to get the same materialization.
        """
        fact = self.catalog.fact(fact_id)
        dimension = self.catalog.dimension(dimension_id)
        if grouping is None:
            grouping = best_grouping(dimension, query_data)
        rows = self._scan(fact, dimension, grouping, query_data or {}, None, None)
        # step "hour" over slice buckets would re-truncate; group at the
        # raw slice bucket instead: series + ts(slice) keys
        keys = [F.col(c) for c in grouping] + [F.col("ts")]
        if fact.type == "counter":
            return rows.groupBy(*keys).agg(F.sum("value").alias("counter"))
        if fact.type == "average":
            return rows.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("counter"), F.sum("value").alias("total")
            )
        from .operators.collapse import histogram_bucket_expr

        return rows.groupBy(
            *keys, histogram_bucket_expr("value", fact).alias("bucket_lo")
        ).agg(F.count(F.lit(1)).alias("counter"))

    def get_timeseries(
        self,
        fact_id: str,
        dimension_id: str,
        query_data: Optional[Mapping[str, object]],
        start: dt.datetime,
        finish: dt.datetime,
        step: Optional[str] = None,
        offset: int = 0,
    ) -> DataFrame:
        """The read query (reference get-timeseries, postgres.clj:103-124).

        Returns a DataFrame with one row per (series, step bucket):
        grouping dim columns + ``ts`` (absent for step none) + measures
        (``counter`` / ``counter, total`` / ``bucket_lo, counter``).

        ``step=None``/"none" collapses the whole range into one row per
        series (the reference's :all bucket). Gap filling applies to
        counter and average facts; histogram series are returned sparse
        (filling the bucket cross-product is presentation, not storage).
        """
        step = step or "none"
        if step not in STEPS:
            raise InvalidStepError(step)
        fact = self.catalog.fact(fact_id)
        dimension = self.catalog.dimension(dimension_id)
        if dimension.group_only:
            # the reference never creates tables for group_only
            # dimensions (schema.clj:233), so they are not valid query
            # targets — only path components of other dimensions
            raise GroupOnlyDimensionError(dimension.id)
        grouping = best_grouping(dimension, query_data)
        collapsed = self._collapsed_from_rollup(
            fact, dimension, grouping, query_data, start, finish, step, offset
        )
        if collapsed is None:
            rows = self._scan(
                fact, dimension, grouping, query_data or {}, start, finish
            )
            collapsed = collapse(rows, grouping, fact, step, offset)
        if fact.type == "histogram":
            return collapsed
        return fill_range(
            collapsed,
            self.spark,
            grouping,
            measure_columns(fact.type),
            start,
            finish,
            step,
            offset,
            filler=fact.filler,
        )

    def _collapsed_from_rollup(
        self,
        fact: Fact,
        dimension,
        grouping: list[str],
        query_data: Optional[Mapping[str, object]],
        start: dt.datetime,
        finish: dt.datetime,
        step: str,
        offset: int,
    ) -> Optional[DataFrame]:
        """Serve the collapse from a materialized rollup when one covers
        this (fact, grouping) — the reference's whole read path
        (best-grouping -> rollup scan -> collapse, postgres/query.clj).

        Returns None (fall back to raw events) when no rollup store is
        attached or this rollup was never materialized.
        """
        rollup = self._rollup_rows(
            fact, dimension, grouping, query_data, start, finish
        )
        if rollup is None:
            return None
        from .operators.collapse import collapse_rollup

        return collapse_rollup(rollup, grouping, fact, step, offset)

    def _rollup_rows(
        self,
        fact: Fact,
        dimension,
        grouping: list[str],
        query_data: Optional[Mapping[str, object]],
        start: dt.datetime,
        finish: dt.datetime,
    ) -> Optional[DataFrame]:
        """Range+filter-pruned slice-grain rows of a materialized rollup,
        or None when no rollup store is attached / never materialized."""
        if self.rollup_store is None:
            return None
        rollup = self.rollup_store.read(grouping, fact.id)
        if rollup is None:
            return None
        slice_minutes = dimension.slice or fact.slice
        lo = slice_datetime(start, slice_minutes)
        hi = slice_datetime(finish, slice_minutes)
        # both endpoints inclusive after bucketing (query.clj:16-17);
        # p_date prunes rollup partitions before the ts comparison
        rollup = rollup.where(
            (F.col("p_date") >= F.lit(lo.date()))
            & (F.col("p_date") <= F.lit(hi.date()))
            & (F.col("ts") >= F.lit(lo))
            & (F.col("ts") <= F.lit(hi))
        )
        for k, v in (query_data or {}).items():
            if v is not None and str(k) in grouping:
                rollup = rollup.where(F.col(str(k)) == str(v))
        return rollup

    def get_timeseries_map(self, *args, **kwargs) -> dict:
        """Reference-shaped result: {series-key-tuple -> {datetime|'all' -> value}}.

        Series key is a tuple of sorted (dim, value) pairs; values are
        scalars for counters and {'counter': n, 'total': t} dicts for
        averages — the reference's nested-map contract
        (postgres.clj:103-124 return shape).
        """
        fact = self.catalog.fact(args[0])
        step = kwargs.get("step", args[5] if len(args) > 5 else None) or "none"
        df = self.get_timeseries(*args, **kwargs)
        dim_cols = [
            c for c in df.columns if c not in ("ts", "counter", "total", "bucket_lo")
        ]
        out: dict = {}
        for row in df.collect():
            d = row.asDict()
            key = tuple(sorted((c, d[c]) for c in dim_cols))
            tkey = d["ts"] if step != "none" else "all"
            if fact.type == "average":
                val = {"counter": d["counter"], "total": d["total"]}
            elif fact.type == "histogram":
                val = (d["bucket_lo"], d["counter"])
            else:
                val = d["counter"]
            if fact.type == "histogram":
                out.setdefault(key, {}).setdefault(tkey, {})[val[0]] = val[1]
            else:
                out.setdefault(key, {})[tkey] = val
        return out

    def get_histogram(
        self,
        fact_id: str,
        dimension_id: str,
        query_data: Optional[Mapping[str, object]],
        start: dt.datetime,
        finish: dt.datetime,
        merge=None,
    ) -> DataFrame:
        """Merged histogram over the whole range (reference api.clj:38-41).

        Declared but unimplemented in every reference backend
        (postgres.clj:126-128 et al.); implemented here for real per the
        protocol docstring: one histogram per series, per-slice bucket
        counts merged across the time range with ``merge`` (default
        ``+``). Output: series dims + ``bucket_lo`` + ``counter``.

        ``merge`` is the protocol's ``merge-with`` parameter
        (api.clj:39-41): a ``(acc: Column, x: Column) -> Column``
        combiner folded over each bucket's per-*slice* counts in slice
        order (the storage grain — exactly the rows the reference's
        merge-with would see) — expressed as a Catalyst ``aggregate``
        over a collected array, so custom merges (max, saturating
        add, ...) stay JVM-side with no UDF. Served from a covering
        materialized rollup when one exists (rollups are stored at
        slice grain, so the fold sees identical rows either way).
        """
        if merge is None:
            df = self.get_timeseries(
                fact_id, dimension_id, query_data, start, finish, step="none"
            )
            return df
        fact = self.catalog.fact(fact_id)
        dimension = self.catalog.dimension(dimension_id)
        if dimension.group_only:
            raise GroupOnlyDimensionError(dimension.id)
        grouping = best_grouping(dimension, query_data)
        per_slice = self._rollup_rows(
            fact, dimension, grouping, query_data, start, finish
        )
        if per_slice is not None:
            per_slice = per_slice.select(
                *grouping, "ts", "bucket_lo", "counter"
            )
        else:
            from .operators.collapse import histogram_bucket_expr

            rows = self._scan(
                fact, dimension, grouping, query_data or {}, start, finish
            )
            per_slice = rows.groupBy(
                *[F.col(g) for g in grouping],
                F.col("ts"),
                histogram_bucket_expr("value", fact).alias("bucket_lo"),
            ).agg(F.count(F.lit(1)).alias("counter"))
        pairs = F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("counter")))
        )
        folded = F.aggregate(
            pairs,
            F.lit(0).cast("long"),
            lambda acc, p: merge(acc, p.getField("counter")),
        )
        return (
            per_slice.groupBy(*grouping, F.col("bucket_lo"))
            .agg(folded.alias("counter"))
        )
