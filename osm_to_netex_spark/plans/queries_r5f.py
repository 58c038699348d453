"""Round-5 batch F (SURVEY §2.3 `(r5)` rows): Iceberg-style compaction
planning, HBOS outlier scoring, and trigram path mining.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects (date parts derived from epoch integers so no
dayofweek-convention branch exists), exact integer folds, scalar
outputs, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

# integer MICROSECONDS since epoch: DuckDB's epoch() returns fractional
# seconds whose bigint cast ROUNDS (Spark's timestampdiff truncates) — a
# one-second skew at bin boundaries; epoch_us is integral in both engines
_EP_US = {
    SPARK: "(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts))",
    DUCK: "cast(epoch_us(ts) as bigint)",
}


# ---------------------------------------------------------------------------
# Compaction planning (target-size bin assignment per partition)
# ---------------------------------------------------------------------------
_CP_TARGET = 4096  # bytes per output file at test scale


def _compaction_sql(d: str) -> str:
    """Compaction plan per source partition: documents stand in for data
    files (bytes = text length), and each partition's files are packed
    into target-size output bins by cumulative byte offset — bin =
    (cum_bytes − bytes) div target, the standard rewrite-planner split
    (Iceberg's bin-packing order is deterministic file order; ours is
    doc_id).  Output: per (source, bin) the file count, byte total, and
    the id range — everything a rewrite action needs.

    Scale: ONE partition-keyed ordered window (cumulative sum) + one
    (partition, bin) map-side-combined aggregate; the planner never
    touches file contents, only the manifest-sized metadata relation."""
    div = "div" if d == SPARK else "//"
    return f"""
        with files as (
            select source, doc_id,
                   cast(length(text) as bigint) as bytes,
                   cast(sum(length(text)) over (
                       partition by source order by doc_id
                       rows unbounded preceding) as bigint) as cum_bytes
            from documents
        )
        select source,
               cast((cum_bytes - bytes) {div} {_CP_TARGET} as bigint) as bin_id,
               cast(count(*) as bigint) as n_files,
               cast(sum(bytes) as bigint) as total_bytes,
               cast(min(doc_id) as bigint) as first_file,
               cast(max(doc_id) as bigint) as last_file
        from files
        group by source, (cum_bytes - bytes) {div} {_CP_TARGET}"""


def q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_compaction_sql(SPARK))


def q_compaction_oracle() -> str:
    return _compaction_sql(DUCK)


# ---------------------------------------------------------------------------
# HBOS outlier scoring (histogram-based, log-free inverse-density form)
# ---------------------------------------------------------------------------
_HBOS_TOPK = 20


def _hbos_sql(d: str) -> str:
    """Histogram-based outlier score per event over three features —
    value band (10 bins of 50), hour-of-day (24), day-of-week (7) — in
    the log-free inverse-density form: score = Σ_f ⌊10⁶·N/(cnt_bin·B_f)⌋
    (exact integer; rank-equivalent per feature to HBOS's −log density,
    and free of cross-engine ln()).  Hour/dow derive from integer epoch
    seconds, so no engine calendar convention is involved.  Top-20 by
    (score desc, event_id) — rare value bands in rare time slots float
    up.

    Scale: three tiny histogram aggregates (broadcast back), one scan to
    score, one top-k — the corpus crosses a shuffle only for the final
    TakeOrdered."""
    ep = _EP_US[d]
    div = "div" if d == SPARK else "//"
    vbin = f"least(cast(floor(value / 50.0e0) as bigint), 9)"
    hbin = f"(({ep} {div} 3600000000) % 24)"
    dbin = f"((({ep} {div} 86400000000) + 4) % 7)"
    return f"""
        with feat as (
            select event_id, {vbin} as vb, {hbin} as hb, {dbin} as db
            from events
        ),
        n as (select cast(count(*) as bigint) as n from feat),
        hv as (select vb, cast(count(*) as bigint) as c from feat group by vb),
        hh as (select hb, cast(count(*) as bigint) as c from feat group by hb),
        hd as (select db, cast(count(*) as bigint) as c from feat group by db)
        select f.event_id,
               cast((select n from n) * 1000000 {'div' if d == SPARK else '//'}
                    (hv.c * 10)
                  + (select n from n) * 1000000 {'div' if d == SPARK else '//'}
                    (hh.c * 24)
                  + (select n from n) * 1000000 {'div' if d == SPARK else '//'}
                    (hd.c * 7) as bigint) as score_q6
        from feat f
        join hv on hv.vb = f.vb
        join hh on hh.hb = f.hb
        join hd on hd.db = f.db
        order by score_q6 desc, f.event_id asc
        limit {_HBOS_TOPK}"""


def q_hbos(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_hbos_sql(SPARK))


def q_hbos_oracle() -> str:
    return _hbos_sql(DUCK)


# ---------------------------------------------------------------------------
# Trigram path mining (second-order user journeys)
# ---------------------------------------------------------------------------
_PT_TOPK = 20


def _path_trigrams_sql(d: str) -> str:
    """Top-20 event-type TRIGRAMS over user timelines — the second-order
    journey statistic the first-order `transitions` matrix can't express
    (A→B→C vs A→B→D splits only at order 2).  Deterministic total order
    (ts, event_id); ties in counts broken lexicographically.

    Scale: ONE user-keyed ordered window serves both lags; one
    map-side-combined count over the tiny type³ space; TakeOrdered
    closes it."""
    return f"""
        with seq as (
            select lag(event_type, 2) over w as t1,
                   lag(event_type, 1) over w as t2,
                   event_type as t3
            from events
            window w as (partition by user_id order by ts, event_id)
        )
        select t1, t2, t3, cast(count(*) as bigint) as n
        from seq
        where t1 is not null and t2 is not null
        group by t1, t2, t3
        order by n desc, t1 asc, t2 asc, t3 asc
        limit {_PT_TOPK}"""


def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_path_trigrams_sql(SPARK))


def q_path_trigrams_oracle() -> str:
    return _path_trigrams_sql(DUCK)


def register_r5f(QUERIES: dict) -> None:
    QUERIES["compaction_plan"] = (q_compaction, q_compaction_oracle)
    QUERIES["hbos_outliers"] = (q_hbos, q_hbos_oracle)
    QUERIES["path_trigrams"] = (q_path_trigrams, q_path_trigrams_oracle)
