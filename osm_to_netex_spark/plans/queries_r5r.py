"""Round-5 batch R (SURVEY §2.3 `(r5)` rows): quantile normalization
(cross-batch distribution harmonization) and HITS hub/authority scores.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects (quantile_norm), iterative integer rounds with localCheckpoint
+ AS MATERIALIZED oracle (hits), exact integer ranks/scores,
identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK


# ---------------------------------------------------------------------------
# Quantile normalization (map each batch onto the global distribution)
# ---------------------------------------------------------------------------
def _qnorm_sql(d: str) -> str:
    """Quantile-normalize event values across batches (event_type stands
    in for the batch): each observation's within-batch rank maps to the
    global value at the same quantile — the batch-effect remover
    bioinformatics and feature-store pipelines standardize with.  Exact
    integers end to end: ranks are row_numbers with (value, event_id)
    tie order, the target index is the integer ⌈r·N / n_b⌉ (cross-
    multiplied ceil-div: (r·N + n_b − 1) div n_b), and values are 1e-6
    quantized.

    Scale: the per-batch rank is a batch-partitioned window; the GLOBAL
    rank is computed in the distributed two-level form — rank within a
    value bucket (bucket-partitioned window) plus the cumulative count
    of earlier buckets (a window over the tiny bucket table) — so no
    single-partition global sort exists anywhere (WindowExec's
    "no partition defined" anti-pattern, deliberately avoided); one
    equi-join on the computed index closes it."""
    div = "div" if d == SPARK else "//"
    xq = "cast(floor(value * 1.0e6 + 0.5e0) as bigint)"
    bucket = f"(({xq}) {div} 10000000)"
    return f"""
        with ranked as (
            select event_id, event_type, {xq} as v_q6,
                   cast(row_number() over (
                       partition by event_type
                       order by {xq} asc, event_id asc) as bigint) as r,
                   cast(count(*) over (partition by event_type) as bigint)
                       as n_b
            from events
        ),
        bcnt as (
            select {bucket} as b, cast(count(*) as bigint) as c
            from events group by {bucket}
        ),
        boff as (
            select b, cast(coalesce(sum(c) over (
                       order by b asc rows between unbounded preceding
                       and 1 preceding), 0) as bigint) as off
            from bcnt
        ),
        gq as (
            select {xq} as g_q6, {bucket} as b,
                   cast(row_number() over (
                       partition by {bucket}
                       order by {xq} asc, event_id asc) as bigint) as br
            from events
        ),
        gr as (
            select g.g_q6, o.off + g.br as grk
            from gq g join boff o on o.b = g.b
        ),
        n as (select cast(count(*) as bigint) as big_n from events)
        select rk.event_id, rk.event_type, rk.v_q6,
               g.g_q6 as norm_q6
        from ranked rk
        cross join n
        join gr g on g.grk = ((rk.r * n.big_n + rk.n_b - 1) {div} rk.n_b)"""


def q_qnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_qnorm_sql(SPARK))


def q_qnorm_oracle() -> str:
    return _qnorm_sql(DUCK)


# ---------------------------------------------------------------------------
# HITS hub/authority scores (Kleinberg 1999, integer fixed-point rounds)
# ---------------------------------------------------------------------------
_HITS_ROUNDS = 3
_HITS_SCALE = 1000000


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hub_q6, auth_q6): Kleinberg HITS on the directed link
    graph — hubs point at good authorities, authorities are pointed at
    by good hubs — run 3 synchronous rounds with integer max-
    normalization (score·10⁶ div max — exact, so the fixed point is
    bit-reproducible, the pagerank integer discipline).

    Scale: each half-round is one join + map-side-combined sum on the
    edge relation + a 1-row max broadcast; rounds iterate with
    localCheckpoint (never one SQL text — the 2^K re-inline lesson)."""
    from ..operators.graph import edges_sql

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    n_expr = "(select count(*) from documents)"
    spark.sql(
        f"select distinct src, dst from ({edges_sql(SPARK, 'documents', n_expr)}) "
        f"where src <> dst"
    ).localCheckpoint(eager=False).createOrReplaceTempView("__hits_e")
    spark.sql(
        f"select doc_id as node, cast({_HITS_SCALE} as bigint) as s "
        f"from documents"
    ).localCheckpoint(eager=False).createOrReplaceTempView("__hits_h0")
    hubs = "__hits_h0"
    for t in range(_HITS_ROUNDS):
        raw_a = spark.sql(
            f"select e.dst as node, cast(sum(h.s) as bigint) as raw "
            f"from __hits_e e join {hubs} h on h.node = e.src group by e.dst"
        ).localCheckpoint(eager=False)
        raw_a.createOrReplaceTempView(f"__hits_ra{t}")
        spark.sql(
            f"select node, cast(raw * {_HITS_SCALE} div "
            f"(select max(raw) from __hits_ra{t}) as bigint) as s "
            f"from __hits_ra{t}"
        ).localCheckpoint(eager=False).createOrReplaceTempView(
            f"__hits_a{t}"
        )
        raw_h = spark.sql(
            f"select e.src as node, cast(sum(a.s) as bigint) as raw "
            f"from __hits_e e join __hits_a{t} a on a.node = e.dst "
            f"group by e.src"
        ).localCheckpoint(eager=False)
        raw_h.createOrReplaceTempView(f"__hits_rh{t}")
        spark.sql(
            f"select node, cast(raw * {_HITS_SCALE} div "
            f"(select max(raw) from __hits_rh{t}) as bigint) as s "
            f"from __hits_rh{t}"
        ).localCheckpoint(eager=False).createOrReplaceTempView(
            f"__hits_h{t + 1}"
        )
        hubs = f"__hits_h{t + 1}"
    return spark.sql(f"""
        select d.doc_id,
               cast(coalesce(h.s, 0) as bigint) as hub_q6,
               cast(coalesce(a.s, 0) as bigint) as auth_q6
        from documents d
        left join {hubs} h on h.node = d.doc_id
        left join __hits_a{_HITS_ROUNDS - 1} a on a.node = d.doc_id
        where coalesce(h.s, 0) > 0 or coalesce(a.s, 0) > 0""")


def q_hits_oracle() -> str:
    from ..operators.graph import edges_sql

    n_expr = "(select count(*) from documents)"
    ctes = [
        f"e0 as materialized (select distinct src, dst from "
        f"({edges_sql(DUCK, 'documents', n_expr)}) where src <> dst)",
        f"h0 as materialized (select doc_id as node, "
        f"cast({_HITS_SCALE} as bigint) as s from documents)",
    ]
    hubs = "h0"
    for t in range(_HITS_ROUNDS):
        ctes.append(
            f"ra{t} as materialized (select e.dst as node, "
            f"cast(sum(h.s) as bigint) as raw from e0 e "
            f"join {hubs} h on h.node = e.src group by e.dst)"
        )
        ctes.append(
            f"a{t} as materialized (select node, cast(raw * {_HITS_SCALE} "
            f"// (select max(raw) from ra{t}) as bigint) as s from ra{t})"
        )
        ctes.append(
            f"rh{t} as materialized (select e.src as node, "
            f"cast(sum(a.s) as bigint) as raw from e0 e "
            f"join a{t} a on a.node = e.dst group by e.src)"
        )
        ctes.append(
            f"h{t + 1} as materialized (select node, cast(raw * {_HITS_SCALE}"
            f" // (select max(raw) from rh{t}) as bigint) as s from rh{t})"
        )
        hubs = f"h{t + 1}"
    return (
        "with " + ", ".join(ctes)
        + f""" select d.doc_id,
               cast(coalesce(h.s, 0) as bigint) as hub_q6,
               cast(coalesce(a.s, 0) as bigint) as auth_q6
        from documents d
        left join {hubs} h on h.node = d.doc_id
        left join a{_HITS_ROUNDS - 1} a on a.node = d.doc_id
        where coalesce(h.s, 0) > 0 or coalesce(a.s, 0) > 0"""
    )


def register_r5r(QUERIES: dict) -> None:
    QUERIES["quantile_norm"] = (q_qnorm, q_qnorm_oracle)
    QUERIES["hits_scores"] = (q_hits, q_hits_oracle)
