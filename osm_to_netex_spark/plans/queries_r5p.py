"""Round-5 batch P (SURVEY §2.3 `(r5)` row): Pareto / ABC concentration
analysis — the 300th oracle-gated registry entry.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, exact integer folds and integer cross-multiplied thresholds,
identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK


def _pareto_sql(d: str) -> str:
    """ABC/Pareto analysis of revenue concentration over parts: rank
    parts by revenue, classify A/B/C at the 80%/95% cumulative-share
    cuts, and report per class the part count and exact revenue share —
    the 80/20 statement every inventory/BI stack opens with.  The class
    cut is integer cross-multiplication (cum·100 ≤ 80·total — no float
    percentage anywhere); ranking ties break by part key.

    Scale: one map-side-combined per-part aggregate, ONE ordered window
    over the part table (dimension-sized, never the fact), a 3-row
    class aggregate."""
    return """
        with val as (
            select l_partkey as pk,
                   cast(sum(cast(floor(l_extendedprice * 1.0e4 + 0.5e0)
                        as bigint)) as bigint) as rev_q4
            from lineitem group by l_partkey
        ),
        tot as (select cast(sum(rev_q4) as bigint) as total from val),
        ranked as (
            select pk, rev_q4,
                   cast(sum(rev_q4) over (order by rev_q4 desc, pk asc
                        rows unbounded preceding) as bigint) as cum_q4
            from val
        ),
        classed as (
            select pk, rev_q4,
                   case when cum_q4 * 100 <= (select total from tot) * 80
                        then 'A'
                        when cum_q4 * 100 <= (select total from tot) * 95
                        then 'B'
                        else 'C' end as abc
            from ranked
        )
        select abc,
               cast(count(*) as bigint) as n_parts,
               cast(sum(rev_q4) as bigint) as class_rev_q4,
               round(cast(sum(rev_q4) as double)
                     / cast((select total from tot) as double), 9)
                   as rev_share
        from classed
        group by abc"""


def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_pareto_sql(SPARK))


def q_pareto_oracle() -> str:
    return _pareto_sql(DUCK)


def register_r5p(QUERIES: dict) -> None:
    QUERIES["pareto_abc"] = (q_pareto, q_pareto_oracle)
