"""Round-5 batch U (SURVEY §2.3 `(r5)` rows): location quotient and
Whittaker beta diversity — the regional-science concentration pair over
the cell × event-type field.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, exact integer counts with cross-multiplied ratios, identical
aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK


def _views(spark: SparkSession, sf_dir: str) -> None:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)


_LQ_RES = 9


def _cell_type_sql(d: str) -> str:
    """(cell, event_type, n) counts of events per res-9 cell — events
    carry no coordinates, so position derives from the same deterministic
    event_id hash the trajectory family uses (trip_stats convention)."""
    from . import queries as q
    from ..functions import geo
    from ..functions.portable import concat_str, prand

    plat = prand(concat_str(["'tr:lat:'", "cast(event_id as string)"], d), d)
    plon = prand(concat_str(["'tr:lon:'", "cast(event_id as string)"], d), d)
    lat = f"({q.LAT_LO!r}e0 + {plat} * {q.LAT_HI - q.LAT_LO!r}e0)"
    lon = f"({q.LON_LO!r}e0 + {plon} * {q.LON_HI - q.LON_LO!r}e0)"
    ix, iy = geo.quad_ixy(lat, lon, _LQ_RES, d)
    cell = geo.quad_pack(ix, iy, _LQ_RES)
    return (
        f"select {cell} as cell, event_type, "
        f"cast(count(*) as bigint) as n from events "
        f"group by {cell}, event_type"
    )


def _lq_sql(d: str) -> str:
    """Location quotient per (cell, type): the cell's type share over the
    global type share — LQ > 1 marks local specialization, the
    regional-science statistic under every industry-cluster map.  The
    ratio is exact integers cross-multiplied ((n·T_cell⁻¹)/(N_t·T⁻¹) =
    n·T / (T_cell·N_t)); the >1 flag is an integer compare, the reported
    LQ one rounded division.

    Scale: one (cell, type) aggregate + two broadcast marginal tables —
    corpus crosses one shuffle."""
    return f"""
        with ct as ({_cell_type_sql(d)}),
        cm as (select cell, cast(sum(n) as bigint) as t_cell
               from ct group by cell),
        tm as (select event_type, cast(sum(n) as bigint) as n_t
               from ct group by event_type),
        tot as (select cast(sum(n) as bigint) as t from ct)
        select c.cell, c.event_type, c.n,
               round(cast(c.n as double) * cast(x.t as double)
                     / (cast(m.t_cell as double) * cast(g.n_t as double)),
                     9) as lq,
               cast(case when c.n * x.t > m.t_cell * g.n_t
                    then 1 else 0 end as bigint) as specialized
        from ct c
        join cm m on m.cell = c.cell
        join tm g on g.event_type = c.event_type
        cross join tot x"""


def q_lq(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(_lq_sql(SPARK))


def q_lq_oracle() -> str:
    return _lq_sql(DUCK)


def _beta_sql(d: str) -> str:
    """Whittaker beta diversity of event types across cells — γ/ᾱ, the
    landscape-to-local diversity ratio (β near 1 = every cell sees every
    type, β near n_cells = complete turnover).  γ and the α sum are
    exact integer distinct-counts; β and ᾱ are one rounded division
    each.

    Scale: one (cell, type) distinct aggregate + two scalar folds."""
    return f"""
        with ct as ({_cell_type_sql(d)}),
        alpha as (
            select cell, cast(count(*) as bigint) as a
            from (select distinct cell, event_type from ct) s
            group by cell
        ),
        g as (select cast(count(distinct event_type) as bigint) as gamma
              from ct)
        select cast(count(*) as bigint) as n_cells,
               cast(max(g.gamma) as bigint) as gamma,
               cast(sum(a.a) as bigint) as alpha_sum,
               round(cast(sum(a.a) as double) / cast(count(*) as double), 9)
                   as alpha_mean,
               round(cast(max(g.gamma) as double)
                     / (cast(sum(a.a) as double) / cast(count(*) as double)),
                     9) as beta_w
        from alpha a cross join g"""


def q_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(_beta_sql(SPARK))


def q_beta_oracle() -> str:
    return _beta_sql(DUCK)


def register_r5u(QUERIES: dict) -> None:
    QUERIES["location_quotient"] = (q_lq, q_lq_oracle)
    QUERIES["beta_diversity"] = (q_beta, q_beta_oracle)
