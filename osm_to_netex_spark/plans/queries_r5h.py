"""Round-5 batch H (SURVEY §2.3 `(r5)` rows): t-closeness (completing
the k-anonymity → l-diversity → t-closeness privacy triad) and areal
interpolation (zone→cell statistic transfer).

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects where syntax allows, exact integer folds (the t-closeness
distance is a cross-multiplied integer — no float distribution math),
scalar outputs, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK


def _views(spark: SparkSession, sf_dir: str) -> None:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)


# ---------------------------------------------------------------------------
# t-closeness audit (Li, Li & Venkatasubramanian 2007)
# ---------------------------------------------------------------------------
_TC_T_NUM, _TC_T_DEN = 3, 10  # t = 0.3


def _t_closeness_sql(d: str) -> str:
    """t-closeness audit of the same anonymization ladder `kanon` /
    `l_diversity` grade — QI = nation × 1000-unit balance band (the kanon
    ladder's COARSE level: classes big enough at every SF that both audit
    outcomes occur, pytest-pinned), sensitive = market segment.  Per
    equivalence class, the total-variation distance
    between the class's sensitive-value distribution and the global one
    (the categorical form of the paper's EMD), and whether it is within
    t = 0.3 — the skew-attack surface l-diversity misses (a class can be
    l-diverse yet heavily skewed toward one sensitive value).

    Exactness: TVD = ½·Σ|p_i − q_i| is carried as the exact integer
    numerator Σ|cnt_i·N − g_i·n_c| over denominator 2·n_c·N; the t test
    cross-multiplies (num·10 ≤ 3·2·n_c·N), so no float distribution math
    exists.  The distribution grid is built classes × ALL global
    segments with zero-coalesce — absent segments contribute their full
    |0 − q_i| mass (the jsd_drift p=0 lesson, ADVICE r4).

    Scale: one QI-keyed aggregate (dimension-sized classes), one tiny
    segment-list broadcast grid, one class-keyed fold."""
    return f"""
        with seg as (
            select c_mktsegment as s, cast(count(*) as bigint) as g
            from customer group by c_mktsegment
        ),
        tot as (select cast(sum(g) as bigint) as big_n from seg),
        cls as (
            select c_nationkey as qi_nat,
                   cast(floor(c_acctbal / 1000.0e0) as bigint) as qi_band,
                   c_mktsegment as s, cast(count(*) as bigint) as cnt
            from customer
            group by c_nationkey, floor(c_acctbal / 1000.0e0), c_mktsegment
        ),
        csize as (
            select qi_nat, qi_band, cast(sum(cnt) as bigint) as n_c
            from cls group by qi_nat, qi_band
        ),
        grid as (
            select cs.qi_nat, cs.qi_band, cs.n_c, seg.s, seg.g,
                   coalesce(c.cnt, 0) as cnt
            from csize cs
            cross join seg
            left join cls c on c.qi_nat = cs.qi_nat
                 and c.qi_band = cs.qi_band and c.s = seg.s
        )
        select g.qi_nat, g.qi_band,
               cast(max(g.n_c) as bigint) as n_c,
               cast(sum(abs(g.cnt * t.big_n - g.g * g.n_c)) as bigint)
                   as tvd_num,
               round(cast(sum(abs(g.cnt * t.big_n - g.g * g.n_c)) as double)
                     / (2.0e0 * cast(max(g.n_c) as double)
                        * cast(t.big_n as double)), 9) as tvd,
               cast(case when sum(abs(g.cnt * t.big_n - g.g * g.n_c))
                              * {_TC_T_DEN}
                         <= {_TC_T_NUM} * 2 * max(g.n_c) * t.big_n
                    then 1 else 0 end as bigint) as is_t_close
        from grid g cross join tot t
        group by g.qi_nat, g.qi_band, t.big_n"""


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(_t_closeness_sql(SPARK))


def q_t_closeness_oracle() -> str:
    return _t_closeness_sql(DUCK)


# ---------------------------------------------------------------------------
# Areal interpolation (zone statistic → cell surface)
# ---------------------------------------------------------------------------
_AI_RES = 12


def _areal_interp_sql(d: str) -> str:
    """Areal-weighted transfer of a zone statistic onto the cell lattice
    (the dasymetric step under every choropleth-regrid): each zone's
    value (supplier account balance, integer 1e-2) spreads equally over
    its cover cells (value div n_cells — exact integer, remainder
    documented as truncated), and each cell sums its zones' shares.
    Output per cell: contributing-zone count and the interpolated total.

    Scale: the zonal_majority cover shape — cover explode keyed by zone,
    one zone-sized count, one cell-keyed map-side-combined sum; the
    lattice join never touches the corpus."""
    from ..functions import geo

    div = "div" if d == SPARK else "//"
    cover = (
        f"select zone_id, explode({geo.quad_cover_bbox('pos_list', _AI_RES, d)})"
        f" as cell from geo_polys"
        if d == SPARK
        else f"select zone_id, unnest({geo.quad_cover_bbox('pos_list', _AI_RES, d)})"
        f" as cell from geo_polys"
    )
    val = (
        "select s_suppkey as zone_id, "
        "cast(floor(s_acctbal * 1.0e2 + 0.5e0) as bigint) as val_q2 "
        "from supplier"
    )
    return f"""cover as ({cover}),
        ncell as (
            select zone_id, cast(count(*) as bigint) as n_cells
            from cover group by zone_id
        ),
        zval as ({val}),
        spread as (
            select c.cell, c.zone_id,
                   cast(z.val_q2 {div} n.n_cells as bigint) as share_q2
            from cover c
            join ncell n on n.zone_id = c.zone_id
            join zval z on z.zone_id = c.zone_id
        )
        select cell,
               cast(count(*) as bigint) as n_zones,
               cast(sum(share_q2) as bigint) as total_q2
        from spread
        group by cell"""


def q_areal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(f"with {_areal_interp_sql(SPARK)}")


def q_areal_interp_oracle() -> str:
    from . import queries as q

    # geo_polys is a temp view Spark-side; the oracle inlines it as a CTE
    return f"{q.duck_geometry_ctes()}, {_areal_interp_sql(DUCK)}"


def register_r5h(QUERIES: dict) -> None:
    QUERIES["t_closeness"] = (q_t_closeness, q_t_closeness_oracle)
    QUERIES["areal_interp"] = (q_areal_interp, q_areal_interp_oracle)
