"""Round-5 batch L (SURVEY §2.3 `(r5)` rows): terrain indices (TRI/TPI)
and the Brier score decomposition — one more terrain-analytics staple
and the probabilistic-forecast eval that pairs with
`logreg_calibration` / `isotonic_calibration` / `auc_roc`.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, exact integer folds, one fixed float sequence for final
statistics, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

_CONV_THRESH = 50.0


# ---------------------------------------------------------------------------
# Terrain ruggedness + topographic position (Riley 1999 / Weiss 2001)
# ---------------------------------------------------------------------------
def _terrain_sql(d: str) -> str:
    """Per interior raster cell: TRI (root-sum-square of the 8 neighbor
    elevation differences, Riley et al. 1999) and TPI (cell minus
    neighbor mean, Weiss 2001) with the standard slope-position class
    (ridge / upper / flat / lower / valley at ±100 m and ±500 m TPI cuts — scaled to this synthetic raster's noise amplitude; real DEMs use ±1/±5 m).
    Elevations are exact 1e-3 integers; the neighbor sum/sum-of-squares
    fold as exact bigints; TRI's sqrt and TPI's mean are one float step
    each; the class cut is made on the exact integer TPI numerator
    (v·8 − Σnb vs ±cut·8) so classification never touches a float.

    Scale: the 8-offset lattice equi-join (D8 shape) + one cell-keyed
    map-side-combined aggregate — raster-sized, corpus-free."""
    from .queries_r5c import _d8_offsets
    from .queries_r5d import _raster

    nb = " union all ".join(
        f"select ix + {dx} as nx, iy + {dy} as ny, ix, iy from ras"
        for _, dx, dy, _ in _d8_offsets()
    )
    # TPI numerator in 1e-3 units scaled by 8: v_q3*8 - sum(nb); class
    # cuts at ±100 m and ±500 m → ±800000 and ±4000000 in scaled units
    return f"""
        with ras0 as ({_raster(d)}),
        ras as (
            select ix, iy,
                   cast(floor(value * 1.0e3 + 0.5e0) as bigint) as v_q3
            from ras0
        ),
        nbr as ({nb}),
        agg as (
            select n.ix, n.iy,
                   cast(count(*) as bigint) as n_nb,
                   cast(sum(z.v_q3) as bigint) as s_nb,
                   cast(sum((c.v_q3 - z.v_q3) * (c.v_q3 - z.v_q3)) as bigint)
                       as ssq
            from nbr n
            join ras z on z.ix = n.nx and z.iy = n.ny
            join ras c on c.ix = n.ix and c.iy = n.iy
            group by n.ix, n.iy
            having count(*) = 8
        )
        select cast(a.ix as bigint) as ix, cast(a.iy as bigint) as iy,
               round(sqrt(cast(a.ssq as double)) / 1.0e3, 9) as tri_m,
               round((cast(c.v_q3 * 8 - a.s_nb as double) / 8.0e0) / 1.0e3,
                     9) as tpi_m,
               case when c.v_q3 * 8 - a.s_nb > 4000000 then 'ridge'
                    when c.v_q3 * 8 - a.s_nb > 800000 then 'upper'
                    when c.v_q3 * 8 - a.s_nb >= -800000 then 'flat'
                    when c.v_q3 * 8 - a.s_nb >= -4000000 then 'lower'
                    else 'valley' end as slope_position
        from agg a
        join ras c on c.ix = a.ix and c.iy = a.iy"""


def q_terrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_terrain_sql(SPARK))


def q_terrain_oracle() -> str:
    return _terrain_sql(DUCK)


# ---------------------------------------------------------------------------
# Brier score decomposition (Murphy 1973)
# ---------------------------------------------------------------------------
_BR_BINS = 10


def _brier_sql(d: str) -> str:
    """Murphy's decomposition of the Brier score — reliability −
    resolution + uncertainty — for the in-sample predictor "user's own
    conversion rate" against per-event outcomes (value > 50), over 10
    probability bins: the forecast-quality triptych that says WHY a
    probabilistic score is what it is (miscalibration vs missing
    discrimination vs irreducible base-rate noise).

    Exactness: predictions are the integer 1e-3 user rates ((x·10³) div
    n); every bin moment (counts, Σp, Σy) is an exact bigint; the bin
    means enter the quadratics as integer 1e-6 quantities (truncated
    integer division — deterministic, documented), so both numerators
    Σ n_k·(p̄_k − ȳ_k)² and Σ n_k·(ȳ_k − ȳ)² fold as exact bigints whose
    magnitude stays ≤ 10¹²·N (bigint-safe through SF 1) — no double ever
    folds across bins; the final components are one float division each,
    rounded 1e-9.

    Scale: one user aggregate (broadcast back to events), one bin
    aggregate, one 10-row fold — the corpus crosses two shuffles."""
    div = "div" if d == SPARK else "//"
    conv = f"case when value > {_CONV_THRESH!r}e0 then 1 else 0 end"
    return f"""
        with per_user as (
            select user_id,
                   cast((sum({conv}) * 1000) {div} count(*) as bigint)
                       as p_q3
            from events group by user_id
        ),
        obs as (
            select least(cast(u.p_q3 {div} 100 as bigint),
                         {_BR_BINS - 1}) as bin,
                   u.p_q3, cast({conv} as bigint) as y
            from events e join per_user u on u.user_id = e.user_id
        ),
        bins as (
            select bin,
                   cast(count(*) as bigint) as n_k,
                   cast(sum(p_q3) as bigint) as sp,
                   cast(sum(y) as bigint) as sy
            from obs group by bin
        ),
        tot as (
            select cast(sum(n_k) as bigint) as n,
                   cast(sum(sy) as bigint) as y_all
            from bins
        ),
        means as (
            select b.n_k,
                   cast((b.sp * 1000) {div} b.n_k as bigint) as pb_q6,
                   cast((b.sy * 1000000) {div} b.n_k as bigint) as yb_q6,
                   cast((t.y_all * 1000000) {div} t.n as bigint) as y_q6,
                   t.n, t.y_all
            from bins b cross join tot t
        ),
        nums as (
            select cast(max(n) as bigint) as n,
                   cast(max(y_all) as bigint) as y_all,
                   cast(sum(n_k * (pb_q6 - yb_q6) * (pb_q6 - yb_q6))
                        as bigint) as rel_num,
                   cast(sum(n_k * (yb_q6 - y_q6) * (yb_q6 - y_q6))
                        as bigint) as res_num
            from means
        )
        select n,
               round(cast(rel_num as double)
                     / (1.0e12 * cast(n as double)), 9) as reliability,
               round(cast(res_num as double)
                     / (1.0e12 * cast(n as double)), 9) as resolution,
               round(cast(y_all as double) * cast(n - y_all as double)
                     / (cast(n as double) * cast(n as double)), 9)
                   as uncertainty,
               round(cast(rel_num as double) / (1.0e12 * cast(n as double))
                     - cast(res_num as double)
                       / (1.0e12 * cast(n as double))
                     + cast(y_all as double) * cast(n - y_all as double)
                       / (cast(n as double) * cast(n as double)), 9)
                   as brier_recomposed
        from nums"""


def q_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_brier_sql(SPARK))


def q_brier_oracle() -> str:
    return _brier_sql(DUCK)


def register_r5l(QUERIES: dict) -> None:
    QUERIES["terrain_indices"] = (q_terrain, q_terrain_oracle)
    QUERIES["brier_decomp"] = (q_brier, q_brier_oracle)
