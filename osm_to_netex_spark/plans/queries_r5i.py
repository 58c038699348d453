"""Round-5 batch I (SURVEY §2.3 `(r5)` rows): spatial structure
functions — the empirical semivariogram and Moran correlogram per
distance lag, the kriging/spatial-regression precursors.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, exact integer folds (squared differences and cross products of
integer-quantized elevations), one fixed float sequence for the final
normalized statistics, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

_SS_MAX_LAG = 4


def _ring_offsets(h: int) -> list[tuple[int, int]]:
    """The 8h lattice offsets at Chebyshev distance exactly h."""
    out = []
    for dx in range(-h, h + 1):
        for dy in range(-h, h + 1):
            if max(abs(dx), abs(dy)) == h:
                out.append((dx, dy))
    return out


def _spatial_structure_sql(d: str) -> str:
    """Per Chebyshev lag h = 1..4 over the elevation raster: the
    empirical semivariogram γ(h) = ½·mean (z_i − z_j)² and the Moran
    correlogram I(h) = (Σc_i·c_j / n_pairs) / (Σc_i² / n) — how spatial
    dependence decays with distance, the structure function every kriging
    model is fit to.

    Exactness: elevations are exact 1e-3 integers; centering uses the
    truncated integer mean (S div n — deterministic, documented), so the
    pair sums Σ(Δv)², Σc_i·c_j and the variance Σc_i² are exact bigints;
    γ and I are one final float division each, rounded 1e-9.  Directed
    pairs (both orders) keep every ring symmetric.

    Scale: the offset table (8h rows per lag, 80 total) is a constant
    broadcast; pair enumeration is ONE lattice equi-join keyed on the
    shifted cell — the D8/raster_slope shape generalized to rings, no
    cross product; per-lag aggregation map-side-combines."""
    offs = " union all ".join(
        f"select {h} as h, {dx} as dx, {dy} as dy"
        for h in range(1, _SS_MAX_LAG + 1)
        for dx, dy in _ring_offsets(h)
    )
    div = "div" if d == SPARK else "//"
    from .queries_r5d import _raster

    return f"""
        with ras0 as ({_raster(d)}),
        ras as (
            select ix, iy,
                   cast(floor(value * 1.0e3 + 0.5e0) as bigint) as v_q3
            from ras0
        ),
        mom as (
            select cast(count(*) as bigint) as n,
                   cast(sum(v_q3) as bigint) as s
            from ras
        ),
        ctr as (
            select ix, iy, v_q3,
                   v_q3 - ((select s from mom) {div} (select n from mom))
                       as c
            from ras
        ),
        offs as ({offs}),
        pairs as (
            select o.h,
                   (a.v_q3 - b.v_q3) * (a.v_q3 - b.v_q3) as dsq,
                   a.c * b.c as cc
            from ctr a
            join offs o on 1 = 1
            join ctr b on b.ix = a.ix + o.dx and b.iy = a.iy + o.dy
        ),
        varg as (
            select cast(sum(c * c) as bigint) as scc,
                   cast(count(*) as bigint) as n
            from ctr
        )
        select cast(p.h as bigint) as lag_h,
               cast(count(*) as bigint) as n_pairs,
               cast(sum(p.dsq) as bigint) as sum_dsq,
               cast(sum(p.cc) as bigint) as sum_cc,
               round(cast(sum(p.dsq) as double)
                     / (2.0e0 * cast(count(*) as double)) / 1.0e6, 9)
                   as semivariance,
               round((cast(sum(p.cc) as double) / cast(count(*) as double))
                     / (cast(v.scc as double) / cast(v.n as double)), 9)
                   as moran_i
        from pairs p cross join varg v
        group by p.h, v.scc, v.n"""


def q_spatial_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_spatial_structure_sql(SPARK))


def q_spatial_structure_oracle() -> str:
    return _spatial_structure_sql(DUCK)


def register_r5i(QUERIES: dict) -> None:
    QUERIES["spatial_structure"] = (
        q_spatial_structure,
        q_spatial_structure_oracle,
    )
