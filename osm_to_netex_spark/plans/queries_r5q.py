"""Round-5 batch Q (SURVEY §2.3 `(r5)` rows): variogram anisotropy,
rich-club coefficient, degree assortativity, A/B power analysis.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects, exact integer folds (pair moments over integer degrees /
quantized elevations), Python-literal normal quantiles (no cross-engine
inverse-CDF), identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK


# ---------------------------------------------------------------------------
# Variogram anisotropy (directional semivariance, the kriging input)
# ---------------------------------------------------------------------------
_AN_MAX_LAG = 3


def _anisotropy_sql(d: str) -> str:
    """Directional empirical semivariogram over the elevation raster:
    γ(h) split by axis class (EW / NS / diagonal) per Chebyshev lag 1–3 —
    the anisotropy check a kriging fit runs before assuming an isotropic
    model (directional structure means the variogram needs an
    anisotropy ratio).  Pair sums are exact bigints of 1e-3-quantized
    elevations; γ is one float division, rounded 1e-9.

    Scale: the ring-offset broadcast × one lattice equi-join
    (spatial_structure shape) with the direction class precomputed per
    offset row; per-(lag, class) aggregation map-side-combines."""
    from .queries_r5d import _raster

    offs = []
    for h in range(1, _AN_MAX_LAG + 1):
        for dx in range(-h, h + 1):
            for dy in range(-h, h + 1):
                if max(abs(dx), abs(dy)) != h:
                    continue
                klass = (
                    "ew" if dy == 0 else "ns" if dx == 0 else "diag"
                )
                offs.append(
                    f"select {h} as h, {dx} as dx, {dy} as dy,"
                    f" '{klass}' as dir_class"
                )
    return f"""
        with ras0 as ({_raster(d)}),
        ras as (
            select ix, iy,
                   cast(floor(value * 1.0e3 + 0.5e0) as bigint) as v_q3
            from ras0
        ),
        offs as ({' union all '.join(offs)}),
        pairs as (
            select o.h, o.dir_class,
                   (a.v_q3 - b.v_q3) * (a.v_q3 - b.v_q3) as dsq
            from ras a
            join offs o on 1 = 1
            join ras b on b.ix = a.ix + o.dx and b.iy = a.iy + o.dy
        )
        select cast(h as bigint) as lag_h, dir_class,
               cast(count(*) as bigint) as n_pairs,
               cast(sum(dsq) as bigint) as sum_dsq,
               round(cast(sum(dsq) as double)
                     / (2.0e0 * cast(count(*) as double)) / 1.0e6, 9)
                   as semivariance
        from pairs
        group by h, dir_class"""


def q_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_anisotropy_sql(SPARK))


def q_anisotropy_oracle() -> str:
    return _anisotropy_sql(DUCK)


# ---------------------------------------------------------------------------
# Rich-club coefficient + degree assortativity (network structure)
# ---------------------------------------------------------------------------
def _graph_edges(d: str) -> str:
    """Canonical undirected simple edges of the deterministic link graph
    (the same graph pagerank / k-core / triangles gate)."""
    from ..operators.graph import edges_sql

    n_expr = "(select count(*) from documents)"
    return (
        f"select distinct least(src, dst) as u, greatest(src, dst) as w "
        f"from ({edges_sql(d, 'documents', n_expr)}) e where src <> dst"
    )


def _rich_club_sql(d: str) -> str:
    """Rich-club coefficient φ(k) for k = 1..6: among nodes of degree
    > k, the realized fraction of possible edges — whether the hubs of
    the link graph preferentially interconnect (the structural question
    behind influence/robustness analyses).  φ is the cross-multiplied
    exact pair (2·E_k, N_k·(N_k−1)) plus one rounded division.

    Scale: one degree aggregate, a 6-row k table broadcast against it,
    and an edges∶degree semi-join per k — edges scan once, k fan-out is
    a constant 6."""
    ks = " union all ".join(f"select {k} as k" for k in range(1, 7))
    return f"""
        with edges as ({_graph_edges(d)}),
        deg as (
            select node, cast(count(*) as bigint) as dg from (
                select u as node from edges
                union all
                select w as node from edges
            ) both_ends group by node
        ),
        ks as ({ks}),
        club as (
            select k.k, d.node from ks k join deg d on d.dg > k.k
        ),
        nk as (
            select k, cast(count(*) as bigint) as n_k from club group by k
        ),
        ek as (
            select c1.k, cast(count(*) as bigint) as e_k
            from edges e
            join club c1 on c1.node = e.u
            join club c2 on c2.node = e.w and c2.k = c1.k
            group by c1.k
        )
        select cast(n.k as bigint) as k, n.n_k,
               cast(coalesce(e.e_k, 0) as bigint) as e_k,
               round(2.0e0 * cast(coalesce(e.e_k, 0) as double)
                     / (cast(n.n_k as double)
                        * cast(n.n_k - 1 as double)), 9) as phi
        from nk n left join ek e on e.k = n.k
        where n.n_k >= 2"""


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_rich_club_sql(SPARK))


def q_rich_club_oracle() -> str:
    return _rich_club_sql(DUCK)


def _assortativity_sql(d: str) -> str:
    """Degree assortativity of the link graph — the Pearson correlation
    of endpoint degrees over edges (Newman 2002), the single number that
    says whether hubs attach to hubs (social) or to leaves
    (technological).  Every moment (Σx, Σy, Σxy, Σx², Σy² over DIRECTED
    edge endpoints, both orientations) is an exact bigint of integer
    degrees; r is one fixed float sequence, rounded 1e-9.

    Scale: degree aggregate + two broadcast degree lookups on the edge
    scan + one 1-row moment fold."""
    return f"""
        with edges as ({_graph_edges(d)}),
        deg as (
            select node, cast(count(*) as bigint) as dg from (
                select u as node from edges
                union all
                select w as node from edges
            ) both_ends group by node
        ),
        pairs as (
            select da.dg as x, db.dg as y
            from edges e
            join deg da on da.node = e.u
            join deg db on db.node = e.w
            union all
            select db.dg as x, da.dg as y
            from edges e
            join deg da on da.node = e.u
            join deg db on db.node = e.w
        ),
        mom as (
            select cast(count(*) as bigint) as m,
                   cast(sum(x) as bigint) as sx,
                   cast(sum(y) as bigint) as sy,
                   cast(sum(x * y) as bigint) as sxy,
                   cast(sum(x * x) as bigint) as sxx,
                   cast(sum(y * y) as bigint) as syy
            from pairs
        )
        select m, sx, sxy,
               round((cast(m as double) * cast(sxy as double)
                      - cast(sx as double) * cast(sy as double))
                     / (sqrt(cast(m as double) * cast(sxx as double)
                             - cast(sx as double) * cast(sx as double))
                        * sqrt(cast(m as double) * cast(syy as double)
                               - cast(sy as double) * cast(sy as double))),
                     9) as assortativity
        from mom"""


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_assortativity_sql(SPARK))


def q_assortativity_oracle() -> str:
    return _assortativity_sql(DUCK)


# ---------------------------------------------------------------------------
# A/B power analysis (required sample size from observed variance)
# ---------------------------------------------------------------------------
_PW_Z_ALPHA = 1.959963984540054  # Φ⁻¹(0.975), two-sided α = 0.05
_PW_Z_BETA = 0.8416212335729143  # Φ⁻¹(0.80), power = 0.80
_PW_MDE_PCT = 5  # minimum detectable effect: 5% of the current mean


def _power_sql(d: str) -> str:
    """Per event_type: the per-arm sample size a two-sample test needs to
    detect a 5%-of-mean shift at α=0.05 (two-sided) with 80% power —
    n = 2(z_{α/2}+z_β)²σ²/δ² — the planning number every experiment
    review asks for next to the `ab_test` readout.  The normal quantiles
    are Python literals (no cross-engine inverse-CDF); σ² and the mean
    come from exact integer moments of 1e-3-quantized values (q6 squared
    sums would leave bigint at SF ≥ 0.01 — measured); n is one fixed
    float sequence ceil'd to an exact integer.

    Scale: one type-keyed moment aggregate — a single map-side-combined
    pass."""
    xq = "cast(floor(value * 1.0e3 + 0.5e0) as bigint)"
    z2 = (_PW_Z_ALPHA + _PW_Z_BETA) ** 2
    return f"""
        with mom as (
            select event_type,
                   cast(count(*) as bigint) as n,
                   cast(sum({xq}) as bigint) as sx,
                   cast(sum({xq} * {xq}) as bigint) as sxx
            from events group by event_type
        )
        select event_type, n,
               round((cast(sxx as double) - cast(sx as double)
                      * cast(sx as double) / cast(n as double))
                     / cast(n - 1 as double) / 1.0e6, 9) as variance,
               round(cast(sx as double) / cast(n as double) / 1.0e3, 9)
                   as mean,
               cast(ceil(2.0e0 * {z2!r}e0
                    * ((cast(sxx as double) - cast(sx as double)
                        * cast(sx as double) / cast(n as double))
                       / cast(n - 1 as double))
                    / ((cast(sx as double) / cast(n as double))
                       * {_PW_MDE_PCT / 100.0!r}e0
                       * (cast(sx as double) / cast(n as double))
                       * {_PW_MDE_PCT / 100.0!r}e0)) as bigint)
                   as n_per_arm
        from mom"""


def q_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_power_sql(SPARK))


def q_power_oracle() -> str:
    return _power_sql(DUCK)


def register_r5q(QUERIES: dict) -> None:
    QUERIES["anisotropy"] = (q_anisotropy, q_anisotropy_oracle)
    QUERIES["rich_club"] = (q_rich_club, q_rich_club_oracle)
    QUERIES["degree_assortativity"] = (q_assortativity, q_assortativity_oracle)
    QUERIES["power_analysis"] = (q_power, q_power_oracle)
