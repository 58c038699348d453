"""Round-5 batch T (SURVEY §2.3 `(r5)` row): greedy facility location —
the maximal-covering location problem (MCLP) greedy, opening the spatial
optimization family (site selection over the point corpus).

Landing discipline as everywhere (LANDING.md): pure-integer decisions
(coverage counts; the argmax is count-then-coordinates lexicographic;
the radius test compares mm²-quantized squared equirect distance),
iterative Spark rounds + AS MATERIALIZED oracle, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

_FS_RES = 13
_FS_K = 3  # facilities to place
_FS_RADIUS_M = 2000.0
_M_PER_DEG = 111194.92664455873


def _fs_base_sql(d: str) -> str:
    """CTE chain ending in ``cover(cx, cy, point_id)``: candidate sites
    are the occupied res-13 cells; a point is covered by a site whose
    CELL CENTER lies within 2 km (equirect, mm²-quantized compare).
    Candidate pairs prune by the ±1-cell band (cell size ≈ 2.5 km ≥ R,
    so the 9-offset neighborhood is a complete cover — the D8 constant
    fan-out shape, no cross product)."""
    from . import queries as q
    from ..functions import geo

    n = 2**_FS_RES
    ix, iy = geo.quad_ixy("lat", "lon", _FS_RES, d)
    clat = f"(-90.0e0 + (cast(c.cy as double) + 0.5e0) * {180.0 / n!r}e0)"
    clon = f"(-180.0e0 + (cast(c.cx as double) + 0.5e0) * {360.0 / n!r}e0)"
    dy = f"((p.lat - {clat}) * {_M_PER_DEG!r}e0)"
    dx = f"((p.lon - {clon}) * {_M_PER_DEG * q.COSLAT0!r}e0)"
    d2_mm2 = (
        f"cast(floor(({dx} * {dx} + {dy} * {dy}) * 1.0e6 + 0.5e0) as bigint)"
    )
    r2_mm2 = int(_FS_RADIUS_M * _FS_RADIUS_M * 1.0e6)
    offs = " union all ".join(
        f"select {ox} as ox, {oy} as oy"
        for ox in (-1, 0, 1)
        for oy in (-1, 0, 1)
    )
    return f"""pts as (
            select point_id, lat, lon, {ix} as px, {iy} as py
            from geo_points
        ),
        cand as (select distinct px as cx, py as cy from pts),
        offs as ({offs}),
        cover as (
            select c.cx, c.cy, p.point_id
            from cand c
            join offs o on 1 = 1
            join pts p on p.px = c.cx + o.ox and p.py = c.cy + o.oy
            where {d2_mm2} <= {r2_mm2}
        )"""


def _fs_round_oracle(t: int) -> str:
    """One greedy round as oracle CTEs: count coverage over uncovered
    points, argmax by (count desc, cx, cy), accumulate the covered set."""
    return f"""
        gain{t} as materialized (
            select c.cx, c.cy, cast(count(*) as bigint) as g
            from cover c
            where not exists (select 1 from cov{t} z
                              where z.point_id = c.point_id)
            group by c.cx, c.cy
        ),
        pick{t} as materialized (
            select cx, cy, g from (
                select cx, cy, g, row_number() over (
                    order by g desc, cx asc, cy asc) as rn
                from gain{t}
            ) s where rn = 1
        ),
        cov{t + 1} as materialized (
            select point_id from cov{t}
            union
            select c.point_id from cover c
            join pick{t} p on p.cx = c.cx and p.cy = c.cy
        )"""


def q_facility_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, cx, cy, n_new, n_total): greedy maximal-covering facility
    placement — k=3 sites from the occupied-cell candidate set, each
    round picking the site covering the most still-uncovered points
    (ties by coordinates), the 1−1/e-approximate classic under every
    coverage-planning deployment.

    Scale: the cover relation builds ONCE (constant 9-offset band join —
    complete since cell ≥ radius) and persists across rounds; each round
    is one anti-join + one map-side-combined count + a candidate-sized
    argmax — k rounds, localCheckpoint-bounded."""
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    spark.sql(
        f"with {_fs_base_sql(SPARK)} select cx, cy, point_id from cover"
    ).localCheckpoint(eager=False).createOrReplaceTempView("__fs_cover")
    spark.sql(
        "select cast(point_id as bigint) as point_id from __fs_cover "
        "where 1 = 0"
    ).createOrReplaceTempView("__fs_cov0")
    picks = []
    for t in range(_FS_K):
        gain = spark.sql(f"""
            select c.cx, c.cy, cast(count(*) as bigint) as g
            from __fs_cover c
            where not exists (select 1 from __fs_cov{t} z
                              where z.point_id = c.point_id)
            group by c.cx, c.cy""")
        gain.localCheckpoint(eager=False).createOrReplaceTempView(
            f"__fs_gain{t}"
        )
        pick = spark.sql(f"""
            select cx, cy, g from (
                select cx, cy, g, row_number() over (
                    order by g desc, cx asc, cy asc) as rn
                from __fs_gain{t}
            ) s where rn = 1""")
        pick.localCheckpoint(eager=False).createOrReplaceTempView(
            f"__fs_pick{t}"
        )
        picks.append(f"__fs_pick{t}")
        spark.sql(f"""
            select point_id from __fs_cov{t}
            union
            select c.point_id from __fs_cover c
            join __fs_pick{t} p on p.cx = c.cx and p.cy = c.cy""").localCheckpoint(
            eager=False
        ).createOrReplaceTempView(f"__fs_cov{t + 1}")
    sel = " union all ".join(
        f"select cast({t + 1} as bigint) as rank, cx, cy, g as n_new, "
        f"(select cast(count(*) as bigint) from __fs_cov{t + 1}) as n_total "
        f"from {v}"
        for t, v in enumerate(picks)
    )
    return spark.sql(sel).selectExpr(
        "rank", "cast(cx as bigint) as cx", "cast(cy as bigint) as cy",
        "n_new", "n_total"
    )


def q_facility_select_oracle() -> str:
    from . import queries as q

    ctes = [
        q.duck_geometry_ctes().replace("with ", "", 1),
        _fs_base_sql(DUCK),
        "cov0 as materialized (select cast(point_id as bigint) as point_id "
        "from cover where 1 = 0)",
    ]
    for t in range(_FS_K):
        ctes.append(_fs_round_oracle(t))
    sel = " union all ".join(
        f"select cast({t + 1} as bigint) as rank, cast(cx as bigint) as cx, "
        f"cast(cy as bigint) as cy, g as n_new, "
        f"(select cast(count(*) as bigint) from cov{t + 1}) as n_total "
        f"from pick{t}"
        for t in range(_FS_K)
    )
    return "with " + ", ".join(ctes) + " " + sel


def register_r5t(QUERIES: dict) -> None:
    QUERIES["facility_select"] = (q_facility_select, q_facility_select_oracle)
