"""Polygon-polygon overlap join (spatial intersection join).

Finds every pair of intersecting polygons (≈ OGC ST_Intersects; boundary
degeneracies follow the ray-cast convention, see geo.polygons_overlap) — the
join class the
reference's zone model implies but never needs (its zones are disjoint by
construction; `OsmToNetexMapper.java` maps each relation independently).  At
engine scale this is the canonical "which zones conflict / which coverage
areas collide" query over 10^8+ polygons.

Scale design:

* **Cell-cover prefilter.** Both sides are covered with quad cells at `res`
  via the exploded ``cover_cells`` builder; candidates are pairs sharing a
  cover cell (hash equi-join on cell — shuffled or broadcast, Catalyst's
  choice by size).  A polygon pair in disjoint cells is never materialized,
  so candidate volume is O(overlapping-bbox pairs), not O(n²).
* **Distinct before refine.** A pair sharing c cells appears c times; pairs
  are ``distinct``-ed on (id_a, id_b) BEFORE the exact predicate, and the
  packed rings are joined back afterwards — the O(|A|·|B|)-per-pair exact
  test runs exactly once per candidate, and the wide pos_list arrays stay
  off the candidate shuffle (same shape as the LSH verify in dedup.py).
* **Bbox quick reject.** Cover granularity is bounded by the cell grid; the
  exact per-pair bbox test removes corner-touching cell neighbors cheaply
  before the edge-pair predicate.
* **Exact refine.** ``geo.polygons_overlap`` — vertex-in-polygon both ways
  (covers containment) + proper edge crossing (covers star-crossings with
  no contained vertex).  Pure whole-stage-codegen SQL, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import geo
from ..functions.portable import SPARK
from .tiling import cover_cells


def polygon_overlap_join(
    polys: DataFrame,
    res: int = 12,
    id_col: str = "zone_id",
    pos_list: str = "pos_list",
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b for every interior-overlapping pair."""
    lats = geo.poslist_lats(pos_list, SPARK)
    lons = geo.poslist_lons(pos_list, SPARK)
    rings = polys.selectExpr(
        f"{id_col} as pid",
        f"{pos_list} as ring",
        f"array_min({lats}) as lat_lo",
        f"array_max({lats}) as lat_hi",
        f"array_min({lons}) as lon_lo",
        f"array_max({lons}) as lon_hi",
    )
    cover = cover_cells(polys, id_col, res, scheme="quad", pos_list=pos_list).select(
        F.col(id_col).alias("pid"), "cell"
    )
    cand = (
        cover.alias("a")
        .join(cover.alias("b"), "cell")
        .where(F.col("a.pid") < F.col("b.pid"))
        .select(F.col("a.pid").alias("id_a"), F.col("b.pid").alias("id_b"))
        .distinct()
        # materialize the (small) candidate id table: downstream it feeds
        # two ring join-backs + the refine predicate, and without a barrier
        # the cover/self-join pipeline re-plans into each consumer (the
        # fused plan measured 30 s vs ~8 s with the barrier at sf0.1 —
        # stage isolation showed the refine itself is 3 s)
        .localCheckpoint(eager=False)
    )
    a = rings.select(
        F.col("pid").alias("id_a"),
        F.col("ring").alias("ring_a"),
        F.col("lat_lo").alias("alat_lo"),
        F.col("lat_hi").alias("alat_hi"),
        F.col("lon_lo").alias("alon_lo"),
        F.col("lon_hi").alias("alon_hi"),
    )
    b = rings.select(
        F.col("pid").alias("id_b"),
        F.col("ring").alias("ring_b"),
        F.col("lat_lo").alias("blat_lo"),
        F.col("lat_hi").alias("blat_hi"),
        F.col("lon_lo").alias("blon_lo"),
        F.col("lon_hi").alias("blon_hi"),
    )
    overlap = geo.polygons_overlap("ring_a", "ring_b", SPARK)
    # the exact predicate is ~1 ms/pair (vertex ray-casts + edge crossings
    # over packed rings); the candidate table is SMALL after distinct, so
    # AQE coalesces it to one partition and serializes the refine (measured
    # 26 s at sf0.1 on one core).  Spread the expensive stage explicitly —
    # compute-bound stages size partitions by CPU, not by bytes.
    par = 4 * int(polys.sparkSession.sparkContext.defaultParallelism)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where(
            "alat_lo <= blat_hi AND blat_lo <= alat_hi AND "
            "alon_lo <= blon_hi AND blon_lo <= alon_hi"
        )
        .repartition(par, "id_a", "id_b")
        .where(F.expr(overlap))
        .select("id_a", "id_b")
    )


def dissolve(
    polys: DataFrame,
    res: int = 12,
    id_col: str = "zone_id",
    pos_list: str = "pos_list",
) -> DataFrame:
    """Polygon dissolve (ST_Union grouping without the geometry merge):
    overlapping polygons collapse into components — the transitive closure
    of the pairwise overlap join — and each component is rolled up to
    (component, n_polys, lat_lo, lat_hi, lon_lo, lon_hi, area_q), where
    component = min member id, bbox = envelope of the members, and area_q =
    Σ round(shoelace_area_deg2 · 1e12) as bigint (quantize-then-sum keeps
    the float fold order-free, the engine's integer-fold discipline).

    Pipeline: cell-cover overlap join (above) → alternating-star connected
    components (dedup.connected_components — O(log n) rounds, two shuffles
    per round) → isolated polygons rejoin as their own singleton component
    via a left join → one map-side-combined groupBy.  No stage ever holds a
    component's geometry in one task; the rollup is associative.

    The DuckDB oracle replays the same overlap predicate brute-force and
    closes reachability with a recursive CTE — an INDEPENDENT fixpoint
    algorithm, so the gate checks the distributed CC itself, not a replay.
    """
    from .dedup import connected_components

    edges = polygon_overlap_join(polys, res=res, id_col=id_col, pos_list=pos_list)
    comps = connected_components(edges, src="id_a", dst="id_b")
    area_q = f"cast(round(({geo.poly_area(pos_list, SPARK)}) * 1.0e12) as bigint)"
    lats = geo.poslist_lats(pos_list, SPARK)
    lons = geo.poslist_lons(pos_list, SPARK)
    base = polys.selectExpr(
        f"{id_col} as zone_id",
        f"array_min({lats}) as p_lat_lo",
        f"array_max({lats}) as p_lat_hi",
        f"array_min({lons}) as p_lon_lo",
        f"array_max({lons}) as p_lon_hi",
        f"{area_q} as p_area_q",
    )
    memb = base.join(
        comps.withColumnRenamed("doc_id", "zone_id"), "zone_id", "left"
    ).selectExpr(
        "coalesce(component, zone_id) as component",
        "p_lat_lo", "p_lat_hi", "p_lon_lo", "p_lon_hi", "p_area_q",
    )
    return memb.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_polys"),
        F.min("p_lat_lo").alias("lat_lo"),
        F.max("p_lat_hi").alias("lat_hi"),
        F.min("p_lon_lo").alias("lon_lo"),
        F.max("p_lon_hi").alias("lon_hi"),
        F.sum("p_area_q").cast("long").alias("area_q"),
    )


def dissolve_oracle_sql(polys_cte: str = "geo_polys") -> str:
    """Brute overlap edges + recursive-CTE reachability + same rollup."""
    from ..functions.portable import DUCK

    pred = geo.polygons_overlap("a.pos_list", "b.pos_list", DUCK)
    area_q = f"cast(round(({geo.poly_area('pos_list', DUCK)}) * 1.0e12) as bigint)"
    lats = geo.poslist_lats("pos_list", DUCK)
    lons = geo.poslist_lons("pos_list", DUCK)
    return f"""
        e0 as (
            select a.zone_id as a, b.zone_id as b
            from {polys_cte} a cross join {polys_cte} b
            where a.zone_id < b.zone_id and {pred}
        ),
        edges as (select a, b from e0 union select b as a, a as b from e0),
        reach(v, l) as (
            select a, a from edges
            union
            select e.a, r.l from edges e join reach r on r.v = e.b
        ),
        comp as (select v as zone_id, min(l) as component from reach group by v),
        memb as (
            select coalesce(c.component, p.zone_id) as component,
                   list_min({lats}) as p_lat_lo,
                   list_max({lats}) as p_lat_hi,
                   list_min({lons}) as p_lon_lo,
                   list_max({lons}) as p_lon_hi,
                   {area_q} as p_area_q
            from {polys_cte} p left join comp c using (zone_id)
        )
        select component,
               cast(count(*) as bigint) as n_polys,
               min(p_lat_lo) as lat_lo, max(p_lat_hi) as lat_hi,
               min(p_lon_lo) as lon_lo, max(p_lon_hi) as lon_hi,
               cast(sum(p_area_q) as bigint) as area_q
        from memb group by component
    """
