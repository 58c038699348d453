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
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where(
            "alat_lo <= blat_hi AND blat_lo <= alat_hi AND "
            "alon_lo <= blon_hi AND blon_lo <= alon_hi"
        )
        .where(F.expr(overlap))
        .select("id_a", "id_b")
    )
