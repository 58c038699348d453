"""Point-in-polygon binding: stops/quays → zone polygons.

North-rule operator (SURVEY §2.2).  Two physical strategies, one semantic:

* **broadcast** (small polygon set, the NeTEx case — zones per country are
  10²–10⁴): polygons broadcast, each point tests only candidates sharing its
  cell → no shuffle of the big side at all;
* **cell-join** (both sides huge): points keyed by cell equi-join the
  (cell, polygon) index table, AQE splits skewed dense-city cells, then the
  exact ray-cast filters candidates.

The candidate index uses the conservative bbox cover (superset of any cell
containing polygon interior), so no true hit is ever pruned; the ray-cast
(functions.geo.point_in_polygon — Catalyst higher-order aggregate, no Python)
restores exactness.  Correctness oracle: brute-force ray-cast cross join in
DuckDB (same formula, same dialect library).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import geo
from ..functions.portable import SPARK


def bind_points_to_polygons(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "point_id",
    polygon_id: str = "zone_id",
    lat: str = "lat",
    lon: str = "lon",
    pos_list: str = "pos_list",
    res: int = 8,
    scheme: str = "quad",
    broadcast_polygons: bool = True,
    dedup: bool = False,
) -> DataFrame:
    """(point_id, zone_id) for every point strictly inside a polygon.

    A point in k polygons yields k rows (overlapping zones are real in fare
    networks).  Points in no polygon yield no row — callers left-join if they
    need misses.

    No shuffle in the default path: a point has exactly ONE cell at `res`,
    and both cover builders emit each (zone, cell) once (quad: row×col range
    product; hex: axial range product), so the candidate join cannot
    duplicate a (point, zone) pair and the result needs no distinct.  Pass
    ``dedup=True`` only when feeding a custom polygon index that may repeat
    (zone, cell) rows.
    """
    cell_fn = geo.hex_cell if scheme == "hex" else geo.quad_cell

    pts = points.select(
        F.col(point_id).alias("__pid"),
        F.col(lat).alias("__plat"),
        F.col(lon).alias("__plon"),
        F.expr(cell_fn(lat, lon, res, SPARK)).alias("__cell"),
    )
    # classified cell index (build side, computed once per (zone, cell)):
    # interior cells (class 2) prove containment — probe-side candidates
    # skip the O(vertices) ray-cast entirely; boundary cells (class 1)
    # keep the exact test; outside cells (class 0) are pruned before the
    # join, shrinking candidate fan-out 2-5x vs the raw bbox cover.  The
    # per-candidate test is the cost that multiplies by 10^12 at the design
    # point — this moves it into the dimension build.
    # exploded-row cover build (same rows as explode(cover_bbox), far smaller
    # expressions → ~3x less fixed plan cost; see tiling.cover_cells)
    from .tiling import cover_cells

    classify_fn = geo.hex_cell_classify if scheme == "hex" else geo.quad_cell_classify
    polys = (
        cover_cells(
            polygons.select(
                F.col(polygon_id).alias("__zid"), F.col(pos_list).alias("__pl")
            ),
            "__zid",
            res,
            scheme,
            pos_list="__pl",
            keep=("__pl",),
            cell_col="__cell",
        )
        .withColumn("__cls", F.expr(classify_fn("__cell", "__pl", res, SPARK)))
        .where(F.col("__cls") > 0)
    )
    exact = geo.point_in_polygon("__plat", "__plon", "__pl", SPARK)
    # lazy CASE: the ray-cast only evaluates for boundary-cell candidates
    hit_pred = F.expr(f"CASE WHEN __cls = 2 THEN true ELSE ({exact}) END")
    if broadcast_polygons:
        polys = F.broadcast(polys)

    cand = pts.join(polys, "__cell")
    hit = cand.where(hit_pred)
    out = hit.select(F.col("__pid").alias(point_id), F.col("__zid").alias(polygon_id))
    return out.distinct() if dedup else out


def bind_points_brute_force(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "point_id",
    polygon_id: str = "zone_id",
    lat: str = "lat",
    lon: str = "lon",
    pos_list: str = "pos_list",
) -> DataFrame:
    """Reference-free oracle path: cross-join + ray-cast (test scale only)."""
    pts = points.select(F.col(point_id), F.col(lat).alias("__plat"), F.col(lon).alias("__plon"))
    pl = polygons.select(F.col(polygon_id), F.col(pos_list).alias("__pl"))
    return (
        pts.crossJoin(F.broadcast(pl))
        .where(F.expr(geo.point_in_polygon("__plat", "__plon", "__pl", SPARK)))
        .select(point_id, polygon_id)
    )
