"""Raster↔vector tile lookup (north rule, SURVEY §2.2).

A raster layer is a table keyed by quad cell: raster(cell bigint, res int,
value double) — elevation, media density, etc.  Lookups:

* point lookup: point → cell → broadcast equi-join (small raster) or plain
  equi-join on the pre-partitioned cell key (large raster);
* zonal stats: polygon cover cells → join raster → avg/min/max per zone —
  a partial-aggregated (map-side combined) groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import geo
from ..functions.portable import SPARK


def synthesize_raster(spark, res: int = 8, bbox=(59.4, 60.2, 9.6, 10.6), seed: int = 42) -> DataFrame:
    """Deterministic raster over the bbox at a quad resolution: one row per
    cell, value = portable-hash pseudo-elevation (meters)."""
    from ..functions.portable import phash60, flit

    lat_lo, lat_hi, lon_lo, lon_hi = bbox
    n = 2**res
    iy_lo = int((lat_lo + 90.0) / 180.0 * n)
    iy_hi = int((lat_hi + 90.0) / 180.0 * n)
    ix_lo = int((lon_lo + 180.0) / 360.0 * n)
    ix_hi = int((lon_hi + 180.0) / 360.0 * n)
    w = ix_hi - ix_lo + 1
    cells = spark.range((iy_hi - iy_lo + 1) * w).selectExpr(
        f"({iy_lo} + id div {w}) as iy", f"({ix_lo} + id % {w}) as ix"
    )
    h = phash60(f"concat('{seed}:ras:', iy, ':', ix)", SPARK)
    return cells.selectExpr(
        geo.quad_pack("ix", "iy", res) + " as cell",
        f"{res} as res",
        f"round(({h} / {flit(float(2**60))}) * 2000.0e0, 3) as value",
    )


def point_raster_lookup(
    points: DataFrame,
    raster: DataFrame,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
    broadcast_raster: bool = True,
) -> DataFrame:
    """points + raster value at their quad cell (left join: off-raster → null)."""
    pts = points.withColumn("cell", F.expr(geo.quad_cell(lat, lon, res, SPARK)))
    r = raster.select("cell", "value")
    if broadcast_raster:
        r = F.broadcast(r)
    return pts.join(r, "cell", "left")


def zonal_stats(
    polygons: DataFrame,
    raster: DataFrame,
    res: int,
    polygon_id: str = "zone_id",
    pos_list: str = "pos_list",
    broadcast_raster: bool = True,
) -> DataFrame:
    """Per-polygon raster stats over its (bbox-cover) cells."""
    from .tiling import cover_cells

    cover = cover_cells(polygons, polygon_id, res, "quad", pos_list)
    r = raster.select("cell", "value")
    if broadcast_raster:
        r = F.broadcast(r)
    return (
        cover.join(r, "cell")
        .groupBy(polygon_id)
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("*").alias("n_cells"),
        )
    )
