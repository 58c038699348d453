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


def idw_interpolate(
    points: DataFrame,
    stations: DataFrame,
    radius_m: float,
    res: int = 10,
    point_id: str = "point_id",
    station_id: str = "station_id",
    value_col: str = "value",
) -> DataFrame:
    """Inverse-distance-weighted interpolation: for each point, the
    IDW-2 average of station values within ``radius_m`` —
    (point_id, idw_value, n_stations).  Points with no station in range
    drop out (no extrapolation).

    Candidates come from the data-driven ring join (distjoin.radius_join) —
    never a cartesian; weights are 1/max(d,1m)² (clamp kills the exact-hit
    singularity).  Both weight sums fold in sorted station order
    (collect_list → array_sort → aggregate), so the float result is
    independent of partitioning and arrival order — the same order-free
    discipline as BM25 — and the DuckDB oracle replays it exactly."""
    from .distjoin import radius_join

    pairs = radius_join(
        points,
        stations.withColumnRenamed(station_id, "point_id")
        if station_id != "point_id"
        else stations,
        radius_m=radius_m,
        res=res,
        left_id=point_id,
        right_id="point_id",
    )
    # radius_join names outputs point_id_a/point_id_b on a self-named join
    a, b = f"{point_id}_a", f"{point_id}_b"
    sv = stations.select(
        F.col(station_id).alias(b), F.col(value_col).alias("__v")
    )
    w = "1.0e0 / (greatest(dist_m, 1.0e0) * greatest(dist_m, 1.0e0))"
    per = (
        pairs.join(sv, b)
        .selectExpr(
            f"{a} as __pid",
            f"{b} as __sid",
            f"{w} as __w",
            f"({w}) * __v as __wv",
        )
        .groupBy("__pid")
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(__sid, __w, __wv))), "
                "x -> x.__w), cast(0.0 as double), (s, v) -> s + v)"
            ).alias("__sw"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(__sid, __w, __wv))), "
                "x -> x.__wv), cast(0.0 as double), (s, v) -> s + v)"
            ).alias("__swv"),
            F.count(F.lit(1)).alias("n_stations"),
        )
    )
    return per.select(
        F.col("__pid").alias(point_id),
        F.round(F.expr("__swv / __sw"), 6).alias("idw_value"),
        "n_stations",
    )
