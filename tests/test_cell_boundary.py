"""cellToBoundary: points lie inside their assigned cell's ring, rings are
CCW, quad corners are exact grid lines."""

import pyspark.sql.functions as F

from osm_to_netex_spark.functions import geo
from osm_to_netex_spark.functions.portable import SPARK


def _pts(spark, n=200):
    return spark.range(n).selectExpr(
        "id",
        "(cast(id as double) * 37.7e0) % 120.0e0 - 60.0e0 as lat",
        "(cast(id as double) * 91.3e0) % 340.0e0 - 170.0e0 as lon",
    )


def test_point_inside_own_hex_ring(spark):
    pts = _pts(spark)
    df = pts.selectExpr(
        "lat", "lon", f"{geo.hex_cell('lat', 'lon', 8, SPARK)} as cell"
    ).selectExpr("lat", "lon", f"{geo.hex_boundary('cell', 8, SPARK)} as ring")
    outside = df.where(
        "not (" + geo.point_in_polygon("lat", "lon", "ring", SPARK) + ")"
    )
    assert outside.count() == 0


def test_point_inside_own_quad_ring(spark):
    pts = _pts(spark)
    df = pts.selectExpr(
        "lat", "lon", f"{geo.quad_cell('lat', 'lon', 9, SPARK)} as cell"
    ).selectExpr("lat", "lon", f"{geo.quad_boundary('cell', 9, SPARK)} as ring")
    outside = df.where(
        "not (" + geo.point_in_polygon("lat", "lon", "ring", SPARK) + ")"
    )
    assert outside.count() == 0


def test_rings_are_ccw(spark):
    pts = _pts(spark, 50)
    for cfn, bfn, res in (
        (geo.hex_cell, geo.hex_boundary, 8),
        (geo.quad_cell, geo.quad_boundary, 9),
    ):
        df = pts.selectExpr(f"{cfn('lat', 'lon', res, SPARK)} as cell").distinct()
        ring = df.selectExpr(f"{bfn('cell', res, SPARK)} as ring")
        # shoelace cross-sum > 0 <=> CCW in (lon, lat)
        bad = ring.where(F.expr(f"({geo.poly_cross_sum('ring', SPARK)}) <= 0.0e0"))
        assert bad.count() == 0


def test_quad_corners_exact(spark):
    n = 2**9
    row = (
        spark.range(1)
        .selectExpr(f"{geo.quad_cell('10.0e0', '20.0e0', 9, SPARK)} as cell")
        .selectExpr(f"{geo.quad_boundary('cell', 9, SPARK)} as ring")
        .collect()[0]
    )
    ring = list(row["ring"])
    import math

    ix = math.floor((20.0 + 180.0) / 360.0 * n)
    iy = math.floor((10.0 + 90.0) / 180.0 * n)
    assert ring[0] == iy * (180.0 / n) - 90.0
    assert ring[1] == ix * (360.0 / n) - 180.0
    assert ring[4] == (iy + 1) * (180.0 / n) - 90.0
    assert ring[3] == (ix + 1) * (360.0 / n) - 180.0
