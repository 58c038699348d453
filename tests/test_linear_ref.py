"""Linear referencing: chainage on a hand-built straight line is exact,
monotone along the line, bounded by total length."""

import pyspark.sql.functions as F

from osm_to_netex_spark.operators import distjoin


def _line(spark):
    # a polyline heading due east at the equator: 4 vertices, ~11.1 km legs
    ring = []
    for i in range(4):
        ring += [0.0, i * 0.1]
    lines = spark.createDataFrame(
        [(1, ring)], "zone_id: long, pos_list: array<double>"
    )
    return lines


def test_chainage_on_straight_line(spark):
    lines = _line(spark)
    pts = spark.createDataFrame(
        [
            (1, 0.001, 0.05),   # halfway into segment 1
            (2, -0.002, 0.15),  # halfway into segment 2
            (3, 0.0, 0.25),     # halfway into segment 3
            (4, 0.0, 0.0),      # at the very start
        ],
        "point_id: long, lat: double, lon: double",
    )
    out = {
        r["point_id"]: r
        for r in distjoin.linear_reference(pts, lines, radius_m=2000.0, res=12).collect()
    }
    assert len(out) == 4
    seg_m = 11131.9  # ~one 0.1 deg leg at the equator, meters
    assert abs(out[1]["chainage_mm"] / 1e6 - 0.5 * seg_m / 1000) < 0.05
    assert abs(out[2]["chainage_mm"] / 1e6 - 1.5 * seg_m / 1000) < 0.05
    assert abs(out[3]["chainage_mm"] / 1e6 - 2.5 * seg_m / 1000) < 0.05
    assert out[4]["chainage_mm"] == 0
    # monotone along the travel direction
    ch = [out[i]["chainage_mm"] for i in (4, 1, 2, 3)]
    assert ch == sorted(ch)
    # bounded by the total line length
    total_mm = 3 * seg_m * 1000
    assert all(0 <= c <= total_mm * 1.01 for c in ch)


def test_out_of_radius_dropped(spark):
    lines = _line(spark)
    pts = spark.createDataFrame(
        [(1, 5.0, 0.05)], "point_id: long, lat: double, lon: double"
    )
    assert distjoin.linear_reference(pts, lines, radius_m=2000.0, res=12).count() == 0
