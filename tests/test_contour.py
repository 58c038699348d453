"""Marching squares: Python case-table replay, closed-loop topology, saddle
determinism."""

import pyspark.sql.functions as F


def _contour(spark, pts, res=4, threshold=2):
    from osm_to_netex_spark.operators import tiling

    df = spark.createDataFrame(pts, "lat: double, lon: double")
    df.createOrReplaceTempView("ms_pts")
    return tiling.contour(spark, res=res, threshold=threshold, points_table="ms_pts")


def _cell_center(ix, res):
    n = 2**res
    return (ix + 0.5) * (360.0 / n) - 180.0


def _pts_at(nodes, res, per_node):
    """per_node points dropped at the center of each (ix, iy) node cell."""
    n = 2**res
    out = []
    for ix, iy, cnt in nodes:
        lat = (iy + 0.5) * (180.0 / n) - 90.0
        lon = (ix + 0.5) * (360.0 / n) - 180.0
        out += [(lat, lon)] * cnt
    return out


def test_single_hot_node_emits_diamond(spark):
    """One node >= T surrounded by empties: 4 blocks emit one segment each,
    and together they close a diamond around the node (every endpoint used
    exactly twice)."""
    pts = _pts_at([(8, 8, 5)], res=4, per_node=None)
    rows = _contour(spark, pts, res=4, threshold=2).collect()
    assert len(rows) == 4
    from collections import Counter

    ends = Counter()
    for r in rows:
        ends[(r["gx1"], r["gy1"])] += 1
        ends[(r["gx2"], r["gy2"])] += 1
    assert all(v == 2 for v in ends.values())
    # interpolation: threshold 2 between v=5 and v=0 sits at t = 2/5 from
    # the hot node — each diamond vertex is 0.6 away from node (8, 8) in
    # exactly one axis
    for (gx, gy), _cnt in ends.items():
        dx, dy = abs(gx - 8.0), abs(gy - 8.0)
        assert sorted([round(dx, 9), round(dy, 9)]) == [0.0, 0.6]


def test_blob_contour_is_closed(spark):
    nodes = [(x, y, 4) for x in (6, 7, 8) for y in (6, 7)] + [(7, 8, 4)]
    rows = _contour(spark, _pts_at(nodes, 4, None), res=4, threshold=2).collect()
    from collections import Counter

    ends = Counter()
    for r in rows:
        ends[(r["gx1"], r["gy1"])] += 1
        ends[(r["gx2"], r["gy2"])] += 1
    assert rows and all(v == 2 for v in ends.values())


def test_saddle_is_deterministic_and_fixed(spark):
    """Diagonal corners hot (case 5): exactly two segments, the standard
    fixed resolution, stable across partitionings."""
    nodes = [(4, 4, 5), (5, 5, 5)]
    a = _contour(spark, _pts_at(nodes, 4, None), res=4, threshold=2)
    rows = a.collect()
    saddle = [r for r in rows if (r["bx"], r["by"]) == (4, 4)]
    assert len(saddle) == 2
    b = _contour(spark, _pts_at(nodes, 4, None) * 1, res=4, threshold=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))
