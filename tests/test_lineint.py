"""Line-intersection join: geometry cases + brute-force equality."""

from pyspark.sql import functions as F

from osm_to_netex_spark.operators import distjoin


def _lines(spark, rows):
    return spark.createDataFrame(rows, ["zone_id", "pos_list"]).select(
        "zone_id", F.col("pos_list").cast("array<double>").alias("pos_list")
    )


def test_geometry_cases(spark):
    a = _lines(spark, [
        (1, [0.0, 0.0, 10.0, 10.0]),          # diagonal up-right
        (3, [0.0, 20.0, 10.0, 20.0]),         # vertical at lon 20
    ])
    b = _lines(spark, [
        (2, [10.0, 0.0, 0.0, 10.0]),          # crossing diagonal → hits zone 1
        (4, [5.0, 30.0, 5.0, 40.0]),          # far away, no crossing
        (6, [0.0, 0.0, 10.0, 0.0]),           # touches zone 1 only at endpoint (0,0)
    ])
    got = {(r.a_id, r.b_id): (r.int_lat, r.int_lon)
           for r in distjoin.line_intersection_join(a, b, res=6).collect()}
    assert set(got) == {(1, 2)}
    lat, lon = got[(1, 2)]
    assert abs(lat - 5.0) < 1e-9 and abs(lon - 5.0) < 1e-9


def test_matches_brute_force(spark):
    # deterministic pseudo-random zigzag polylines in a 2-degree box
    def zig(i):
        pts = []
        for j in range(5):
            pts += [((i * 7 + j * 13) % 20) / 10.0, ((i * 11 + j * 17) % 20) / 10.0]
        return (i, pts)

    a = _lines(spark, [zig(i) for i in range(1, 10, 2)])
    b = _lines(spark, [zig(i) for i in range(2, 11, 2)])
    fast = {tuple(r) for r in distjoin.line_intersection_join(a, b, res=10).collect()}

    pred, iy, ix = distjoin._seg_cross_exprs("a", "b")
    sa = distjoin._segments(a, "zone_id", "pos_list", "a")
    sb = distjoin._segments(b, "zone_id", "pos_list", "b")
    brute = {tuple(r) for r in sa.crossJoin(sb).where(F.expr(pred)).selectExpr(
        "a_id", "a_seg", "b_id", "b_seg",
        f"round({iy}, 9) as int_lat", f"round({ix}, 9) as int_lon").collect()}
    assert fast == brute and len(brute) > 0
