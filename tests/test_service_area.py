"""Service area: seed distance zero, triangle-inequality-free exact hop
distances on a hand grid, monotone rounds, budget filter."""

from osm_to_netex_spark.operators import tiling


def _grid(spark, nodes, seed_ids):
    """nodes: (point_id, ix, iy) at res 5 — point at the center of cell."""
    n = 2**5
    rows = []
    for pid, ix, iy in nodes:
        lat = (iy + 0.5) * (180.0 / n) - 90.0
        lon = (ix + 0.5) * (360.0 / n) - 180.0
        rows.append((pid, lat, lon))
    spark.createDataFrame(rows, "point_id: long, lat: double, lon: double") \
        .createOrReplaceTempView("sa_pts")


def test_line_graph_distances(spark):
    # 4 cells in a row; seed at the left end (point_id 0 % 9 == 0)
    _grid(spark, [(0, 10, 10), (1, 11, 10), (2, 12, 10), (3, 13, 10)], [0])
    out = {
        (r["ix"], r["iy"]): r["dist"]
        for r in tiling.service_area(spark, res=5, n_rounds=4, seed_mod=9,
                                     points_table="sa_pts").collect()
    }
    assert out[(10, 10)] == 0
    # one hop east ≈ constant: distances are exact multiples of the hop
    hop = out[(11, 10)]
    assert hop > 0
    assert out[(12, 10)] == 2 * hop
    assert out[(13, 10)] == 3 * hop


def test_rounds_bound_reach(spark):
    _grid(spark, [(0, 10, 10)] + [(i, 10 + i, 10) for i in range(1, 7)], [0])
    r2 = tiling.service_area(spark, res=5, n_rounds=2, seed_mod=9,
                             points_table="sa_pts").count()
    r5 = tiling.service_area(spark, res=5, n_rounds=5, seed_mod=9,
                             points_table="sa_pts").count()
    assert r2 == 3 and r5 == 6  # seed + n_rounds hops along the line


def test_budget_filter(spark):
    _grid(spark, [(0, 10, 10), (1, 11, 10), (2, 12, 10)], [0])
    full = tiling.service_area(spark, res=5, n_rounds=3, seed_mod=9,
                               points_table="sa_pts").collect()
    hop = min(r["dist"] for r in full if r["dist"] > 0)
    within = tiling.service_area(spark, res=5, n_rounds=3, seed_mod=9,
                                 budget_mm=hop, points_table="sa_pts")
    assert within.count() == 2  # seed + first hop only
