"""Grid BFS: wall routing, distance correctness, unreachable cells."""

from osm_to_netex_spark.operators import graph


def _cells(spark, xy):
    return spark.createDataFrame(xy, ["cell_x", "cell_y"])


def test_wall_forces_detour(spark):
    # source at (0,0); vertical wall at x=2 with a gap at y=3
    src = _cells(spark, [(0, 0)])
    wall = _cells(spark, [(2, y) for y in range(0, 3)] + [(2, y) for y in range(4, 8)])
    got = {(r.cell_x, r.cell_y): r.dist
           for r in graph.grid_bfs(src, wall, max_dist=9, res=4).collect()}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    # straight-line to (3,0) is blocked; path must thread the gap at (2,3):
    # (0,0)->(0..1,3)... shortest = up 3, right 2, down 3 → 8? verify: manhattan
    # up to (1,3)=4, through gap (2,3)=5, then down to (3,0): (3,3)=6,(3,2)=7,(3,1)=8,(3,0)=9
    assert got[(2, 3)] == 5
    assert got[(3, 0)] == 9
    # wall cells are never reached
    assert (2, 0) not in got and (2, 5) not in got


def test_blocked_source_excluded(spark):
    src = _cells(spark, [(1, 1)])
    blk = _cells(spark, [(1, 1)])
    assert graph.grid_bfs(src, blk, max_dist=3, res=4).count() == 0


def test_multi_source_min(spark):
    src = _cells(spark, [(0, 0), (6, 0)])
    empty = spark.createDataFrame([], "cell_x bigint, cell_y bigint")
    got = {(r.cell_x, r.cell_y): r.dist
           for r in graph.grid_bfs(src, empty, max_dist=4, res=4).collect()}
    # midpoint (3,0) is 3 from either source
    assert got[(3, 0)] == 3
    assert got[(0, 0)] == 0 and got[(6, 0)] == 0
