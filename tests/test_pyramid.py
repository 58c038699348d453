"""Tile-pyramid semantics: per-level totals, parent/child containment,
resolution encoding, single-shuffle plan shape, and partition invariance."""

from osm_to_netex_spark.functions import geo
from osm_to_netex_spark.operators import tiling


def _df(spark, rows):
    return spark.createDataFrame(rows, "point_id bigint, lat double, lon double")


def _pts(n):
    return [
        (i, 59.5 + (i * 7 % 97) * 0.008, 9.7 + (i * 11 % 89) * 0.009)
        for i in range(n)
    ]


def test_level_totals_and_res_encoding(spark):
    df = _df(spark, _pts(120))
    out = tiling.tile_pyramid(df, res_hi=12, res_lo=9).collect()
    by_res = {}
    for r in out:
        assert r.cell // 2**geo.QUAD_RES_BITS == r.res  # id encodes res
        by_res.setdefault(r.res, []).append(r)
    assert sorted(by_res) == [9, 10, 11, 12]  # no grand-total row
    for res, rows in by_res.items():
        assert sum(x.n_points for x in rows) == 120  # every level partitions
    # all levels agree on the weighted total too (exact integer sums)
    totals = {res: sum(x.w_sum for x in rows) for res, rows in by_res.items()}
    assert len(set(totals.values())) == 1


def test_parent_contains_children(spark):
    df = _df(spark, _pts(200))
    out = tiling.tile_pyramid(df, res_hi=13, res_lo=10).collect()
    cells = {r.cell: (r.n_points, r.w_sum) for r in out}
    import duckdb

    for r in out:
        res = r.cell // 2**geo.QUAD_RES_BITS
        if res == 10:
            continue
        parent = duckdb.sql(
            f"select {geo.quad_parent(str(r.cell), res, 'duckdb')} as p"
        ).fetchone()[0]
        assert cells[parent][0] >= r.n_points
    # and each parent's count equals the sum over its children
    kids = {}
    for r in out:
        res = r.cell // 2**geo.QUAD_RES_BITS
        if res == 10:
            continue
        parent = duckdb.sql(
            f"select {geo.quad_parent(str(r.cell), res, 'duckdb')} as p"
        ).fetchone()[0]
        k = kids.setdefault((parent, res - 1), [0, 0])
        k[0] += r.n_points
        k[1] += r.w_sum
    for (parent, _res), (n, w) in kids.items():
        assert cells[parent] == (n, w)


def test_single_shuffle_plan(spark):
    df = _df(spark, _pts(50))
    plan = tiling.tile_pyramid(df, res_hi=11, res_lo=9)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # ROLLUP = Expand + ONE agg shuffle
    assert "Expand" in plan


def test_partition_invariance(spark):
    df = _df(spark, _pts(300))
    a = sorted(map(tuple, tiling.tile_pyramid(df, res_hi=12, res_lo=9).collect()))
    b = sorted(
        map(tuple, tiling.tile_pyramid(df.repartition(13), res_hi=12, res_lo=9).collect())
    )
    assert a == b and len(a) > 30
