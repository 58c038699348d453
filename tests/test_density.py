"""Smoothed density: hand-computed kernel values + partition invariance."""

import pytest

from osm_to_netex_spark.operators import tiling


def test_single_point_kernel(spark):
    # one point in mid-cell; k=1 → 3x3 neighbourhood, weights 1 / (1/2)
    pts = spark.createDataFrame([(1, 0.01, 0.01)], ["point_id", "lat", "lon"])
    out = tiling.smooth_density(pts, res=10, k=1).collect()
    assert len(out) == 9
    by_density = sorted(r.density for r in out)
    assert by_density == pytest.approx([0.5] * 8 + [1.0])
    center = [r for r in out if r.raw_cnt == 1]
    assert len(center) == 1 and center[0].density == pytest.approx(1.0)


def test_counts_accumulate(spark):
    # 3 points in the same cell → center density 3, ring 1.5
    pts = spark.createDataFrame(
        [(i, 0.01, 0.01) for i in range(3)], ["point_id", "lat", "lon"]
    )
    out = {(r.cell_x, r.cell_y): r for r in tiling.smooth_density(pts, res=10, k=1).collect()}
    center = [r for r in out.values() if r.raw_cnt == 3]
    assert len(center) == 1 and center[0].density == pytest.approx(3.0)
    assert sorted(r.density for r in out.values())[:8] == pytest.approx([1.5] * 8)


def test_partition_invariant(spark):
    pts = spark.createDataFrame(
        [(i, (i * 37 % 100) / 50.0, (i * 61 % 100) / 50.0) for i in range(200)],
        ["point_id", "lat", "lon"],
    )
    a = {tuple(r) for r in tiling.smooth_density(pts, res=11, k=2).collect()}
    b = {tuple(r) for r in tiling.smooth_density(pts.repartition(13), res=11, k=2).collect()}
    assert a == b and len(a) > 0
