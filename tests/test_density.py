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


# --- Getis-Ord Gi* ------------------------------------------------------------
def test_gistar_flags_the_hotspot(spark):
    """A dense cluster inside a sparse field: the cluster cells carry the
    max z-scores; a hand replay of the statistic matches exactly."""
    import math

    rows = []
    # sparse field: one point per cell on a spread grid
    for i in range(30):
        rows.append((i, (i % 6) / 10.0 + 0.005, (i // 6) / 10.0 + 0.005))
    # hotspot: 40 extra points in one field cell
    rows += [(100 + j, 0.205, 0.205) for j in range(40)]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lon"])
    out = {(r.cell_x, r.cell_y): r for r in tiling.hotspot_gistar(pts, res=10).collect()}
    top = max(out.values(), key=lambda r: (r.gi_z is not None, r.gi_z))
    assert top.wi >= 41  # the hot cell's neighbourhood holds the cluster

    # python replay over the occupied-cell table
    import collections
    cells = collections.Counter()
    for _pid, la, lo in rows:
        n = 2 ** 10
        cx = min(max(int(math.floor((lo + 180.0) / 360.0 * n)), 0), n - 1)
        cy = min(max(int(math.floor((la + 90.0) / 180.0 * n)), 0), n - 1)
        cells[(cx, cy)] += 1
    nn = len(cells)
    sx = sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    xbar = sx / nn
    s = math.sqrt(max(sxx / nn - xbar * xbar, 0.0))
    for (cx, cy), r in out.items():
        neigh = [
            cells[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (cx + dx, cy + dy) in cells
        ]
        wi, ni = sum(neigh), len(neigh)
        assert (r.wi, r.ni) == (wi, ni)
        denom = s * math.sqrt((nn * ni - ni * ni) / (nn - 1.0))
        if denom == 0:
            assert r.gi_z is None
        else:
            assert r.gi_z == pytest.approx(round((wi - xbar * ni) / denom, 9), abs=1e-9)


def test_gistar_degenerate_uniform_field_is_null(spark):
    # all-equal counts → zero variance → null z everywhere, never nan
    pts = spark.createDataFrame(
        [(i, (i % 4) / 10.0 + 0.005, (i // 4) / 10.0 + 0.005) for i in range(16)],
        ["point_id", "lat", "lon"],
    )
    out = tiling.hotspot_gistar(pts, res=12).collect()
    assert len(out) == 16
    assert all(r.gi_z is None for r in out)


# --- Local Moran's I ----------------------------------------------------------
def test_moran_quadrants_and_replay(spark):
    """A dense cluster inside a sparse field: cluster cells label HH, the
    lone spike in a sparse ring labels HL; exact python replay matches."""
    sl_la, sl_lo = 180.0 / 1024, 360.0 / 1024  # res-10 cell size

    def at(cx, cy):  # cell-center coordinates for cell indices
        return ((524 + cy + 0.5) * sl_la - 90.0, (524 + cx + 0.5) * sl_lo - 180.0)

    rows = []
    # sparse 8x5 field: one point per cell
    for i in range(40):
        la, lo = at(i % 8, i // 8)
        rows.append((i, la, lo))
    # a 2x2 block of dense cells (20 extra points each)
    for bx in (2, 3):
        for by in (2, 3):
            la, lo = at(bx, by)
            rows += [(1000 + len(rows) + j, la, lo) for j in range(20)]
    # an isolated spike inside the sparse field, away from the block
    la, lo = at(6, 2)
    rows += [(5000 + j, la, lo) for j in range(25)]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lon"])
    out = {(r.cell_x, r.cell_y): r for r in tiling.moran_local(pts, res=10).collect()}

    import collections
    cells = collections.Counter()
    for _pid, la, lo in rows:
        cx = int((lo + 180.0) / 360.0 * 1024)
        cy = int((la + 90.0) / 180.0 * 1024)
        cells[(cx, cy)] += 1
    n, sx = len(cells), sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    denom = n * sxx - sx * sx
    for (cx, cy), cnt in cells.items():
        ws = [cells[(cx + dx, cy + dy)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in cells]
        zi_n = n * cnt - sx
        lag_n = n * sum(ws) - len(ws) * sx
        r = out[(cx, cy)]
        assert (r.zi_n, r.lag_n) == (zi_n, lag_n)
        assert r.moran_i == round(float(zi_n) * float(lag_n) / float(denom), 9)
    # dense block: above-mean cells with above-mean neighbours → HH
    hh = [k for k, r in out.items() if r.quadrant == "HH"]
    assert len(hh) >= 4
    # the spike is above the mean but its ring is below it → HL outlier
    hl = [r for r in out.values() if r.quadrant == "HL"]
    assert any(r.zi_n == max(v.zi_n for v in out.values()) for r in hl)


def test_moran_uniform_field_is_null(spark):
    # every occupied cell has the same count → zero variance → I null, 'NS'
    sl_la, sl_lo = 180.0 / 1024, 360.0 / 1024
    pts = spark.createDataFrame(
        [(i, (524 + i // 4 + 0.5) * sl_la - 90.0, (524 + i % 4 + 0.5) * sl_lo - 180.0)
         for i in range(16)],
        ["point_id", "lat", "lon"],
    )
    out = tiling.moran_local(pts, res=10).collect()
    assert len(out) == 16
    assert all(r.moran_i is None and r.quadrant == "NS" for r in out)


def test_moran_isolated_cell_is_ns(spark):
    # two far-apart cells with different mass: no occupied neighbours →
    # lag_n = 0 → 'NS' for both, I = 0
    sl_la, sl_lo = 180.0 / 1024, 360.0 / 1024
    far_a = ((524 + 0.5) * sl_la - 90.0, (524 + 0.5) * sl_lo - 180.0)
    far_b = ((544 + 0.5) * sl_la - 90.0, (544 + 0.5) * sl_lo - 180.0)
    pts = spark.createDataFrame(
        [(0, *far_a)] + [(1 + j, *far_b) for j in range(5)],
        ["point_id", "lat", "lon"],
    )
    out = tiling.moran_local(pts, res=10).collect()
    assert len(out) == 2
    assert all(r.lag_n == 0 and r.quadrant == "NS" and r.moran_i == 0.0 for r in out)


# --- Mann-Kendall trend --------------------------------------------------------
def test_mk_strict_monotone_series(spark):
    # strictly increasing counts 1..8 across buckets → S = 28 (max), z > 1.96
    sl_la, sl_lo = 180.0 / 1024, 360.0 / 1024
    la, lo = (524 + 0.5) * sl_la - 90.0, (524 + 0.5) * sl_lo - 180.0
    rows = []
    for b in range(8):
        rows += [(len(rows) + j, la, lo, b) for j in range(b + 1)]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lon", "bucket"])
    out = tiling.mk_trend(pts, n_buckets=8, res=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.s_stat == 28 and r.trend == "increasing"
    # no ties: var18 = 8*7*21 = 1176; z = 27/sqrt(1176/18)
    assert r.var18 == 1176
    import math
    assert r.mk_z == round(27.0 / math.sqrt(1176.0 / 18.0), 9)


def test_mk_decreasing_and_missing_buckets_count_zero(spark):
    # occupied only in early buckets; densified zeros make the tail a tie
    # block but the series still tests decreasing
    sl_la, sl_lo = 180.0 / 1024, 360.0 / 1024
    la, lo = (530 + 0.5) * sl_la - 90.0, (530 + 0.5) * sl_lo - 180.0
    rows = []
    for b, n in ((0, 9), (1, 6), (2, 3), (3, 1)):  # buckets 4..7 absent -> 0
        rows += [(len(rows) + j, la, lo, b) for j in range(n)]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lon", "bucket"])
    r = tiling.mk_trend(pts, n_buckets=8, res=10).collect()[0]
    # python replay
    xs = [9, 6, 3, 1, 0, 0, 0, 0]
    s = sum((xs[j] > xs[i]) - (xs[j] < xs[i]) for i in range(8) for j in range(i + 1, 8))
    assert r.s_stat == s and s < 0
    from collections import Counter
    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
    assert r.var18 == 8 * 7 * 21 - tie
    assert r.trend == "decreasing"


def test_mk_constant_series_is_none(spark):
    # same count every bucket → all ties → var18 = 0 → z null, trend none
    sl_la, sl_lo = 180.0 / 1024, 360.0 / 1024
    la, lo = (540 + 0.5) * sl_la - 90.0, (540 + 0.5) * sl_lo - 180.0
    rows = [(b * 2 + j, la, lo, b) for b in range(8) for j in range(2)]
    pts = spark.createDataFrame(rows, ["point_id", "lat", "lon", "bucket"])
    r = tiling.mk_trend(pts, n_buckets=8, res=10).collect()[0]
    assert r.s_stat == 0 and r.var18 == 0
    assert r.mk_z is None and r.trend == "none"


# --- Ripley's K ----------------------------------------------------------------
def test_ripley_clustered_vs_dispersed(spark):
    """A tight cluster shows L(r) >> r at small radii; a regular grid of the
    same size shows L(r) < r there.  Pair counts replayed exactly."""
    import math

    # 20 points inside a ~60 m blob
    cl = [(i, 0.0002 * (i % 5), 0.0002 * (i // 5)) for i in range(20)]
    # 20 points on a ~1.1 km-spaced grid
    gr = [(i, 0.01 * (i % 5), 0.01 * (i // 5)) for i in range(20)]
    radii = [200.0, 500.0]

    def run(rows):
        pts = spark.createDataFrame(rows, ["point_id", "lat", "lon"])
        return {r.r_m: r for r in tiling.ripley_k(pts, radii, res=13).collect()}

    c, g = run(cl), run(gr)
    # every ordered pair of the blob is within 500 m -> n_pairs = 20*19
    assert c[500.0].n_pairs == 380 and c[200.0].n_pairs > 0
    # grid spacing ~1.1 km -> no pairs inside 500 m
    assert g[500.0].n_pairs == 0 and g[200.0].n_pairs == 0
    assert c[500.0].l_hat > g[500.0].l_hat == 0.0

    # exact replay of K for the blob at 500 m: A * pairs / (n(n-1))
    la = [r[1] for r in cl]; lo = [r[2] for r in cl]
    m = 6371008.8 * math.pi / 180.0
    area = ((max(la) - min(la)) * m) * (
        (max(lo) - min(lo)) * m * math.cos(math.radians((min(la) + max(la)) / 2.0))
    )
    k = area * 380.0 / (20.0 * 19.0)
    assert c[500.0].k_hat == round(k, 6)
    assert c[500.0].l_hat == round(math.sqrt(k / math.pi), 6)
