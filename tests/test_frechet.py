"""Discrete-Fréchet join semantics: Python DP replay, order sensitivity
(reverse tracks are Hausdorff-identical but Fréchet-far), max-vs-sum
contrast with DTW (one far excursion dominates Fréchet but is amortized
by DTW), threshold filtering, and the Hausdorff lower bound."""

import math

from osm_to_netex_spark.operators import trajsim

R = 6371008.8


def _hav_mm(a, b):
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return round(2 * R * math.asin(math.sqrt(h)) * 1000.0)


def _frechet_mm(A, B):
    n, m = len(A), len(B)
    dp = [[None] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = _hav_mm(A[i - 1], B[j - 1])
            if i == 1 and j == 1:
                dp[i][j] = c
            elif i == 1:
                dp[i][j] = max(c, dp[1][j - 1])
            elif j == 1:
                dp[i][j] = max(c, dp[i - 1][1])
            else:
                dp[i][j] = max(c, min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]))
    return dp[n][m]


def _trajs(spark, tracks):
    rows = [
        (tid, step, lat, lon)
        for tid, pts in tracks.items()
        for step, (lat, lon) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, "traj_id bigint, step bigint, lat double, lon double"
    )


def _run(spark, tracks, max_dist_m, n_steps):
    out = trajsim.frechet_join(
        _trajs(spark, tracks), max_dist_m=max_dist_m, n_steps=n_steps
    ).collect()
    return {(r.traj_a, r.traj_b): r.frechet_mm for r in out}


def test_matches_python_dp_and_threshold_filters(spark):
    path = [(60.0 + 0.01 * s, 10.0 + 0.005 * s) for s in range(4)]
    near = [(lat + 2e-3, lon) for lat, lon in path]       # ~220 m off, parallel
    far = [(lat + 2.0, lon) for lat, lon in path]          # ~220 km away
    tracks = {1: path, 2: near, 3: far}
    out = _run(spark, tracks, max_dist_m=5000.0, n_steps=4)
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == _frechet_mm(path, near)


def test_order_sensitivity_vs_hausdorff(spark):
    path = [(60.0 + 0.02 * s, 10.0) for s in range(4)]    # ~2.2 km steps
    rev = list(reversed(path))
    tracks = {1: path, 2: rev}
    # Hausdorff(path, rev) = 0 (same point set) but the leash must span the
    # track at the crossover: Fréchet >= full length / 2
    loose = _run(spark, tracks, max_dist_m=50000.0, n_steps=4)
    assert loose == {(1, 2): _frechet_mm(path, rev)} and loose[(1, 2)] > 2_000_000
    assert _run(spark, tracks, max_dist_m=1000.0, n_steps=4) == {}


def test_max_metric_vs_dtw_sum(spark):
    # identical tracks except ONE far excursion point: Fréchet equals that
    # excursion's distance (max), DTW pays it once in a 4-step sum — the
    # pair is DTW-near relative to budget 4x but Fréchet-far at budget 1x
    base = [(60.0 + 0.01 * s, 10.0) for s in range(4)]
    spike = list(base)
    spike[2] = (base[2][0], base[2][1] + 0.1)  # ~5.6 km east
    tracks = {1: base, 2: spike}
    f = _frechet_mm(base, spike)
    got = _run(spark, tracks, max_dist_m=f / 1000.0, n_steps=4)
    assert got == {(1, 2): f}
    assert _run(spark, tracks, max_dist_m=f / 1000.0 - 1.0, n_steps=4) == {}


def test_hausdorff_lower_bound(spark):
    # Fréchet >= Hausdorff on every pair (couplings are a subset of the
    # unconstrained matchings)
    import itertools

    tracks = {
        1: [(60.0 + 0.01 * s, 10.0 + 0.002 * s) for s in range(4)],
        2: [(60.005 + 0.012 * s, 10.001) for s in range(4)],
        3: [(60.02 - 0.01 * s, 10.01) for s in range(4)],
    }
    f = _run(spark, tracks, max_dist_m=1e9, n_steps=4)
    for a, b in itertools.combinations(sorted(tracks), 2):
        A, B = tracks[a], tracks[b]
        h = max(
            max(min(_hav_mm(x, y) for y in B) for x in A),
            max(min(_hav_mm(y, x) for x in A) for y in B),
        )
        assert f[(a, b)] >= h
