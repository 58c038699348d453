"""DTW similarity-join semantics: Python DP replay, order sensitivity
(reverse tracks are Hausdorff-identical but DTW-far), warp invariance
(dwell-stretched tracks align at zero cost), threshold filtering, and
partition invariance."""

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


def _dtw_mm(A, B):
    n, m = len(A), len(B)
    dp = [[None] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = _hav_mm(A[i - 1], B[j - 1])
            if i == 1 and j == 1:
                dp[i][j] = c
            elif i == 1:
                dp[i][j] = c + dp[1][j - 1]
            elif j == 1:
                dp[i][j] = c + dp[i - 1][1]
            else:
                dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
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


def _run(spark, tracks, max_cost_m, n_steps):
    out = trajsim.dtw_join(
        _trajs(spark, tracks), max_cost_m=max_cost_m, n_steps=n_steps
    ).collect()
    return {(r.traj_a, r.traj_b): r.dtw_mm for r in out}


def test_matches_python_dp_and_threshold_filters(spark):
    path = [(60.0 + 0.01 * s, 10.0 + 0.005 * s) for s in range(4)]
    near = [(lat + 2e-3, lon) for lat, lon in path]       # ~220 m off, parallel
    far = [(lat + 2.0, lon) for lat, lon in path]          # ~220 km away
    tracks = {1: path, 2: near, 3: far}
    out = _run(spark, tracks, max_cost_m=5000.0, n_steps=4)
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == _dtw_mm(path, near)


def test_order_sensitivity_vs_hausdorff(spark):
    path = [(60.0 + 0.02 * s, 10.0) for s in range(4)]    # ~2.2 km steps
    rev = list(reversed(path))
    tracks = {1: path, 2: rev}
    # Hausdorff(path, rev) = 0 (same point set) but DTW is far: with a
    # generous budget the pair appears, with a tight one it doesn't
    loose = _run(spark, tracks, max_cost_m=50000.0, n_steps=4)
    assert loose == {(1, 2): _dtw_mm(path, rev)} and loose[(1, 2)] > 5_000_000
    assert _run(spark, tracks, max_cost_m=5000.0, n_steps=4) == {}


def test_warp_invariance_zero_cost_alignment(spark):
    p1, p2, p3 = (60.0, 10.0), (60.01, 10.0), (60.02, 10.0)
    tracks = {1: [p1, p2, p3, p3], 2: [p1, p1, p2, p3]}
    out = _run(spark, tracks, max_cost_m=1000.0, n_steps=4)
    assert out == {(1, 2): 0}


def test_partition_invariance(spark):
    tracks = {
        t: [(60.0 + 0.01 * s + 1e-3 * (t % 3), 10.0 + 0.01 * s) for s in range(4)]
        for t in range(1, 13)
    }
    df = _trajs(spark, tracks)
    a = sorted(map(tuple, trajsim.dtw_join(df, 20000.0, 4).collect()))
    b = sorted(map(tuple, trajsim.dtw_join(df.repartition(7), 20000.0, 4).collect()))
    assert a == b and a
