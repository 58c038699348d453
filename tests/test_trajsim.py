"""Hausdorff trajectory join: hand geometry, python replay, asymmetric
directed distances, threshold exactness."""

import math

from osm_to_netex_spark.operators import trajsim
from osm_to_netex_spark.operators.dedup import unpersist_intermediates

R_EARTH = 6371008.8


def _hav(a, b):
    (la1, lo1), (la2, lo2) = a, b
    p1, p2 = math.radians(la1), math.radians(la2)
    dp, dl = p2 - p1, math.radians(lo2 - lo1)
    h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * R_EARTH * math.asin(math.sqrt(h))


def _hausdorff(A, B):
    d_ab = max(min(_hav(a, b) for b in B) for a in A)
    d_ba = max(min(_hav(a, b) for a in A) for b in B)
    return max(d_ab, d_ba)


TRACKS = {
    1: [(0.000, 0.01 * i) for i in range(5)],          # west-east line
    2: [(0.001, 0.01 * i) for i in range(5)],          # same line, ~111 m north
    3: [(0.000, 0.01 * i) for i in range(3)],          # prefix of track 1
    4: [(0.500, 0.01 * i) for i in range(5)],          # ~55 km away
}


def _run(spark, radius, res=12):
    rows = [
        (tid, s, la, lo)
        for tid, pts in TRACKS.items()
        for s, (la, lo) in enumerate(pts)
    ]
    trajs = spark.createDataFrame(rows, ["traj_id", "step", "lat", "lon"])
    out = trajsim.hausdorff_join(trajs, radius_m=radius, res=res)
    got = {(r.traj_a, r.traj_b): r.h_m for r in out.collect()}
    unpersist_intermediates(out)
    return got


def test_hausdorff_pairs_match_python_replay(spark):
    got = _run(spark, radius=5000.0)
    want = {}
    ids = sorted(TRACKS)
    for i in ids:
        for j in ids:
            if i < j:
                h = _hausdorff(TRACKS[i], TRACKS[j])
                if h <= 5000.0:
                    want[(i, j)] = h
    assert set(got) == set(want)
    for k, h in want.items():
        assert abs(got[k] - h) < 1e-3  # same formula, python vs IEEE rounding
    # parallel tracks: H = the 0.001 deg offset
    assert abs(got[(1, 2)] - _hav((0.0, 0.0), (0.001, 0.0))) < 1e-3
    # the far track pairs with nothing at 5 km
    assert not any(4 in k for k in got)


def test_hausdorff_is_symmetric_max_of_directed(spark):
    # track 3 is a strict prefix of track 1: every point of 3 lies ON 1
    # (directed 3->1 = 0) but 1's tail is ~2.2 km from 3 — H takes the max
    got = _run(spark, radius=5000.0)
    tail = _hav((0.0, 0.04), (0.0, 0.02))
    assert abs(got[(1, 3)] - tail) < 1e-3


def test_threshold_is_exact(spark):
    # radius just below the (1,2) distance excludes the pair, just above keeps
    h12 = _hav((0.0, 0.0), (0.001, 0.0))
    assert (1, 2) in _run(spark, radius=h12 + 0.5)
    assert (1, 2) not in _run(spark, radius=h12 - 0.5)
