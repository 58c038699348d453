"""Distributed convex hull vs pure-Python references.

Per-side flags are checked against a brute O(n^3) replay of the operator's
envelope-vertex definition; the UNION of both sides is checked against the
classic monotone-chain hull vertex set (an independent algorithm — the union
of upper/lower envelope vertices is provably the hull vertex set).
"""

import random

import pytest
from pyspark.sql import Row

from osm_to_netex_spark.operators import hull


def _chain_vertices(points):
    """Strict monotone-chain hull vertex set (independent algorithm)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return set(pts)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    return set(half(pts)) | set(half(list(reversed(pts))))


def _brute_side(points, sign):
    """Envelope vertices per the operator's definition: per-x max(sign*y)
    rep, kept iff no spanning chord of reps has it on-or-below."""
    reps = {}
    for x, y in points:
        reps[x] = max(reps.get(x, sign * y), sign * y)
    rep_pts = sorted(reps.items())
    out = set()
    for px, py in rep_pts:
        dominated = False
        for ax, ay in rep_pts:
            for bx, by in rep_pts:
                if ax < px < bx and (bx - ax) * (py - ay) - (by - ay) * (px - ax) <= 0:
                    dominated = True
        if not dominated:
            out.add((px, sign * py))
    return out


def _run(spark, points, n_buckets=8):
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in points])
    got = hull.convex_hull(df, "x", "y", n_buckets=n_buckets).collect()
    up = {(r.x, r.y) for r in got if r.on_upper}
    lo = {(r.x, r.y) for r in got if r.on_lower}
    return up, lo


@pytest.mark.parametrize("seed,n", [(1, 40), (2, 200), (3, 7)])
def test_hull_matches_references(spark, seed, n):
    rng = random.Random(seed)
    pts = [(rng.randint(-50, 50), rng.randint(-50, 50)) for _ in range(n)]
    got_up, got_lo = _run(spark, pts)
    assert got_up == _brute_side(pts, 1)
    assert got_lo == _brute_side(pts, -1)
    assert got_up | got_lo == _chain_vertices(pts)


def test_hull_degenerate_geometries(spark):
    # single point: both chains
    assert _run(spark, [(3, 4)]) == ({(3, 4)}, {(3, 4)})
    # vertical stack (all equal x): max-y on upper, min-y on lower
    up, lo = _run(spark, [(5, 1), (5, 9), (5, 4)])
    assert up == {(5, 9)} and lo == {(5, 1)}
    # collinear diagonal: strict hull keeps only the endpoints
    up, lo = _run(spark, [(0, 0), (1, 1), (2, 2), (3, 3)])
    assert up == {(0, 0), (3, 3)} and lo == {(0, 0), (3, 3)}
    # square with interior + edge-midpoint points: corners only, split by side
    sq = [(0, 0), (0, 10), (10, 0), (10, 10), (5, 5), (5, 10), (0, 5)]
    up, lo = _run(spark, sq)
    assert up == {(0, 10), (10, 10)}
    assert lo == {(0, 0), (10, 0)}


def test_hull_grouped_and_bucket_invariance(spark):
    rng = random.Random(7)
    rows = [
        Row(g=g, x=rng.randint(-30, 30), y=rng.randint(-30, 30))
        for g in (0, 1, 2)
        for _ in range(60)
    ]
    df = spark.createDataFrame(rows)
    a = sorted(
        map(tuple, hull.convex_hull(df, "x", "y", ["g"], n_buckets=4).collect())
    )
    b = sorted(
        map(tuple, hull.convex_hull(df, "x", "y", ["g"], n_buckets=64).collect())
    )
    assert a == b
    for g in (0, 1, 2):
        pts = [(r.x, r.y) for r in rows if r.g == g]
        got_up = {(x, y) for gg, x, y, u, _l in a if gg == g and u}
        assert got_up == _brute_side(pts, 1)
