"""Viterbi map-matching: smoothing beats greedy snap, genuine route changes
still switch, gap steps drop out, caches are caller-released."""

from osm_to_netex_spark.operators import mapmatch
from osm_to_netex_spark.operators.dedup import unpersist_intermediates

# two parallel horizontal polylines ~222 m apart, one segment each
LINES = [
    (10, [0.0, 0.0, 0.0, 0.1]),        # line A at lat 0
    (20, [0.002, 0.0, 0.002, 0.1]),    # line B at lat 0.002
]


def _match(spark, pts, penalty=100_000, radius=300.0):
    lines = spark.createDataFrame(LINES, ["zone_id", "pos_list"])
    points = spark.createDataFrame(pts, ["traj_id", "step", "lat", "lon"])
    out = mapmatch.map_match(
        points, lines, radius_m=radius, switch_penalty_mm=penalty, res=13
    )
    rows = out.collect()
    unpersist_intermediates(out)
    return {(r.traj_id, r.step): (r.zone_id, r.seg_idx) for r in rows}


def test_viterbi_smooths_single_noisy_fix(spark):
    # one mid-route fix is CLOSER to line B (89 m vs 133 m) but switching
    # there and back costs 2x100 m of penalty > the 44 m emission saving:
    # the optimal path stays on A.  Greedy per-point snap would pick B.
    pts = [(1, s, 0.0001, 0.01 * (s + 1)) for s in range(6)]
    pts[3] = (1, 3, 0.0012, 0.04)
    got = _match(spark, pts)
    assert len(got) == 6
    assert all(got[(1, s)] == (10, 1) for s in range(6))


def test_viterbi_switches_on_genuine_route_change(spark):
    # second half of the track hugs B (11 m) and is 211 m from A: staying
    # would cost 3x200 m of emissions > one 100 m switch penalty
    pts = [(1, s, 0.0001, 0.01 * (s + 1)) for s in range(3)]
    pts += [(1, s, 0.0019, 0.01 * (s + 1)) for s in range(3, 6)]
    got = _match(spark, pts)
    assert [got[(1, s)][0] for s in range(6)] == [10, 10, 10, 20, 20, 20]


def test_gap_step_drops_out_and_chain_connects(spark):
    # step 2 is ~1.1 km from everything (outside the 300 m radius): it is
    # unmatched; the chain still connects 1->3 and the path stays on A
    pts = [(1, s, 0.0001, 0.01 * (s + 1)) for s in range(6)]
    pts[2] = (1, 2, 0.01, 0.03)
    got = _match(spark, pts)
    assert (1, 2) not in got
    assert sorted(s for (_, s) in got) == [0, 1, 3, 4, 5]
    assert all(v == (10, 1) for v in got.values())


def test_zero_penalty_reduces_to_greedy_snap(spark):
    # with P=0 the DP decouples into per-step argmins: the noisy fix snaps
    # to its nearest line (B), everything else to A
    pts = [(1, s, 0.0001, 0.01 * (s + 1)) for s in range(6)]
    pts[3] = (1, 3, 0.0012, 0.04)
    got = _match(spark, pts, penalty=0)
    assert got[(1, 3)] == (20, 1)
    assert all(got[(1, s)] == (10, 1) for s in range(6) if s != 3)
