"""Ring validity + repair: bow-tie self-cross, open/dup/cw rings, repair
idempotence and CCW normalization."""

from osm_to_netex_spark.operators import validity

# closed CCW unit square
SQUARE = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]
# bow-tie: edges (0,0)->(1,1) and (1,0)->(0,1) properly cross
BOWTIE = [0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
CW_SQUARE = [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0]
OPEN_RING = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0]
DUP_RING = [0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0]


def _audit(spark, rings):
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rings)], ["zone_id", "pos_list"]
    )
    return {r.zone_id: r for r in validity.ring_validity(df).collect()}


def test_validity_cases(spark):
    got = _audit(spark, [SQUARE, BOWTIE, CW_SQUARE, OPEN_RING, DUP_RING])
    ok = got[0]
    assert ok.is_valid and ok.orientation == "ccw" and ok.n_self_cross == 0
    bt = got[1]
    assert bt.n_self_cross == 1 and not bt.is_valid
    cw = got[2]
    assert cw.orientation == "cw" and not cw.is_valid
    op = got[3]
    assert not op.is_closed and not op.is_valid
    dp = got[4]
    assert dp.n_dup_vertices == 1 and not dp.is_valid


def test_repair_fixes_everything_reparable(spark):
    rings = [SQUARE, CW_SQUARE, OPEN_RING, DUP_RING]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rings)], ["zone_id", "pos_list"]
    )
    fixed = validity.repair_rings(df)
    audit = {r.zone_id: r for r in validity.ring_validity(fixed).collect()}
    assert all(a.is_valid and a.orientation == "ccw" for a in audit.values())
    # already-valid ring is untouched
    out = {r.zone_id: r.pos_list for r in fixed.collect()}
    assert out[0] == SQUARE
    # cw square got reversed, not mangled: same vertex set, ccw order
    assert sorted(out[1]) == sorted(CW_SQUARE)
    # open ring got closed (one more vertex pair)
    assert len(out[2]) == len(OPEN_RING) + 2
    # dup collapsed
    assert len(out[3]) == len(DUP_RING) - 2


def test_repair_is_idempotent(spark):
    rings = [SQUARE, CW_SQUARE, OPEN_RING, DUP_RING]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rings)], ["zone_id", "pos_list"]
    )
    once = validity.repair_rings(df)
    twice = validity.repair_rings(once)
    a = {r.zone_id: r.pos_list for r in once.collect()}
    b = {r.zone_id: r.pos_list for r in twice.collect()}
    assert a == b
