"""Fuzzy linkage, 2-D skyline, and interval dissolve — operator-level tests
with brute-force Python oracles on adversarial inputs."""

from itertools import product

from pyspark.sql import Row, functions as F

from osm_to_netex_spark.operators import linkage, skyline, temporal


# ---------------------------------------------------------------- linkage
def test_fuzzy_match_picks_min_dist_then_name(spark):
    dirty = spark.createDataFrame(
        [Row(rec_id=1, dirty_name="red widgt"), Row(rec_id=2, dirty_name="blu ring")]
    )
    clean = spark.createDataFrame(
        [Row(name="red widget"), Row(name="red widgets"),
         Row(name="blue ring"), Row(name="blu rings")]
    )
    got = {r["rec_id"]: (r["match_name"], r["dist"])
           for r in linkage.fuzzy_match(dirty, clean).collect()}
    assert got[1] == ("red widget", 1)  # dist 1 beats "red widgets" dist 2
    # rec 2: "blu rings" and "blue ring" are both dist 1 -> lexicographic tie-break
    assert got[2] == ("blu rings", 1)


def test_fuzzy_match_drops_unmatchable(spark):
    dirty = spark.createDataFrame([Row(rec_id=1, dirty_name="zzzzzzzz")])
    clean = spark.createDataFrame([Row(name="red widget")])
    assert linkage.fuzzy_match(dirty, clean).count() == 0


def test_fuzzy_match_length_prefilter_loses_nothing(spark):
    # names spanning the length-band boundary: |len diff| == max_dist kept
    dirty = spark.createDataFrame([Row(rec_id=1, dirty_name="abcd")])
    clean = spark.createDataFrame([Row(name="abcdef"), Row(name="abcde")])
    got = linkage.fuzzy_match(dirty, clean, max_dist=2).collect()
    assert got[0]["match_name"] == "abcde" and got[0]["dist"] == 1


# ---------------------------------------------------------------- skyline
def _brute_skyline(pts):
    out = []
    for p in set(pts):
        dom = any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in set(pts)
        )
        if not dom:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force_grid(spark):
    # adversarial: duplicate pairs, same-x chains, same-y chains, 1 bucket per
    # point and many points per bucket both exercised via n_buckets=3
    pts = [(float(x), y) for x, y in product(range(6), range(5))]
    pts += [(2.0, 4), (2.0, 4), (0.0, 0)]  # dupes
    df = spark.createDataFrame([Row(x=a, y=b) for a, b in pts])
    got = sorted(
        (r["x"], r["y"]) for r in skyline.skyline2d(df, "x", "y", n_buckets=3).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_multiplicity_and_single_point(spark):
    df = spark.createDataFrame([Row(x=1.0, y=2), Row(x=1.0, y=2), Row(x=5.0, y=1)])
    rows = skyline.skyline2d(df, "x", "y").collect()
    assert [(r["x"], r["y"], r["n_rows"]) for r in rows] == [(1.0, 2, 2)]


def test_skyline_bucket_count_invariance(spark):
    pts = [(float((7 * i) % 13), (11 * i) % 9) for i in range(40)]
    df = spark.createDataFrame([Row(x=a, y=b) for a, b in pts])
    a = sorted((r["x"], r["y"]) for r in skyline.skyline2d(df, "x", "y", n_buckets=1).collect())
    b = sorted((r["x"], r["y"]) for r in skyline.skyline2d(df, "x", "y", n_buckets=64).collect())
    assert a == b == _brute_skyline(pts)


# ---------------------------------------------------------------- intervals
def test_interval_merge_islands(spark):
    # user 1: [0,100] [50,150] touch-> [150,200] all merge; [300,310] separate
    # user 2: single event
    def ev(eid, uid, us, dur_units):
        # value*100 rounds to dur_units; dur_scale_us=1 => end = start + dur
        return Row(
            event_id=eid, user_id=uid,
            ts=__import__("datetime").datetime(1970, 1, 1)
            + __import__("datetime").timedelta(microseconds=us),
            value=dur_units / 100.0,
        )

    rows = [
        ev(1, 1, 0, 100), ev(2, 1, 50, 100), ev(3, 1, 150, 50),
        ev(4, 1, 300, 10), ev(5, 2, 7, 5),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["user_id"], r["island"]): (r["start_us"], r["end_us"], r["n_events"])
        for r in temporal.interval_merge(df, dur_scale_us=1).collect()
    }
    assert got[(1, 1)] == (0, 200, 3)
    assert got[(1, 2)] == (300, 310, 1)
    assert got[(2, 1)] == (7, 12, 1)


def test_fuzzy_match_bucket_strategy_equals_broadcast(spark):
    dirty = spark.createDataFrame(
        [Row(rec_id=i, dirty_name=n) for i, n in enumerate(
            ["red widgt", "blu ring", "zzz", "abcd", "a"])]
    )
    clean = spark.createDataFrame(
        [Row(name=n) for n in
         ["red widget", "red widgets", "blue ring", "blu rings", "ab", "abc"]]
    )
    a = sorted(map(tuple, linkage.fuzzy_match(dirty, clean).collect()))
    b_df = linkage.fuzzy_match(dirty, clean, strategy="bucket")
    b = sorted(map(tuple, b_df.collect()))
    assert a == b
    # the bucket plan is a pure equi-join: no nested-loop, no broadcast of
    # the probe side
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
