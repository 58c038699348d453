"""Round-5 batch V vs exact Python replay (LANDING.md step 5):
activity streaks (gaps and islands).
"""

import datetime
from collections import defaultdict

import pyarrow.parquet as pq

from osm_to_netex_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.datetime(1970, 1, 1)


def test_user_streaks_match_python_replay(spark):
    got = {
        r["user_id"]: (
            r["n_streaks"], r["longest_streak"], r["current_streak"]
        )
        for r in Q.QUERIES["user_streaks"][0](spark, SF).collect()
    }
    ev = pq.read_table(f"{SF}/events.parquet").to_pylist()
    days = defaultdict(set)
    for e in ev:
        us = (e["ts"] - _EPOCH) // datetime.timedelta(microseconds=1)
        days[e["user_id"]].add(us // 86400000000)
    want = {}
    for uid, ds in days.items():
        sorted_days = sorted(ds)
        runs = []
        start = prev = sorted_days[0]
        for day in sorted_days[1:]:
            if day == prev + 1:
                prev = day
                continue
            runs.append((start, prev))
            start = prev = day
        runs.append((start, prev))
        lens = [b - a + 1 for a, b in runs]
        current = lens[-1]  # the island holding the last active day
        want[uid] = (len(runs), max(lens), current)
    assert got == want
    # the identity every gaps-and-islands derivation must satisfy:
    # islands partition the active days
    for uid, ds in days.items():
        n_runs = want[uid][0]
        gaps = sum(
            1
            for a, b in zip(sorted(ds), sorted(ds)[1:])
            if b - a > 1
        )
        assert n_runs == gaps + 1
