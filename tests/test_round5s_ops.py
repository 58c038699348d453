"""Round-5 batch S vs exact Python replays (LANDING.md step 5):
median polish, forecast backtest.
"""

import datetime
import math
from collections import defaultdict

import pyarrow.parquet as pq

from osm_to_netex_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.datetime(1970, 1, 1)


def _us(ts):
    return (ts - _EPOCH) // datetime.timedelta(microseconds=1)


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_median_polish_matches_python_replay(spark):
    got = {
        (r["dow"], r["hr"]): (
            r["v_q3"], r["row_eff_q3"], r["col_eff_q3"], r["residual_q3"]
        )
        for r in Q.QUERIES["median_polish"][0](spark, SF).collect()
    }
    ev = pq.read_table(f"{SF}/events.parquet").to_pylist()
    agg = defaultdict(lambda: [0, 0])
    for e in ev:
        us = _us(e["ts"])
        key = (((us // 86400000000) + 4) % 7, (us // 3600000000) % 24)
        agg[key][0] += math.floor(e["value"] * 1.0e6 + 0.5)
        agg[key][1] += 1
    cells = {k: (s // n) // 1000 for k, (s, n) in agg.items()}
    r1 = {
        dw: _lower_median([v for (d2, _), v in cells.items() if d2 == dw])
        for dw in {k[0] for k in cells}
    }
    v1 = {k: v - r1[k[0]] for k, v in cells.items()}
    c1 = {
        h: _lower_median([v for (_, h2), v in v1.items() if h2 == h])
        for h in {k[1] for k in v1}
    }
    v2 = {k: v - c1[k[1]] for k, v in v1.items()}
    r2 = {
        dw: _lower_median([v for (d2, _), v in v2.items() if d2 == dw])
        for dw in {k[0] for k in v2}
    }
    v3 = {k: v - r2[k[0]] for k, v in v2.items()}
    c2 = {
        h: _lower_median([v for (_, h2), v in v3.items() if h2 == h])
        for h in {k[1] for k in v3}
    }
    want = {
        k: (
            cells[k], r1[k[0]] + r2[k[0]], c1[k[1]] + c2[k[1]],
            v3[k] - c2[k[1]],
        )
        for k in cells
    }
    assert got == want
    # the polish identity: value = grand(0 here) + row + col + residual
    for k, (v, re, ce, res) in want.items():
        assert v == re + ce + res


def test_forecast_backtest_matches_python_replay(spark):
    got = {
        r["event_type"]: (
            r["n_eval_days"], r["ae_naive"], r["ae_seasonal"],
            r["seasonal_wins"],
        )
        for r in Q.QUERIES["forecast_backtest"][0](spark, SF).collect()
    }
    ev = pq.read_table(f"{SF}/events.parquet").to_pylist()
    daily = defaultdict(int)
    for e in ev:
        daily[(e["event_type"], _us(e["ts"]) // 86400000000)] += 1
    want = {}
    by_type = defaultdict(dict)
    for (et, day), y in daily.items():
        by_type[et][day] = y
    for et, days in by_type.items():
        an = as_ = n = 0
        for day, y in days.items():
            if day - 1 in days and day - 7 in days:
                n += 1
                an += abs(y - days[day - 1])
                as_ += abs(y - days[day - 7])
        win = 1 if as_ < an else (-1 if as_ > an else 0)
        want[et] = (n, an, as_, win)
    assert got == want
    assert all(v[0] > 0 for v in want.values())  # eval window non-empty
