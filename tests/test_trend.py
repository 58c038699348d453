"""OLS trend fit: exact line recovery, degenerate groups, invariance."""

import datetime as dt

import pytest

from osm_to_netex_spark.operators import temporal


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, value double")


def _t(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_exact_line_recovered(spark):
    # y = 0.5 * x + 10 with x in seconds → slope 0.5/s, intercept 10 at min ts
    rows = [(1, _t(x), 10.0 + 0.5 * x) for x in (0, 10, 20, 30)]
    # constant group → slope 0
    rows += [(2, _t(x), 7.25) for x in (0, 60, 120)]
    # n=1 → null fit
    rows += [(3, _t(5), 1.0)]
    # zero time variance (two events same second) → null fit
    rows += [(4, _t(9), 1.0), (4, _t(9), 2.0)]
    got = {r.user_id: r for r in temporal.trend_fit(_ev(spark, rows)).collect()}
    assert got[1].slope == pytest.approx(0.5) and got[1].intercept == pytest.approx(10.0)
    assert got[2].slope == 0.0 and got[2].intercept == pytest.approx(7.25)
    assert got[3].slope is None and got[3].intercept is None
    assert got[4].slope is None and got[4].intercept is None
    assert got[1].n == 4 and got[3].n == 1


def test_partition_invariant(spark):
    rows = [(u, _t(x * 7 + u), float((x * u) % 50) + 0.25) for u in range(1, 8) for x in range(20)]
    df = _ev(spark, rows)
    a = {tuple(r) for r in temporal.trend_fit(df).collect()}
    b = {tuple(r) for r in temporal.trend_fit(df.repartition(9)).collect()}
    assert a == b
