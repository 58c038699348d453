"""Gap fill: hand-computed interpolation, edge buckets, invariance."""

import datetime as dt

import pytest

from osm_to_netex_spark.operators import temporal


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, value double")


def _h(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_linear_interpolation(spark):
    rows = [
        (1, _h(0), 10.0),
        (1, _h(0), 20.0),   # same bucket → mean 15
        (1, _h(3), 45.0),   # gap of 2 buckets → 25, 35
        (2, _h(5), 7.0),    # single observation → single bucket, no fill
    ]
    out = temporal.gap_fill(_ev(spark, rows), bucket_s=3600).collect()
    u1 = sorted([(r.bucket, r.value, r.filled) for r in out if r.user_id == 1])
    b0 = u1[0][0]
    assert [(b - b0, v, f) for b, v, f in u1] == [
        (0, pytest.approx(15.0), False),
        (1, pytest.approx(25.0), True),
        (2, pytest.approx(35.0), True),
        (3, pytest.approx(45.0), False),
    ]
    u2 = [(r.value, r.filled) for r in out if r.user_id == 2]
    assert u2 == [(pytest.approx(7.0), False)]


def test_partition_invariant(spark):
    rows = [(u, _h(u * j % 11), float((u * j) % 40) + 0.5)
            for u in range(1, 7) for j in range(8)]
    df = _ev(spark, rows)
    a = {tuple(r) for r in temporal.gap_fill(df).collect()}
    b = {tuple(r) for r in temporal.gap_fill(df.repartition(9)).collect()}
    assert a == b
