"""Funnel: ordering strictness, chain breaks, and re-entry semantics."""

import datetime as dt

from osm_to_netex_spark.operators import temporal


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, event_type string")


def _t(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _us(s):
    return (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000 + s * 1_000_000


def test_funnel_semantics(spark):
    rows = [
        # u1: full ordered funnel
        (1, _t(0), "view"), (1, _t(10), "click"), (1, _t(20), "purchase"),
        # u2: purchase BEFORE view/click → chain stops after click
        (2, _t(0), "purchase"), (2, _t(5), "view"), (2, _t(9), "click"),
        # u3: click only → stage 0 (no view at all)
        (3, _t(1), "click"),
        # u4: view then click at the SAME instant → strict > breaks the chain
        (4, _t(7), "view"), (4, _t(7), "click"),
        # u5: first click before view, second click after → uses the later one
        (5, _t(3), "click"), (5, _t(6), "view"), (5, _t(8), "click"),
    ]
    out = {r.user_id: r for r in temporal.funnel(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[1].n_stages == 3 and out[1].t3 == int(_us(20))
    assert out[2].n_stages == 2 and out[2].t3 is None
    assert out[3].n_stages == 0 and out[3].t1 is None
    assert out[4].n_stages == 1
    assert out[5].n_stages == 2 and out[5].t2 == int(_us(8))


def test_partition_invariant(spark):
    rows = []
    for u in range(12):
        for j, k in enumerate(["view", "click", "view", "purchase", "click"]):
            rows.append((u, _t(u + j * (u % 3 + 1)), k))
    df = _ev(spark, rows)
    a = {tuple(r) for r in temporal.funnel(df, ["view", "click", "purchase"]).collect()}
    b = {tuple(r) for r in temporal.funnel(df.repartition(7), ["view", "click", "purchase"]).collect()}
    assert a == b
