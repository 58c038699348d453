"""Repetition quality filters: hand-computed fractions on constructed docs."""

import pytest

from osm_to_netex_spark.operators import textstats


def test_repetition_known_values(spark):
    rows = [
        # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → 5 total, 2 distinct
        (1, "a b a b a b"),
        # all 2-grams unique
        (2, "one two three four five"),
        # single word → no 2-grams
        (3, "solo"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in textstats.repetition_stats(docs, n=2).collect()}

    r1 = got[1]
    assert (r1.n_grams, r1.n_distinct, r1.top_cnt) == (5, 2, 3)
    assert r1.dup_frac == pytest.approx(3 / 5)
    # top gram "a b" (3 chars) occurs 3x over 11 chars of text
    assert r1.top_char_frac == pytest.approx(9 / 11)

    r2 = got[2]
    assert r2.dup_frac == 0.0 and r2.n_grams == 4 and r2.n_distinct == 4

    r3 = got[3]
    assert (r3.n_grams, r3.dup_frac, r3.top_char_frac) == (0, 0.0, 0.0)


def test_repetition_partition_invariant(spark):
    rows = [(i, ("spam ham " * (i % 4 + 1)) + f"tail {i}") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {tuple(r) for r in textstats.repetition_stats(docs).collect()}
    b = {tuple(r) for r in textstats.repetition_stats(docs.repartition(7)).collect()}
    assert a == b
