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


# --- lexical diversity -----------------------------------------------------
def test_lexical_diversity_hand_computed(spark):
    import math

    from osm_to_netex_spark.operators import textstats as ts

    rows = [
        (1, "a a a a"),             # single type: entropy 0, ttr 1/4
        (2, "a b c d"),             # uniform: entropy ln(4), all hapax
        (3, "a a b"),               # mixed
        (4, ""),                    # empty
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in ts.lexical_diversity(docs).collect()}

    assert (got[1].n_tokens, got[1].n_types) == (4, 1)
    assert got[1].entropy == 0.0 and got[1].ttr == 0.25 and got[1].hapax_frac == 0.0
    assert (got[2].n_tokens, got[2].n_types, got[2].hapax_frac) == (4, 4, 1.0)
    # quantized replay: 4 types, each cnt 1/n=4 → term = floor(ln(.25)·1e9)
    t = math.floor(math.log(0.25) * 1e9)
    assert got[2].entropy_q == -4 * t
    assert got[2].entropy == round(-4 * t / (4 * 1e9), 9)
    # doc 3: counts {a:2, b:1}
    s = 2 * math.floor(math.log(2 / 3) * 1e9) + 1 * math.floor(math.log(1 / 3) * 1e9)
    assert got[3].entropy_q == -s
    assert (got[4].n_tokens, got[4].entropy_q, got[4].ttr) == (0, 0, None)


def test_geodesic_area_matches_small_square(spark):
    """A 0.01°x0.01° square at the equator ≈ (0.01·111.2 km)² with the cosφ
    correction ~1; the spherical formula must land within 0.1% of that."""
    import math

    from osm_to_netex_spark.functions import geo
    from osm_to_netex_spark.functions.portable import SPARK as S

    ring = [0.0, 0.0, 0.0, 0.01, 0.01, 0.01, 0.01, 0.0, 0.0, 0.0]
    df = spark.createDataFrame([(1, ring)], ["zone_id", "pos_list"])
    r = df.selectExpr(
        f"{geo.poly_area_sph_m2('pos_list', S)} as a",
        f"{geo.poly_perimeter_m('pos_list', S)} as p",
    ).collect()[0]
    side = 0.01 * math.pi / 180.0 * 6371008.8
    assert abs(r.a - side * side) / (side * side) < 1e-3
    assert abs(r.p - 4 * side) / (4 * side) < 1e-3
