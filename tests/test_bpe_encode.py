"""BPE train+apply semantics: frequency-ordered merges, greedy
left-to-right within-word application, deterministic tiebreak, no-op rounds
after pairs run dry, and partition invariance."""

from osm_to_netex_spark.operators import textstats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _run(spark, texts, k, top_n=50):
    out = textstats.bpe_encode(_docs(spark, texts), k_merges=k, top_n=top_n).collect()
    return [(r.token, r.token_count) for r in out]


def test_merges_in_frequency_order_and_noop_when_dry(spark):
    texts = ["ab ab ab cd", "ab cd cd"]
    # round 1 merges (a,b) [freq 4], round 2 merges (c,d) [freq 3],
    # round 3 has no pairs left -> must be a no-op, not a NULL corpus
    assert _run(spark, texts, k=3) == [("ab", 4), ("cd", 3)]
    # with only one merge, cd stays split
    assert _run(spark, texts, k=1) == [("ab", 4), ("c", 3), ("d", 3)]


def test_greedy_left_to_right_within_word(spark):
    texts = ["aaa aaa"]
    # k=1: merge (a,a); "aaa" -> greedy left-to-right -> ["aa", "a"]
    assert _run(spark, texts, k=1) == [("a", 2), ("aa", 2)]
    # k=2: second merge (aa,a) -> whole word one token
    assert _run(spark, texts, k=2) == [("aaa", 2)]


def test_deterministic_tiebreak_on_equal_counts(spark):
    texts = ["xy zw"]
    # both pairs occur once; wrapped-pair lexicographic asc picks (x,y)
    assert _run(spark, texts, k=1) == [("w", 1), ("xy", 1), ("z", 1)]


def test_partition_invariance(spark):
    texts = [f"rep{i % 4} rep{i % 4} tail{i}" for i in range(24)]
    df = _docs(spark, texts)
    a = textstats.bpe_encode(df, k_merges=4).collect()
    b = textstats.bpe_encode(df.repartition(7), k_merges=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a
