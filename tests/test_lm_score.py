"""n-gram LM perplexity scorer: hand-computed log-probs on a micro corpus,
in-domain vs garbled ordering, short-doc nulls."""

import math

from osm_to_netex_spark.functions.portable import SPARK
from osm_to_netex_spark.operators import classify

Q = 1_000_000_000


def _run(spark, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).createOrReplaceTempView(
        "documents"
    )
    try:
        out = spark.sql(classify.ngram_lm_sql(SPARK))
        return {r.doc_id: r for r in out.collect()}
    finally:
        spark.catalog.dropTempView("documents")
        spark._graft_geo_views = None  # force view re-registration downstream


def test_hand_computed_microcorpus(spark):
    # train = doc 0 ("aaaa": trigram "aaa" twice, char vocab {a}, V=1)
    # held-out docs 8, 9, 18 (doc_id % 10 >= 8)
    got = _run(
        spark,
        [
            (0, "aaaa"),
            (8, "aaa"),   # seen event: P(a|aa) = (2+1)/(2+1) = 1 → logp 0
            (9, "aab"),   # seen ctx, unseen char: P = 1/(2+1)
            (18, "xy"),   # too short for one trigram
        ],
    )
    assert (got[8].n_grams, got[8].logp_q, got[8].avg_logp) == (1, 0, 0.0)
    lp_unseen = math.floor(math.log(1.0 / 3.0) * Q)
    assert (got[9].n_grams, got[9].logp_q) == (1, lp_unseen)
    assert got[9].avg_logp == round(lp_unseen / float(Q), 9)
    assert (got[18].n_grams, got[18].logp_q, got[18].avg_logp) == (0, 0, None)


def test_in_domain_scores_above_garbled(spark):
    # train: repetitive english-ish text; held-out: one in-domain doc, one
    # keyboard-mash doc — the LM gate must rank the in-domain doc higher
    train = [(i, "the cat sat on the mat and the cat ran") for i in range(8)]
    held = [(8, "the cat sat on the mat"), (9, "qzx jvw kpf bgd zzq")]
    got = _run(spark, train + held)
    assert got[8].avg_logp > got[9].avg_logp


def test_scores_partition_invariant(spark):
    rows = [(i, f"the quick brown fox {i % 3} jumps over") for i in range(40)]
    a = _run(spark, rows)
    spark.createDataFrame(rows, ["doc_id", "text"]).repartition(
        11
    ).createOrReplaceTempView("documents")
    try:
        b = {r.doc_id: r for r in spark.sql(classify.ngram_lm_sql(SPARK)).collect()}
    finally:
        spark.catalog.dropTempView("documents")
        spark._graft_geo_views = None
    assert {k: tuple(v) for k, v in a.items()} == {k: tuple(v) for k, v in b.items()}
