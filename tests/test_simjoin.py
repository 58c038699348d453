"""Sparse tf-cosine all-pairs join vs a brute Python reference."""

import math
import random
import re
from collections import Counter

from pyspark.sql import Row

from osm_to_netex_spark.operators import simjoin


def _brute(rows, p, q):
    vecs = {}
    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        vecs[doc_id] = Counter(toks)
    out = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            dot = sum(va[t] * vb[t] for t in va.keys() & vb.keys())
            na2 = sum(v * v for v in va.values())
            nb2 = sum(v * v for v in vb.values())
            if q * q * dot * dot >= p * p * na2 * nb2 and dot > 0:
                out.add((a, b, dot))
    return out


def _run(spark, rows, p, q):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    got = simjoin.cosine_pairs(df, threshold_p=p, threshold_q=q).collect()
    return {(r.doc_a, r.doc_b, r.dot) for r in got}, got


def test_cosine_pairs_match_brute_random(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(80)
    ]
    for p, q in [(1, 2), (4, 5)]:
        got, _ = _run(spark, rows, p, q)
        assert got == _brute(rows, p, q)


def test_cosine_exact_boundary_pair_included(spark):
    # tf vectors (2,1) and (1,2): cos = 4/5 EXACTLY — integer predicate
    # keeps it; a float <= would be at the mercy of rounding
    rows = [(1, "x x y"), (2, "x y y"), (3, "z z z q")]
    got, full = _run(spark, rows, 4, 5)
    assert (1, 2, 4) in got
    assert all(r.doc_a < r.doc_b for r in full)
    cos = [r.cosine for r in full if (r.doc_a, r.doc_b) == (1, 2)][0]
    assert cos == 4 / math.sqrt(25)


def test_cosine_identical_docs_hit_one(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "a a a a a a a a b")]
    got, full = _run(spark, rows, 99, 100)
    assert (1, 2, 3) in got
    assert [r.cosine for r in full if (r.doc_a, r.doc_b) == (1, 2)] == [1.0]


def test_max_df_cap_noop_above_corpus_max(spark):
    """The standalone guardrail: a cap at/above the corpus's max document
    frequency must change NOTHING (every term survives), and an engaging cap
    equals the brute evaluation over the capped vocabulary."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(60)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    uncapped = {
        (r.doc_a, r.doc_b, r.dot)
        for r in simjoin.cosine_pairs(df, threshold_p=1, threshold_q=2).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.dot)
        for r in simjoin.cosine_pairs(
            df, threshold_p=1, threshold_q=2, max_df=len(rows)
        ).collect()
    }
    assert capped == uncapped

    # engaging cap == brute over the capped vocabulary
    max_df = 20
    tf = simjoin._tf(df, "doc_id", "text")
    df_counts = {
        r["term"]: r["df"]
        for r in tf.groupBy("term").agg(F.count("*").alias("df")).collect()
    }
    kept_vocab = {t for t, c in df_counts.items() if c <= max_df}
    capped_rows = [
        (i, " ".join(w for w in t.split() if w in kept_vocab)) for i, t in rows
    ]
    want = _brute(capped_rows, 1, 2)
    got = {
        (r.doc_a, r.doc_b, r.dot)
        for r in simjoin.cosine_pairs(
            df, threshold_p=1, threshold_q=2, max_df=max_df
        ).collect()
    }
    assert got == want and len(kept_vocab) < len(df_counts)
