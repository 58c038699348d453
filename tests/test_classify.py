"""Naive Bayes lang-ID: learns separable char distributions; deterministic.

(The sf* synthetic corpus's `lang` column is label noise — every doc draws
from one shared vocabulary — so classifier QUALITY is tested here on a
corpus whose classes genuinely differ; exactness vs DuckDB is gated by the
`nb_langid` oracle entry.)
"""

import random

from osm_to_netex_spark.operators import classify


def _mkdocs(spark, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")


def _gen(rng, words, n_words):
    return " ".join(rng.choice(words) for _ in range(n_words))


VOCAB = {
    "aa": ["kato", "kiki", "tuka", "okat"],
    "zz": ["zerz", "zzor", "rozz", "zrez"],
    "mm": ["mime", "memo", "immo", "omni"],
}


def test_nb_langid_learns_separable_classes(spark):
    rng = random.Random(3)
    rows = []
    for i in range(300):
        lang = ["aa", "zz", "mm"][i % 3]
        rows.append((i, _gen(rng, VOCAB[lang], 30), lang, "s", 0))
    _mkdocs(spark, rows)
    got = spark.sql(classify.nb_langid_sql("spark")).collect()
    held = [r for r in rows if r[0] % 10 >= 8]
    assert len(got) == len(held) > 0
    assert all(r.correct for r in got)
    spark.catalog.dropTempView("documents")
    spark._graft_geo_views = None


def test_nb_langid_partition_invariant_and_short_docs_drop(spark):
    rng = random.Random(4)
    rows = [
        (i, _gen(rng, VOCAB[["aa", "zz", "mm"][i % 3]], 12), ["aa", "zz", "mm"][i % 3], "s", 0)
        for i in range(120)
    ]
    rows.append((998, "xy", "aa", "s", 0))  # shorter than a trigram: drops
    rows.append((999, "qqqq wwww", "zz", "s", 0))  # all grams OOV: drops
    _mkdocs(spark, rows)
    a = sorted(map(tuple, spark.sql(classify.nb_langid_sql("spark")).collect()))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(13)
    df.createOrReplaceTempView("documents")
    b = sorted(map(tuple, spark.sql(classify.nb_langid_sql("spark")).collect()))
    assert a == b
    ids = {t[0] for t in a}
    assert 998 not in ids and 999 not in ids
    spark.catalog.dropTempView("documents")
    spark._graft_geo_views = None
