"""Curation pipeline: constructed corpus where every stage must prune —
quality gate (gibberish doc), exact dedup (verbatim + whitespace-variant
copies), near-dup group removal (high-Jaccard variants) — and survivors get
deterministic splits."""

from osm_to_netex_spark.operators import curation, sampling


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the green forest where many other animals live quietly together"
)


def test_curation_stages_each_prune(spark):
    rows = [
        (1, BASE),
        (2, BASE),                      # verbatim dup of 1 → exact dedup
        (3, "  " + BASE.upper() + "  "),  # normalization-equal dup of 1
        (4, BASE + " the quick brown fox jumps again near the forest edge"),
        # near-dup of 1 (shares almost all shingles) → group removal
        (5, "completely different text about databases indexes and storage "
            "engines running large analytical queries over columnar files"),
        (6, "zzzzz qqqqq xxxxx #### $$$$ !!!! 00000 11111 %%%%% &&&&&"),  # low quality
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curation.curate_corpus(docs, quality_min=0.5, jaccard_threshold=0.4)
    got = {r.doc_id: r.split for r in out.collect()}
    # 2 and 3 fall to exact dedup (survivor 1); 4 falls to near-dup grouping
    # with 1 as representative; 6 fails quality; 1 and 5 survive
    assert set(got) == {1, 5}
    valid = {name for name, _ in sampling.DEFAULT_SPLITS}
    assert all(s in valid for s in got.values())


def test_curation_split_is_deterministic(spark):
    docs = spark.createDataFrame([(i, BASE + f" tail {i}") for i in range(20)], ["doc_id", "text"])
    a = {(r.doc_id, r.split) for r in curation.curate_corpus(docs, quality_min=0.0, jaccard_threshold=0.99).collect()}
    b = {(r.doc_id, r.split) for r in curation.curate_corpus(docs.repartition(7), quality_min=0.0, jaccard_threshold=0.99).collect()}
    assert a == b and len(a) > 0
