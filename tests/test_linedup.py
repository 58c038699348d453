"""Cross-document line dedup: boilerplate stripped everywhere, order kept,
blank-line policy, all-removed docs, whitespace-normalized matching."""

from osm_to_netex_spark.operators import textstats

BOILER = "subscribe to our newsletter"
FOOTER = "all rights reserved"


def test_line_dedup_cases(spark):
    rows = [
        (1, f"unique alpha line\n{BOILER}\nmore alpha text\n{FOOTER}"),
        (2, f"{BOILER}\nbeta only content\n{FOOTER}"),
        (3, f"gamma body one\n\ngamma body two\n  {BOILER}  "),
        (4, f"{BOILER}\n{FOOTER}"),  # nothing survives
        (5, "delta standalone"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in textstats.line_dedup(docs, min_docs=3).collect()}

    # BOILER occurs in 4 distinct docs (>=3) -> stripped everywhere, even
    # when padded with whitespace (trim-normalized match keeps the original
    # padded line out); FOOTER occurs in 3 -> also stripped
    assert got[1].clean_text == "unique alpha line\nmore alpha text"
    assert got[1].n_lines == 4 and got[1].n_removed == 2
    assert got[2].clean_text == "beta only content"
    # blank line is never boilerplate and survives in place
    assert got[3].clean_text == "gamma body one\n\ngamma body two"
    assert got[3].n_removed == 1
    # a doc made entirely of boilerplate collapses to empty, still present
    assert got[4].clean_text == "" and got[4].n_removed == 2
    assert got[5].clean_text == "delta standalone" and got[5].n_removed == 0


def test_line_dedup_threshold_not_met(spark):
    rows = [(1, "shared once\nbody a"), (2, "shared once\nbody b")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in textstats.line_dedup(docs, min_docs=3).collect()}
    assert got[1].clean_text == rows[0][1]  # 2 < 3 docs: nothing removed
    assert got[2].n_removed == 0


def test_line_dedup_counts_distinct_docs_not_occurrences(spark):
    # 3 occurrences inside ONE doc must not trip a min_docs=2 threshold
    rows = [(1, "rep\nrep\nrep\nkeep me"), (2, "other text")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in textstats.line_dedup(docs, min_docs=2).collect()}
    assert got[1].n_removed == 0 and got[1].clean_text == rows[0][1]
