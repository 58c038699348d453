"""Exact-substring dup-span semantics: cross-doc and intra-doc duplication,
maximal-run merging, window-length gating, and partition invariance."""

from osm_to_netex_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(spark, rows, min_len=4, min_count=2):
    return dedup.dup_spans(
        _docs(spark, rows), min_len=min_len, min_count=min_count
    ).collect()


def test_cross_doc_duplicate_span_detected(spark):
    shared = "the quick brown fox jumps over lazy dogs"  # 8 tokens
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"one two three {shared} four"),
        (3, "nothing shared here at all whatsoever today folks"),
    ]
    out = _spans(spark, rows, min_len=8)
    by_doc = {r.doc_id: r for r in out}
    assert set(by_doc) == {1, 2}
    # doc 1: shared starts at token 3 (1-based), covers 8 tokens
    assert (by_doc[1].start_tok, by_doc[1].end_tok) == (3, 10)
    assert by_doc[1].n_tokens == 8 and by_doc[1].n_windows == 1
    assert (by_doc[2].start_tok, by_doc[2].end_tok) == (4, 11)


def test_intra_doc_repeat_counts_as_duplicate(spark):
    # the same 4-gram twice inside ONE doc (paper criterion: corpus-wide
    # occurrence count, not distinct-doc count)
    rows = [(1, "a b c d xx yy zz a b c d ww")]
    out = _spans(spark, rows, min_len=4)
    assert [(r.start_tok, r.end_tok) for r in sorted(out, key=lambda r: r.span_seq)] == [
        (1, 4),
        (8, 11),
    ]


def test_overlapping_windows_merge_to_maximal_run(spark):
    shared = "w1 w2 w3 w4 w5 w6"  # 6 tokens -> three 4-token windows, one run
    rows = [(1, f"pre {shared} post"), (2, f"{shared} tail end")]
    out = _spans(spark, rows, min_len=4)
    d1 = [r for r in out if r.doc_id == 1]
    assert len(d1) == 1
    assert (d1[0].start_tok, d1[0].end_tok, d1[0].n_windows) == (2, 7, 3)


def test_short_docs_and_unique_text_yield_no_spans(spark):
    rows = [(1, "too short"), (2, "totally unique words nobody else uses ever")]
    assert _spans(spark, rows, min_len=4) == []


def test_partition_invariance(spark):
    shared = "p q r s t u v w"
    rows = [(i, f"doc {i} says {shared} uniquely{i} here") for i in range(1, 9)]
    df = _docs(spark, rows)
    a = sorted(
        map(tuple, dedup.dup_spans(df, min_len=8).collect())
    )
    b = sorted(
        map(tuple, dedup.dup_spans(df.repartition(7), min_len=8).collect())
    )
    assert a == b and len(a) == 8
