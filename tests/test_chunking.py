"""Chunk packing: span-sequence invariant, budget behavior, atomic media."""

from pyspark.sql import functions as F

from osm_to_netex_spark.operators import chunking

SPAN_T = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _corpus(spark, rows):
    return spark.createDataFrame(rows, f"doc_id string, spans {SPAN_T}")


def test_budget_and_atomicity(spark):
    spans = [
        ("text", "a b c d", None, 0),        # 4 tokens → chunk 0 (prefix 0)
        ("media", None, "media://x", 1),     # cost 3 → chunk 0 (prefix 4)
        ("text", "e f", None, 2),            # prefix 7 → chunk 1 (budget 6)
        ("text", "g h i j k l m", None, 3),  # prefix 9 → chunk 1
    ]
    out = chunking.chunk_documents(
        _corpus(spark, [("d1", spans)]), token_budget=6, media_token_cost=3
    ).orderBy("span_idx").collect()
    assert [r.chunk_id for r in out] == [0, 0, 1, 1]
    assert [r.n_tokens for r in out] == [4, 3, 2, 7]
    # media span intact in exactly one chunk
    media_rows = [r for r in out if r.kind == "media"]
    assert len(media_rows) == 1 and media_rows[0].media_ref == "media://x"


def test_span_sequence_invariant(spark):
    # north-rule invariant: chunks concatenated in (chunk_id, span_idx) order
    # reproduce the original (kind, text, media_ref, order) sequence
    rows = []
    for d in range(20):
        spans = []
        for j in range(1 + d % 7):
            if j % 3 == 2:
                spans.append(("media", None, f"media://m/{d}/{j}", j))
            else:
                spans.append(("text", " ".join(f"w{d}_{j}_{t}" for t in range(j + 1)), None, j))
        rows.append((f"doc{d}", spans))
    corpus = _corpus(spark, rows)
    out = chunking.chunk_documents(corpus, token_budget=3)
    rebuilt = {
        r.doc_id: [(s.kind, s.text, s.media_ref) for s in r.seq]
        for r in out.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("chunk_id", "span_idx", "kind", "text", "media_ref"))).alias("o"))
        .selectExpr("doc_id", "transform(o, x -> struct(x.kind as kind, x.text as text, x.media_ref as media_ref)) as seq")
        .collect()
    }
    orig = {
        r.doc_id: [(s.kind, s.text, s.media_ref) for s in r.spans]
        for r in corpus.collect()
    }
    assert rebuilt == orig


def test_partition_invariant(spark):
    rows = [(f"doc{d}", [("text", " ".join(["w"] * (1 + (d * j) % 9)), None, j) for j in range(5)])
            for d in range(30)]
    c = _corpus(spark, rows)
    a = {tuple(r) for r in chunking.chunk_documents(c, token_budget=5).collect()}
    b = {tuple(r) for r in chunking.chunk_documents(c.repartition(11), token_budget=5).collect()}
    assert a == b
