"""BM25 ranked retrieval over the document corpus.

The training-data-pipeline counterpart of "keyword search": given a bag of
query terms, score every matching document with Okapi BM25 and return the
global top-k.  The reference has no search surface (it is a converter); this
operator extends the engine the way SURVEY.md §2.3 extends it — Spark-first,
oracle-gated.

Scale design (10^12 docs):

* **Filter before explode.** Tokens are filtered to the query-term set
  INSIDE the per-row projection (`filter(toks, t -> array_contains(...))`),
  so the exploded (doc, term) relation carries only query-term hits — its
  size is O(matching postings), never O(corpus tokens).  The non-matching
  99.9% of the corpus contributes nothing to the shuffle.
* **Corpus stats are one tiny agg.** N and avgdl come from a single
  map-side-combined aggregation over (doc, length) — a 1-row frame that is
  broadcast, as is the per-term document-frequency frame (|query| rows).
* **Global top-k is TakeOrderedAndProject.** `orderBy(...).limit(k)` does a
  per-partition top-k then a driver merge of k·partitions rows — no global
  sort shuffle.
* **Deterministic floating point.** Doc lengths and term counts are exact
  integers in doubles, so N/avgdl/df/tf are bit-identical across engines
  and partitionings; the per-document score folds contributions in sorted
  term order, making the double sum order-free.  The DuckDB oracle runs the
  same IEEE op sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as tx
from ..functions.portable import DUCK, SPARK


def _terms_array(query_terms: list[str], d: str) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"[{inner}]" if d == DUCK else f"array({inner})"


def _contrib_expr(k1: float, b: float) -> str:
    """Per-(doc, term) BM25 contribution; identical text in both dialects.

    idf is the non-negative Robertson-Sparck-Jones form ln(1 + (N-df+0.5)/
    (df+0.5)); tf saturation with length normalization b."""
    idf = "ln(1.0e0 + (n_docs - df + 0.5e0) / (df + 0.5e0))"
    sat = f"(tf * ({k1} + 1.0e0)) / (tf + {k1} * (1.0e0 - {b} + {b} * dl / avgdl))"
    return f"({idf}) * ({sat})"


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) — top-k documents by BM25, ties broken by doc_id."""
    toks = tx.tokens(text_col, SPARK)
    terms = _terms_array(query_terms, SPARK)
    base = docs.selectExpr(
        f"{id_col} as doc_id",
        f"{toks} as toks",
    ).selectExpr(
        "doc_id",
        "cast(size(toks) as double) as dl",
        f"filter(toks, t -> array_contains({terms}, t)) as qtoks",
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", F.expr(_contrib_expr(k1, b)))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(term, contrib))), "
            "x -> x.contrib), cast(0.0 as double), (s, v) -> s + v)"
        ).alias("score_raw")
    )
    return (
        per_doc.select("doc_id", F.round("score_raw", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of ``bm25_topk`` — same formula, same sorted-fold sum."""
    toks = tx.tokens(text_col, DUCK)
    terms = _terms_array(query_terms, DUCK)
    contrib = _contrib_expr(k1, b)
    return f"""
        with base as (
            select {id_col} as doc_id,
                   cast(len(toks) as double) as dl,
                   list_filter(toks, t -> list_contains({terms}, t)) as qtoks
            from (select {id_col}, {toks} as toks from {table})
        ),
        stats as (
            select cast(count(*) as double) as n_docs, avg(dl) as avgdl from base
        ),
        tf as (
            select doc_id, dl, term, cast(count(*) as double) as tf
            from (select doc_id, dl, unnest(qtoks) as term from base)
            group by doc_id, dl, term
        ),
        dft as (select term, cast(count(*) as double) as df from tf group by term),
        scored as (
            select tf.doc_id, {contrib} as contrib, tf.term
            from tf join dft on tf.term = dft.term cross join stats
        ),
        per_doc as (
            select doc_id,
                   list_reduce(
                       list_prepend(0.0e0, list_transform(
                           list_sort(list(struct_pack(term := term, contrib := contrib))),
                           x -> x.contrib)),
                       (s, v) -> s + v) as score_raw
            from scored group by doc_id
        )
        select doc_id, round(score_raw, 6) as score
        from per_doc
        order by score desc, doc_id asc
        limit {k}
    """


def top_terms(
    docs: DataFrame,
    n: int = 10,
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """Per-stratum vocabulary heavy hitters: the ``n`` most frequent tokens
    per language with document and occurrence counts — the
    vocabulary-building / BPE-prep primitive of a training pipeline.

    Shape: explode(tokens) → two-level aggregate.  The first groupBy
    (stratum, term) gets full map-side combine, so the shuffle carries one
    row per distinct (stratum, term) per partition, never per occurrence;
    the top-n per stratum is a window over that aggregated table, whose size
    is the vocabulary (≈10^6 rows), not the corpus — at the 10^9-doc design
    point the window input is 10^-3 of the corpus and holds in one stage.
    Deterministic tiebreak: (count desc, term asc)."""
    from ..functions import text as tx
    from ..functions.portable import SPARK
    from pyspark.sql import Window

    counts = (
        docs.selectExpr(
            f"{stratum_col} as stratum",
            f"explode({tx.tokens(text_col, SPARK)}) as term",
        )
        .groupBy("stratum", "term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    w = Window.partitionBy("stratum").orderBy(F.desc("n_occ"), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select(F.col("stratum").alias(stratum_col), "term", "n_occ", "rank")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of sparse (BM25) + dense (cosine)
# ---------------------------------------------------------------------------
def rrf_hybrid(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    n_list: int = 50,
    k_const: int = 60,
    topk: int = 20,
) -> DataFrame:
    """Hybrid search the way production RAG stacks rank (Cormack et al.
    2009 RRF): fuse the BM25 top-``n_list`` and the dense cosine
    top-``n_list`` (query = the ``query_vec_id`` document's embedding;
    doc_id ≡ vec_id) by score = Σ 1/(k + rank), docs missing from a list
    contributing 0.  Ranks are integers and the fusion is a FIXED two-term
    IEEE sequence (div, div, add) — both engines produce bit-identical
    scores, so the fused order is exact, ties broken by doc_id.

    Scale: each list is already top-n_list (tiny); the fusion is a
    broadcast-sized outer join + one TakeOrderedAndProject.  The corpus is
    touched only inside the two underlying rankers."""
    from pyspark.sql import Window

    from .dedup import cosine_expr

    bm = bm25_topk(docs, query_terms, k=n_list)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_r = bm.withColumn("r_sparse", F.row_number().over(w)).select(
        "doc_id", "r_sparse"
    )
    q = emb.where(F.col("vec_id") == query_vec_id).selectExpr(
        "embedding as q_embedding"
    )
    dense = (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            f"round({cosine_expr('embedding', 'q_embedding', SPARK)}, 6) as cos",
        )
    )
    wd = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    dense_r = (
        dense.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(n_list)
        .withColumn("r_dense", F.row_number().over(wd))
        .selectExpr("vec_id as doc_id", "r_dense")
    )
    fused = bm_r.join(dense_r, "doc_id", "full_outer").selectExpr(
        "doc_id",
        f"(coalesce(1.0e0 / ({k_const} + r_sparse), 0.0e0) + "
        f"coalesce(1.0e0 / ({k_const} + r_dense), 0.0e0)) as rrf",
        # 0 = absent from that list (null would canonicalize as NaN)
        "coalesce(r_sparse, 0) as r_sparse",
        "coalesce(r_dense, 0) as r_dense",
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(topk)


def rrf_hybrid_oracle_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    n_list: int = 50,
    k_const: int = 60,
    topk: int = 20,
) -> str:
    """DuckDB replay: nested BM25 oracle + the same dense ranking + the same
    fixed-sequence fusion."""
    from .dedup import cosine_expr

    bm = bm25_topk_oracle_sql(query_terms, k=n_list)
    cos = cosine_expr("c.embedding", "q.embedding", DUCK)
    return f"""
        with bm as (
            select doc_id, row_number() over (order by score desc, doc_id asc)
                   as r_sparse
            from ({bm})
        ),
        dense0 as (
            select c.vec_id as doc_id, round({cos}, 6) as cos
            from embeddings c cross join
                 (select embedding from embeddings where vec_id = {query_vec_id}) q
            where c.vec_id <> {query_vec_id}
        ),
        dense as (
            select doc_id, row_number() over (order by cos desc, doc_id asc)
                   as r_dense
            from (select * from dense0 order by cos desc, doc_id asc limit {n_list})
        ),
        fused as (
            select coalesce(bm.doc_id, dense.doc_id) as doc_id,
                   (coalesce(1.0e0 / ({k_const} + bm.r_sparse), 0.0e0) +
                    coalesce(1.0e0 / ({k_const} + dense.r_dense), 0.0e0)) as rrf,
                   coalesce(bm.r_sparse, 0) as r_sparse,
                   coalesce(dense.r_dense, 0) as r_dense
            from bm full outer join dense on bm.doc_id = dense.doc_id
        )
        select doc_id, rrf, r_sparse, r_dense from fused
        order by rrf desc, doc_id asc limit {topk}
    """
