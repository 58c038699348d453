"""Approximate-nearest-neighbor similarity search over embedding columns.

* brute-force cosine top-k — the exact baseline: query side broadcast, corpus
  scanned once, per-query window top-k;
* IVF (inverted-file) — the scale path: K deterministic centroids, each
  corpus vector assigned to its nearest centroid once (build), queries probe
  only the ``n_probe`` nearest centroid buckets.  Corpus shuffle is one
  groupBy-free equi-join on centroid id; recall < 1 by design (ANN), so this
  variant ships with a rows-only correctness check while brute-force carries
  the exact DuckDB oracle.

Vectors are ``array<float>`` (testdata embeddings.parquet); math is cast to
double and folded left-to-right portably (operators.dedup.cosine_expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import cosine_expr


def topk_cosine_brute(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos, rn) — exact top-k by cosine, ties on id asc.

    Self-matches (same id) are excluded so a corpus can query itself.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", F.round(F.expr(cosine_expr("qv", "cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned) — centroids are the corpus vectors with the
    n_centroids smallest ids (deterministic, no iterative k-means needed for
    bucketing); every corpus vector is assigned to its max-cosine centroid."""
    w = Window.orderBy(F.col("cent_id").asc())
    cents = (
        corpus.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_centroids)
        .drop("rk")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "cos", F.expr(cosine_expr("cv", "cent_vec"))
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cent_id").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .select("vec_id", "cv", "cent_id")
    )
    return cents, assigned


def topk_cosine_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the n_probe nearest centroid buckets per query."""
    cents, assigned = ivf_build(corpus, n_centroids, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", F.expr(cosine_expr("qv", "cent_vec"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cent_id").asc())
    probes = (
        qc.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cent_id")
    )
    cand = (
        assigned.join(probes, "cent_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", F.round(F.expr(cosine_expr("qv", "cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
