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

NORM = "sqrt(aggregate({v}, 0.0e0, (s, x) -> s + cast(x as double) * cast(x as double)))"


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"0.0e0, (s, v) -> s + v)"
    )


def _cos_staged(a: str, b: str, na: str, nb: str) -> str:
    """Cosine with per-vector norms staged as columns — same IEEE op sequence
    as dedup.cosine_expr (sqrt(Σx²) per side, dot/(na·nb)), so values are
    bit-identical to the oracle; the per-pair cost drops to the dot product."""
    return f"(({_dot(a, b)}) / nullif(({na}) * ({nb}), 0.0e0))"


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
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.expr(NORM.format(v=vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.expr(NORM.format(v=vec_col)).alias("cn"),
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", F.round(F.expr(_cos_staged("qv", "cv", "qn", "cn")), 6))
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
        corpus.select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
            F.expr(NORM.format(v=vec_col)).alias("cent_n"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_centroids)
        .drop("rk")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.expr(NORM.format(v=vec_col)).alias("cvn"),
    )
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "cos", F.expr(_cos_staged("cv", "cent_vec", "cvn", "cent_n"))
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cent_id").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .select("vec_id", "cv", "cvn", "cent_id")
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
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.expr(NORM.format(v=vec_col)).alias("qn"),
    )
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", F.expr(_cos_staged("qv", "cent_vec", "qn", "cent_n"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cent_id").asc())
    probes = (
        qc.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", "cent_id")
    )
    cand = (
        assigned.join(probes, "cent_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", F.round(F.expr(_cos_staged("qv", "cv", "qn", "cvn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
