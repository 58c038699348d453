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


# ---------------------------------------------------------------------------
# Product Quantization (PQ) ANN — compressed codes + ADC scan
# ---------------------------------------------------------------------------
def pq_encode(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 9,
):
    """Jégou et al. 2011 product quantization: split each vector into ``m``
    subspaces of dim/m and vector-quantize each with its own k-means
    codebook — a 64-dim float32 vector compresses to m·log2(k) bits (4·4
    here), the memory trick that lets an ANN index hold 10^12 vectors.

    Codebooks are the oracle-gated integer fixed-point k-means per subspace
    (code = assignment label); bits=9 quantization keeps the ADC integer
    budget inside int64.  Returns (codes_df with columns vid, code_0..m-1,
    centroids {sub: {cid: [int]}}).

    Scale: training sees each subvector once per iteration (one groupBy);
    encoding IS the final assignment (no extra pass); codes are m small ints
    per corpus row — the only corpus-sized artifact."""
    from .clustering import kmeans_fixed_point

    d_sub = dim // m
    codes = None
    centroids: dict[int, dict[int, list[int]]] = {}
    for j in range(m):
        sub = emb.select(
            F.col(id_col).alias("vid"),
            F.expr(f"slice({vec_col}, {j * d_sub + 1}, {d_sub})").alias("embedding"),
        )
        assigned, cents = kmeans_fixed_point(
            sub, k=k, iters=iters, id_col="vid", vec_col="embedding",
            bits=bits, with_centroids=True,
        )
        assigned = assigned.select("vid", F.col("cluster").alias(f"code_{j}"))
        centroids[j] = cents
        codes = assigned if codes is None else codes.join(assigned, "vid")
    return codes, centroids


def topk_pq_adc(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    n_queries: int = 4,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 9,
) -> DataFrame:
    """Asymmetric-distance-computation top-k: approx d(q, x) = Σ_j
    ||q_j − centroid(code_j(x))||², with the n_queries·m·k distance table
    shipped as DATA — one tiny broadcast-joined lookup table per subspace —
    so the plan size is O(m) regardless of how many queries are scored (the
    round-2 plan inlined the tables as array literals, which grew the plan
    O(n_q·m·k) and would become a driver bottleneck for large query sets).
    The corpus side stays a shuffle-free projection over the code columns:
    one cross join against the broadcast query-id list, then m broadcast
    hash joins (code_j, qid) → partial distance, summed per row; the only
    shuffle is the final per-query top-k.  All arithmetic is exact int64
    (quantized queries vs integer centroids), so the DuckDB oracle agrees
    bit-for-bit — the approximation is in the QUANTIZER, not the evaluation.

    Queries are the n_queries smallest ids (deterministic, mirrors the IVF
    query convention)."""
    import math as _math

    codes, centroids = pq_encode(
        emb, m=m, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col, bits=bits
    )
    spark = emb.sparkSession
    d_sub = dim // m
    scale = float(1 << bits)
    qrows = (
        emb.select(F.col(id_col).alias("qid"), vec_col)
        .orderBy("qid")
        .limit(n_queries)
        .collect()
    )
    qids = spark.createDataFrame(
        [(int(r["qid"]),) for r in qrows], "qid bigint"
    )
    scored = codes.crossJoin(F.broadcast(qids))
    for j in range(m):
        lut_rows = []
        cents = centroids[j]
        for qr in qrows:
            qv = [int(_math.floor(float(x) * scale + 0.5)) for x in qr[vec_col]]
            qsub = qv[j * d_sub : (j + 1) * d_sub]
            for cid, cvec in cents.items():
                lut_rows.append(
                    (
                        int(qr["qid"]),
                        int(cid),
                        int(sum((a - b) * (a - b) for a, b in zip(qsub, cvec))),
                    )
                )
        lut = spark.createDataFrame(
            lut_rows, f"__lq_{j} bigint, __lc_{j} bigint, __ld_{j} bigint"
        )
        scored = scored.join(
            F.broadcast(lut),
            (F.col("qid") == F.col(f"__lq_{j}"))
            & (F.col(f"code_{j}").cast("bigint") == F.col(f"__lc_{j}")),
        ).drop(f"__lq_{j}", f"__lc_{j}")
    scored = scored.select(
        "qid",
        "vid",
        F.expr(" + ".join(f"__ld_{j}" for j in range(m))).alias("adc_dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col("vid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("qid", "vid", "adc_dist", F.col("rank").cast("int").alias("rank"))
    )


def topk_pq_adc_oracle_sql(
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    n_queries: int = 4,
    topk: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 9,
) -> str:
    """DuckDB replay: per-subspace k-means CTEs (with centroids) + the same
    integer ADC sum, computed by JOINs instead of inlined tables — an
    independently-shaped plan over the same definition."""
    from .clustering import _quant_expr, kmeans_oracle_sql

    d_sub = dim // m
    ctes = [
        f"qids as (select {id_col} as qid from {table} order by qid limit {n_queries})"
    ]
    dsum = []
    for j in range(m):
        ctes.append(
            f"sub{j} as (select {id_col} as vid, "
            f"{vec_col}[{j * d_sub + 1}:{(j + 1) * d_sub}] as embedding from {table})"
        )
        km = kmeans_oracle_sql(
            k=k, iters=iters, dim=d_sub, table=f"sub{j}",
            id_col="vid", vec_col="embedding", bits=bits, with_centroids=True,
        )
        ctes.append(f"enc{j} as ({km})")
        quant = _quant_expr("embedding", bits, "duckdb")
        ctes.append(
            f"q{j} as (select s.vid as qid, {quant} as qq from sub{j} s "
            f"join qids on s.vid = qids.qid)"
        )
        ctes.append(
            f"qd{j} as (select q{j}.qid, e.cluster as code, "
            f"list_reduce(list_prepend(cast(0 as bigint), "
            f"list_transform(list_zip(q{j}.qq, e.cq), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
            f"(s, x) -> s + x) as dj "
            f"from q{j} cross join (select distinct cluster, cq from enc{j}) e)"
        )
        dsum.append(f"qd{j}.dj")
    enc_joins = " ".join(
        f"join enc{j} on enc{j}.vid = enc0.vid" for j in range(1, m)
    )
    ctes.append(
        "adc as (select qids.qid as qid, enc0.vid as vid, "
        + " + ".join(dsum)
        + " as adc_dist from qids cross join enc0 "
        + enc_joins
        + " "
        + " ".join(
            f"join qd{j} on qd{j}.qid = qids.qid and qd{j}.code = enc{j}.cluster"
            for j in range(m)
        )
        + ")"
    )
    return (
        "with " + ", ".join(ctes)
        + f""" select qid, vid, adc_dist, cast(rn as int) as rank from (
            select qid, vid, adc_dist,
                   row_number() over (partition by qid order by adc_dist, vid) as rn
            from adc) where rn <= {topk}"""
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, vec_id, cos, rn) — for every query vector, the top-k most
    similar corpus vectors with a DIFFERENT label: contrastive-training
    hard-negative mining (the in-batch-negatives upgrade every embedding
    pipeline ships).  Same exact staged-cosine arithmetic and broadcast
    shape as :func:`topk_cosine_brute`; the label inequality prunes before
    the ranking window, so positives never occupy top-k slots."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        F.col(vec_col).alias("qv"),
        F.expr(NORM.format(v=vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("c_label"),
        F.col(vec_col).alias("cv"),
        F.expr(NORM.format(v=vec_col)).alias("cn"),
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_label") != F.col("c_label"))
        .withColumn("cos", F.round(F.expr(_cos_staged("qv", "cv", "qn", "cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
