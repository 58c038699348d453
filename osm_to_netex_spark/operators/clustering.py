"""Deterministic fixed-point k-means (Lloyd's) over embedding columns.

Iterative algorithms are usually exempted from the value-hash oracle gate;
this one is NOT, by construction: every arithmetic step is exact integer
math carried in doubles, so the result is bit-identical across engines,
partitionings, and cluster sizes.

* **Quantize once.** Components are mapped to integers
  ``q = floor(x · 2^bits + 0.5)`` (round-half-up, identical text in both
  dialects).  With |x| ≤ ~8 and bits=20, |q| ≤ 2^23.
* **Exact distances.** Squared L2 over integer components:
  Σ (q_i − c_i)² ≤ dim · 2^48 < 2^53 — every candidate distance is an exact
  integer in a double, so argmin (ties broken by cluster label) is
  deterministic.
* **Exact means.** Per-cluster per-dimension sums of integers stay < 2^53
  for corpus sizes to ~10^8 per cluster at bits=20 (and the shuffle carries
  k·dim partial sums per partition, map-side combined); the new centroid
  component is ``floor(sum/n + 0.5)`` — one correctly-rounded division +
  half-up round, again identical everywhere.
* **Control plane.** Centroids (k·dim integers) are collected to the driver
  each iteration and re-embedded as literals in the next assignment
  expression — the MLlib shape; the data plane never leaves the JVM.
  Empty clusters keep their previous centroid.

Init: the k smallest ids (deterministic, replayed by the oracle).  The
DuckDB oracle unrolls the same T iterations as chained CTEs and must agree
on the final (vec_id, cluster) assignment exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.portable import DUCK, SPARK


def _quant_expr(vec_col: str, bits: int, d: str) -> str:
    q = float(1 << bits)
    body = f"cast(floor(cast(x as double) * {q} + 0.5e0) as bigint)"
    if d == SPARK:
        return f"transform({vec_col}, x -> {body})"
    return f"list_transform({vec_col}, x -> {body})"


def kmeans_fixed_point(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 20,
) -> DataFrame:
    """(vec_id, cluster) after `iters` Lloyd assignment steps (centroids
    recomputed between steps); cluster labels are the init centroid ids."""
    vecs = emb.select(
        F.col(id_col).alias("vid"), F.expr(_quant_expr(vec_col, bits, SPARK)).alias("q")
    ).persist()
    try:
        init = vecs.orderBy("vid").limit(k).collect()
        centroids = {int(r.vid): [int(v) for v in r.q] for r in init}

        def assign_expr() -> str:
            structs = ", ".join(
                f"named_struct('cid', cast({cid} as bigint), 'cq', array({', '.join(str(v) for v in cq)}))"
                for cid, cq in sorted(centroids.items())
            )
            dist = (
                "aggregate(zip_with(q, c.cq, (a, b) -> (a - b) * (a - b)), "
                "cast(0 as bigint), (s, v) -> s + v)"
            )
            return (
                f"array_min(transform(array({structs}), c -> "
                f"named_struct('d', {dist}, 'cid', c.cid))).cid"
            )

        assigned = None
        for t in range(iters):
            assigned = vecs.select("vid", "q", F.expr(assign_expr()).alias("cluster"))
            if t == iters - 1:
                break
            sums = (
                assigned.select("cluster", F.posexplode("q").alias("i", "val"))
                .groupBy("cluster", "i")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new: dict[int, list[int]] = {}
            for r in sums:
                new.setdefault(int(r.cluster), [0] * len(next(iter(centroids.values()))))[
                    int(r.i)
                ] = int(  # floor(s/n + 0.5): exact ints, correctly-rounded division
                    __import__("math").floor(int(r.s) / int(r.n) + 0.5)
                )
            centroids = {cid: new.get(cid, cq) for cid, cq in centroids.items()}
        return assigned.select("vid", "cluster")
    finally:
        vecs.unpersist()


def kmeans_oracle_sql(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 20,
) -> str:
    """Unrolled-CTE DuckDB replay: same init, same exact integer arithmetic,
    same tie-breaks, same empty-cluster carry-forward."""
    quant = _quant_expr(vec_col, bits, DUCK)
    dist = (
        "list_reduce(list_prepend(cast(0 as bigint), "
        "list_transform(list_zip(v.q, c.cq), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
        "(s, x) -> s + x)"
    )
    ctes = [
        f"vecs as (select {id_col} as vid, {quant} as q from {table})",
        f"cl0 as (select vid as cid, q as cq from vecs order by vid limit {k})",
    ]
    for t in range(iters):
        prev = f"cl{t}"
        ctes.append(
            f"a{t} as (select vid, cid as cluster from ("
            f"select v.vid, c.cid, row_number() over "
            f"(partition by v.vid order by {dist}, c.cid) as rn "
            f"from vecs v cross join {prev} c) where rn = 1)"
        )
        if t == iters - 1:
            break
        ctes.append(
            f"m{t} as (select a.cluster, t.i, "
            f"cast(floor(sum(v.q[t.i]) / count(*) + 0.5e0) as bigint) as mv "
            f"from a{t} a join vecs v using (vid), "
            f"unnest(generate_series(1, {dim})) t(i) group by a.cluster, t.i)"
        )
        ctes.append(
            f"cl{t + 1} as (select p.cid, coalesce(n.cq, p.cq) as cq from {prev} p "
            f"left join (select cluster as cid, list(mv order by i) as cq "
            f"from m{t} group by cluster) n using (cid))"
        )
    return (
        "with " + ", ".join(ctes) + f" select vid, cluster from a{iters - 1}"
    )
