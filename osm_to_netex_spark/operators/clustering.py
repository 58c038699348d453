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
    with_centroids: bool = False,
) -> DataFrame:
    """(vec_id, cluster) after `iters` Lloyd assignment steps (centroids
    recomputed between steps); cluster labels are the init centroid ids.

    with_centroids=True additionally returns the centroid dict
    {cid: [int]} THE FINAL ASSIGNMENT USED (what PQ's ADC tables need)."""
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
        out = assigned.select("vid", "cluster")
        return (out, centroids) if with_centroids else out
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
    with_centroids: bool = False,
) -> str:
    """Unrolled-CTE DuckDB replay: same init, same exact integer arithmetic,
    same tie-breaks, same empty-cluster carry-forward.

    with_centroids=True selects (vid, cluster, cq) — the final-assignment
    centroid vector joined in (the PQ oracle's ADC source)."""
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
    if with_centroids:
        final = (
            f" select a.vid, a.cluster, c.cq from a{iters - 1} a "
            f"join cl{iters - 1} c on a.cluster = c.cid"
        )
    else:
        final = f" select vid, cluster from a{iters - 1}"
    return "with " + ", ".join(ctes) + final


# ---------------------------------------------------------------------------
# DBSCAN over geographic points
# ---------------------------------------------------------------------------
def dbscan(
    points: DataFrame,
    eps_m: float,
    min_pts: int,
    res: int = 13,
    id_col: str = "point_id",
) -> DataFrame:
    """Deterministic DBSCAN (Ester et al. KDD'96) over (lat, lon) points:
    (point_id, cluster, kind) with kind ∈ core/border/noise and cluster =
    the MIN core id reachable through the eps-graph (noise → cluster -1).

    Composition of two existing exact primitives — nothing new to trust:

    * eps-neighbor pairs come from ``distjoin.radius_join`` (cell-pruned,
      provably equal to the brute cross join; the self-pair is included so
      |N_eps(p)| counts p itself, the textbook definition);
    * core points: one partial-agg count per point;
    * clusters: ``dedup.connected_components`` (alternating-star, O(log n)
      rounds) over CORE-CORE edges only — border points never enter the
      component loop, which is what keeps chain-linking out (the classic
      DBSCAN property) and bounds the graph by the core set;
    * border points: min cluster label over their core neighbors — a
      deterministic tiebreak where the original algorithm says "any".

    Everything shuffles on point/cell keys; no driver state beyond the
    component loop's bounded rounds.
    """
    from pyspark import StorageLevel

    from . import dedup
    from .distjoin import radius_join

    # the pair set feeds THREE plan branches (core counts, core-core edges,
    # border assignment) — persist it once instead of re-running the radius
    # join per branch (measured 11.2s → 5.6s at sf0.1).  Caller releases via
    # dedup.unpersist_intermediates(result).
    pairs = radius_join(
        points, points, radius_m=eps_m, res=res, left_id=id_col, right_id=id_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = f"{id_col}_a", f"{id_col}_b"
    return _dbscan_labels(pairs, points, a, b, min_pts, id_col)


def st_dbscan(
    points: DataFrame,
    eps_m: float,
    eps_t_s: int,
    min_pts: int,
    res: int = 13,
    id_col: str = "point_id",
    t_col: str = "t_s",
) -> DataFrame:
    """Spatio-temporal DBSCAN (Birant & Kut 2007's ST neighborhood, on the
    KDD'96 machinery): two points are eps-neighbors iff the spatial
    distance is <= ``eps_m`` AND |Δt| <= ``eps_t_s`` seconds — a spatial
    cluster revisited a week apart splits into per-visit clusters, which
    plain DBSCAN smears into one.

    Composition: the cell-pruned ``radius_join`` pair set (ids only across
    the shuffle) post-filtered by the time band — a dimension-cheap join
    of the two t columns, NOT a widened candidate key, so the spatial
    prefilter's completeness and fan-out bounds carry over verbatim; core
    counts / core-core components / border labeling are the shared
    ``_dbscan_labels`` tail.  Self-pairs have Δt = 0 and survive, keeping
    |N(p)| counting p itself."""
    from pyspark import StorageLevel

    from .distjoin import radius_join

    a, b = f"{id_col}_a", f"{id_col}_b"
    tmap = points.select(F.col(id_col), F.col(t_col))
    pairs = (
        radius_join(
            points, points, radius_m=eps_m, res=res, left_id=id_col, right_id=id_col
        )
        .join(tmap.select(F.col(id_col).alias(a), F.col(t_col).alias("__ta")), a)
        .join(tmap.select(F.col(id_col).alias(b), F.col(t_col).alias("__tb")), b)
        .where(F.abs(F.col("__ta") - F.col("__tb")) <= int(eps_t_s))
        .select(a, b)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return _dbscan_labels(pairs, points, a, b, min_pts, id_col)


def _dbscan_labels(
    pairs: DataFrame,
    points: DataFrame,
    a: str,
    b: str,
    min_pts: int,
    id_col: str,
) -> DataFrame:
    """Shared DBSCAN tail: eps-pair set → (id, cluster, kind).  ``pairs``
    must be persisted by the caller (it feeds three plan branches) and is
    attached for caller release."""
    from . import dedup

    ncnt = pairs.groupBy(a).agg(F.count("*").alias("n_eps"))
    core = ncnt.where(F.col("n_eps") >= min_pts).select(F.col(a).alias("cid"))

    core_edges = (
        pairs.where(F.col(a) < F.col(b))
        .join(core.withColumnRenamed("cid", a), a)
        .join(core.withColumnRenamed("cid", b), b)
        .select(F.col(a).alias("doc_a"), F.col(b).alias("doc_b"))
    )
    comp = dedup.connected_components(core_edges)
    core_label = core.join(
        comp.withColumnRenamed("doc_id", "cid"), "cid", "left"
    ).select(
        "cid", F.coalesce("component", F.col("cid")).alias("cluster")
    )

    border = (
        pairs.join(core_label.withColumnRenamed("cid", b), b)
        .join(core.withColumnRenamed("cid", a), a, "left_anti")
        .groupBy(a)
        .agg(F.min("cluster").alias("cluster"))
    )

    base = points.select(F.col(id_col).alias("pid"))
    out = (
        base.join(core_label.withColumnRenamed("cid", "pid"), "pid", "left")
        .withColumnRenamed("cluster", "core_cluster")
        .join(border.withColumnRenamed(a, "pid").withColumnRenamed("cluster", "border_cluster"),
              "pid", "left")
    )
    result = out.selectExpr(
        f"pid as {id_col}",
        "coalesce(core_cluster, border_cluster, -1) as cluster",
        "case when core_cluster is not null then 'core' "
        "when border_cluster is not null then 'border' else 'noise' end as kind",
    )
    return dedup._attach_cached(result, [pairs])


def dbscan_oracle_sql(
    points_sql_text: str,
    eps_m: float,
    min_pts: int,
    id_col: str = "point_id",
    extra_pair_pred: str = "",
) -> str:
    """DuckDB replay: brute eps-pairs (same haversine), recursive-CTE
    reachability over core-core edges, same min-label conventions.
    ``extra_pair_pred`` narrows the neighbor predicate (the ST-DBSCAN time
    band) — appended verbatim to the pairs WHERE clause."""
    from ..functions.portable import DUCK, haversine_m

    dist = haversine_m("p.lat", "p.lon", "q.lat", "q.lon", DUCK)
    return f"""
        with recursive pts as ({points_sql_text}),
        pairs as (
            select p.{id_col} as a, q.{id_col} as b
            from pts p cross join pts q
            where {dist} <= {eps_m!r}e0 {extra_pair_pred}
        ),
        core as (select a as cid from pairs group by a having count(*) >= {min_pts}),
        ce as (
            select a, b from pairs
            where a < b and a in (select cid from core) and b in (select cid from core)
        ),
        edges as (select a, b from ce union select b as a, a as b from ce),
        reach(v, l) as (
            select a, a from edges
            union
            select e.a, r.l from edges e join reach r on r.v = e.b
        ),
        comp as (select v as cid, min(l) as component from reach group by v),
        core_label as (
            select c.cid, coalesce(m.component, c.cid) as cluster
            from core c left join comp m on c.cid = m.cid
        ),
        border as (
            select p.a as pid, min(cl.cluster) as cluster
            from pairs p
            join core_label cl on p.b = cl.cid
            where p.a not in (select cid from core)
            group by p.a
        )
        select t.{id_col},
               coalesce(cl.cluster, b.cluster, -1) as cluster,
               case when cl.cluster is not null then 'core'
                    when b.cluster is not null then 'border'
                    else 'noise' end as kind
        from pts t
        left join core_label cl on t.{id_col} = cl.cid
        left join border b on t.{id_col} = b.pid"""


def cluster_cohesion(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 20,
) -> DataFrame:
    """Clustering-quality report, exact: per cluster (n, sum of squared
    integer distances to the FINAL centroid, mean squared distance as one
    division) — the number an embedding-pipeline owner tracks across
    retrains.  Centroids come back from the fixed-point k-means driver-side
    (k×dim ints) and ride the plan as a literal map, so the scoring pass is
    a shuffle-free projection + one small groupBy."""
    assigned, cents = kmeans_fixed_point(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, bits=bits,
        with_centroids=True,
    )
    entries = []
    for cid, cq in sorted(cents.items()):
        arr = ", ".join(str(v) for v in cq)
        entries.append(f"cast({cid} as bigint), array({arr})")
    cmap = f"map({', '.join(entries)})"
    qv = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(_quant_expr(vec_col, bits, SPARK)).alias("q"),
    )
    d2 = (
        "aggregate(zip_with(q, element_at(" + cmap + ", cluster), "
        "(a, b) -> (a - b) * (a - b)), 0L, (s, v) -> s + v)"
    )
    return (
        assigned.join(qv, "vid")
        .selectExpr("cluster", f"{d2} as d2")
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("d2").cast("long").alias("sum_d2"),
            (F.sum("d2").cast("double") / F.count("*").cast("double")).alias("msd"),
        )
    )


def cluster_cohesion_oracle_sql(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 20,
) -> str:
    """DuckDB replay: k-means CTE with centroids + the same integer fold."""
    km = kmeans_oracle_sql(
        k=k, iters=iters, dim=dim, table=table, id_col=id_col,
        vec_col=vec_col, bits=bits, with_centroids=True,
    )
    quant = _quant_expr(vec_col, bits, DUCK)
    d2 = (
        "list_reduce(list_prepend(cast(0 as bigint), "
        "list_transform(list_zip(qv.q, km.cq), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
        "(s, v) -> s + v)"
    )
    return f"""
        with km as ({km}),
        qv as (select {id_col} as vid, {quant} as q from {table})
        select km.cluster as cluster,
               cast(count(*) as bigint) as n,
               cast(sum({d2}) as bigint) as sum_d2,
               (cast(sum({d2}) as double) / cast(count(*) as double)) as msd
        from km join qv using (vid)
        group by km.cluster
    """
