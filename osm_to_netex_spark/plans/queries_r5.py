"""Round-5 query additions (SURVEY §2.3 `(r5)` rows).

Same landing discipline as every registry entry (LANDING.md): dual-dialect
SQL (or a DataFrame operator whose algebra the DuckDB oracle replays),
integer/IEEE-exact folds, scalar output columns, identical aliases both
dialects.  Registered via ``register_r5`` before the driver-window
rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.portable import DUCK, SPARK
from ..operators import dedup

_ND_BITS = 4
_ND_SEEDS = 3
_ND_THRESHOLD = 0.35
# recall-eval universe: vec_id % mod == 0 on both pair sides — bounds the
# exact reference's quadratic at every scale, independent of the buckets
_RECALL_MOD = 3


# ---------------------------------------------------------------------------
# Seed-ensemble embedding near-dup (SCALE.md known-limit #2, shipped)
# ---------------------------------------------------------------------------
def q_embed_near_dup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-3-seed hyperplane bucketings, exact verify once — the
    recall mitigation the single-seed operator documented, as an operator
    (operators/dedup.py embedding_near_dup_ensemble)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    return dedup.embedding_near_dup_ensemble(
        emb, dim=dim, n_bits=_ND_BITS, n_seeds=_ND_SEEDS, cos_threshold=_ND_THRESHOLD
    )


def q_embed_near_dup_ensemble_oracle(dim: int = 64) -> str:
    cos = dedup.cosine_expr("a.embedding", "b.embedding", DUCK)
    buckets = ", ".join(
        f"{dedup.hyperplane_bits('embedding', _ND_BITS, dim, DUCK, seed=dedup._seed_tag(s))} as b{s}"
        for s in range(_ND_SEEDS)
    )
    cands = "\n            union\n".join(
        f"            select x.vec_id as id_a, y.vec_id as id_b "
        f"from sig x join sig y on x.b{s} = y.b{s} where x.vec_id < y.vec_id"
        for s in range(_ND_SEEDS)
    )
    return f"""
        with sig as (select vec_id, embedding, {buckets} from embeddings),
        cand as (
{cands}
        )
        select cand.id_a, cand.id_b, round({cos}, 6) as cos
        from cand
        join sig a on a.vec_id = cand.id_a
        join sig b on b.vec_id = cand.id_b
        where round({cos}, 6) >= {_ND_THRESHOLD!r}e0"""


# ---------------------------------------------------------------------------
# Embedding near-dup recall eval vs the exact pair set (lsh_recall pattern)
# ---------------------------------------------------------------------------
def q_embed_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the single-seed and 3-seed-ensemble near-dup finders
    against the EXACT cosine pair set at the same threshold, measured over
    a deterministic id-sample universe (``vec_id % 3 = 0`` on BOTH
    sides) — the quantified form of SCALE.md's recall discussion.  The
    sample bounds the exact reference's quadratic at EVERY scale (the
    recall estimate is unbiased: membership is independent of the
    hyperplane buckets); the finders' pair sets are restricted to the same
    universe, so numerator ⊆ denominator by construction."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    uni = emb.where(F.col("vec_id") % _RECALL_MOD == 0)
    base = uni.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("vec"),
        F.expr(
            "sqrt(aggregate(embedding, 0.0e0, (s, x) -> s + cast(x as double) * cast(x as double)))"
        ).alias("nrm"),
    )
    a = base.selectExpr("vid as id_a", "vec as va", "nrm as na")
    b = base.selectExpr("vid as id_b", "vec as vb", "nrm as nb")
    dot = (
        "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), "
        "0.0e0, (s, v) -> s + v)"
    )
    cos = f"(({dot}) / nullif(na * nb, 0.0e0))"
    exact = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(F.expr(cos), 6))
        .where(F.col("cos") >= _ND_THRESHOLD)
        .select("id_a", "id_b")
    )
    in_uni = (F.col("id_a") % _RECALL_MOD == 0) & (F.col("id_b") % _RECALL_MOD == 0)
    single = (
        dedup.embedding_near_dup(
            emb, dim=dim, n_bits=_ND_BITS, cos_threshold=_ND_THRESHOLD
        )
        .where(in_uni)
        .select("id_a", "id_b", F.lit(1).alias("hit1"))
    )
    ens = (
        dedup.embedding_near_dup_ensemble(
            emb, dim=dim, n_bits=_ND_BITS, n_seeds=_ND_SEEDS, cos_threshold=_ND_THRESHOLD
        )
        .where(in_uni)
        .select("id_a", "id_b", F.lit(1).alias("hite"))
    )
    joined = exact.join(single, ["id_a", "id_b"], "left").join(
        ens, ["id_a", "id_b"], "left"
    )
    out = joined.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.count("hit1").cast("long").alias("n_hit_single"),
        F.count("hite").cast("long").alias("n_hit_ensemble"),
        F.when(F.count("*") == 0, F.lit(0.0))
        .otherwise(F.round(F.count("hit1").cast("double") / F.count("*").cast("double"), 9))
        .alias("recall_single"),
        F.when(F.count("*") == 0, F.lit(0.0))
        .otherwise(F.round(F.count("hite").cast("double") / F.count("*").cast("double"), 9))
        .alias("recall_ensemble"),
    )
    out._graft_cached = tuple(getattr(single, "_graft_cached", ())) + tuple(
        getattr(ens, "_graft_cached", ())
    )
    return out


def q_embed_recall_oracle(dim: int = 64) -> str:
    from . import queries as q

    cos = dedup.cosine_expr("a.embedding", "b.embedding", DUCK)
    m = _RECALL_MOD
    return f"""
        with uni as (select * from embeddings where vec_id % {m} = 0),
        exact as (
            select a.vec_id as id_a, b.vec_id as id_b
            from uni a join uni b on a.vec_id < b.vec_id
            where round({cos}, 6) >= {_ND_THRESHOLD!r}e0
        ),
        s1 as (select * from ({q.q_embed_near_dup_oracle(dim)})
               where id_a % {m} = 0 and id_b % {m} = 0),
        se as (select * from ({q_embed_near_dup_ensemble_oracle(dim)})
               where id_a % {m} = 0 and id_b % {m} = 0)
        select cast(count(*) as bigint) as n_exact,
               cast(count(s1.id_a) as bigint) as n_hit_single,
               cast(count(se.id_a) as bigint) as n_hit_ensemble,
               case when count(*) = 0 then 0.0e0
                    else round(cast(count(s1.id_a) as double)
                               / cast(count(*) as double), 9) end as recall_single,
               case when count(*) = 0 then 0.0e0
                    else round(cast(count(se.id_a) as double)
                               / cast(count(*) as double), 9) end as recall_ensemble
        from exact
        left join s1 on s1.id_a = exact.id_a and s1.id_b = exact.id_b
        left join se on se.id_a = exact.id_a and se.id_b = exact.id_b"""


# ---------------------------------------------------------------------------
# Discrete Fréchet trajectory-similarity join (Hausdorff/DTW/EDR triad done)
# ---------------------------------------------------------------------------
_FRECHET_R = 20000.0  # max leash length (m)


def q_frechet_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Fréchet join over the geo_traj fixture: padded bbox-cover
    candidates (complete: F >= d(A1,B1)) + mm-integer anti-diagonal DP
    with the DTW staging's + swapped for max (trajsim.frechet_join)."""
    from ..operators import trajsim
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {q.traj_sql(SPARK)}")
    return trajsim.frechet_join(
        spark.table("geo_traj"), max_dist_m=_FRECHET_R, n_steps=q._MM_STEPS, res=12
    )


def q_frechet_join_oracle() -> str:
    from ..operators import trajsim
    from . import queries as q

    body = trajsim.frechet_join_oracle_sql(
        f"select * from ({q.traj_sql(DUCK)}) _t",
        max_dist_m=_FRECHET_R,
        n_steps=q._MM_STEPS,
    )
    return f"{q.duck_geometry_ctes()}, __f as ({body}) select * from __f"


# ---------------------------------------------------------------------------
# Spatio-temporal DBSCAN over timestamped points
# ---------------------------------------------------------------------------
_STDB_EPS_M = 2000.0
_STDB_EPS_T = 3 * 86400  # 3-day time band (s)
_STDB_MIN_PTS = 3
_STDB_SPAN_S = 30 * 86400  # deterministic timestamps spread over 30 days


def st_points_sql(d: str) -> str:
    """geo_points + a deterministic integer-seconds timestamp per point
    (portable hash over a 30-day span) — the ST-DBSCAN fixture."""
    from . import queries as q

    t = q._pr(["'st:t:'", "point_id"], d)
    return (
        f"select point_id, lat, lon, "
        f"cast(floor({t} * {float(_STDB_SPAN_S)!r}e0) as bigint) as t_s "
        f"from geo_points"
    )


def q_st_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST-DBSCAN (eps 2 km, 3-day time band, min_pts 3): the dbscan
    machinery with the Birant-Kut spatio-temporal neighbor predicate --
    same-place different-week points no longer chain
    (operators/clustering.py st_dbscan)."""
    from ..operators import clustering
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view st_points as {st_points_sql(SPARK)}")
    return clustering.st_dbscan(
        spark.table("st_points"),
        eps_m=_STDB_EPS_M,
        eps_t_s=_STDB_EPS_T,
        min_pts=_STDB_MIN_PTS,
        res=13,
    )


def q_st_dbscan_oracle() -> str:
    from ..operators import clustering
    from . import queries as q

    pts = f"select * from ({q.points_sql(DUCK)}) __gp"
    st = st_points_sql(DUCK).replace("from geo_points", f"from ({pts}) geo_points")
    return clustering.dbscan_oracle_sql(
        st,
        eps_m=_STDB_EPS_M,
        min_pts=_STDB_MIN_PTS,
        extra_pair_pred=f"and abs(p.t_s - q.t_s) <= {_STDB_EPS_T}",
    )


# ---------------------------------------------------------------------------
# Rank-biased overlap between two retrieval rankings (Webber et al. 2010)
# ---------------------------------------------------------------------------
_RBO_P = 0.9
_RBO_K = 15


def _rbo_cum_weights() -> dict:
    """cw[m] = sum_{d=m..k} (1-p) p^(d-1) / d, quantized to 1e12 units per
    DEPTH TERM before the cumulative sum — identical integer literals in
    both dialects, so the fold is order-free and exact."""
    import math

    w = {
        d: int(math.floor((1.0 - _RBO_P) * _RBO_P ** (d - 1) / d * 1e12 + 0.5))
        for d in range(1, _RBO_K + 1)
    }
    return {m: sum(w[d] for d in range(m, _RBO_K + 1)) for m in range(1, _RBO_K + 1)}


def _tf_topk_sql(d: str) -> str:
    """Plain term-frequency ranking of the SAME query-term bag bm25_topk
    serves — the idf/length-normalization ablation RBO compares against."""
    from ..functions import text as tx
    from . import queries as q

    toks = tx.tokens("text", d)
    terms = ", ".join(f"'{t}'" for t in q._BM25_TERMS)
    unnest = (
        f"select doc_id, explode({toks}) as term from documents"
        if d == SPARK
        else f"select doc_id, unnest({toks}) as term from documents"
    )
    return f"""
        select doc_id, cast(rn as bigint) as rb from (
            select doc_id, row_number() over (order by tf desc, doc_id asc) as rn
            from (select doc_id, cast(count(*) as bigint) as tf
                  from ({unnest}) t where term in ({terms})
                  group by doc_id) c
        ) r where rn <= {_RBO_K}"""


def q_rbo_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO(p=0.9)@15 between the BM25 ranking and the plain-TF ranking of
    the same query bag: the top-weighted rank-agreement number that says
    how much the idf + length normalization actually reorders what a user
    sees.  Sum swapped to per-matched-doc cumulative weights cw(max(ra,rb))
    — one broadcast join of two k-row rankings, integer-exact."""
    from pyspark.sql import Window

    from ..operators import retrieval
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    docs = spark.table("documents")
    bm = retrieval.bm25_topk(docs, q._BM25_TERMS, k=_RBO_K)
    bm_r = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("ra"),
    )
    tf_r = spark.sql(_tf_topk_sql(SPARK))
    cw = _rbo_cum_weights()
    case = "case greatest(ra, rb) " + " ".join(
        f"when {m} then {v}" for m, v in cw.items()
    ) + " end"
    joined = bm_r.join(tf_r, "doc_id")
    return (
        joined.agg(
            F.count("*").cast("long").alias("n_overlap"),
            F.coalesce(F.sum(F.expr(case)), F.lit(0)).cast("long").alias("rbo_q12"),
        )
        .crossJoin(bm_r.agg(F.count("*").cast("long").alias("n_a")))
        .crossJoin(tf_r.agg(F.count("*").cast("long").alias("n_b")))
        .select("n_a", "n_b", "n_overlap", "rbo_q12")
    )


def q_rbo_eval_oracle() -> str:
    from ..operators import retrieval
    from . import queries as q

    cw = _rbo_cum_weights()
    case = "case greatest(ra, rb) " + " ".join(
        f"when {m} then {v}" for m, v in cw.items()
    ) + " end"
    bm = retrieval.bm25_topk_oracle_sql(q._BM25_TERMS, k=_RBO_K)
    return f"""
        with bm as ({bm}),
        bm_r as (
            select doc_id,
                   cast(row_number() over (order by score desc, doc_id asc) as bigint) as ra
            from bm
        ),
        tf_r as ({_tf_topk_sql(DUCK)}),
        j as (select ra, rb from bm_r join tf_r using (doc_id))
        select (select cast(count(*) as bigint) from bm_r) as n_a,
               (select cast(count(*) as bigint) from tf_r) as n_b,
               cast(count(*) as bigint) as n_overlap,
               cast(coalesce(sum({case}), 0) as bigint) as rbo_q12
        from j"""


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split (near-dup groups stay on one side)
# ---------------------------------------------------------------------------
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic split keyed on the near-dup COMPONENT representative
    instead of the doc's own id: every member of a MinHash-LSH duplicate
    group lands on the same side, so train never leaks a near-copy of a
    val/test doc — the split discipline a contamination audit assumes.
    Singleton docs hash exactly as in corpus_split (same salt), so
    adopting the leakage-safe split only moves grouped docs."""
    from ..operators import sampling
    from . import queries as q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, n_perm=16, bands=4, jaccard_threshold=0.4)
    comp = dedup.connected_components(pairs)  # eagerly checkpoints the edges
    dedup.unpersist_intermediates(pairs)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .selectExpr("doc_id", "coalesce(component, doc_id) as group_key")
        .withColumn(
            "split",
            F.expr(sampling.split_expr("group_key", sampling.DEFAULT_SPLITS, SPARK)),
        )
    )


def q_leakage_safe_split_oracle() -> str:
    from ..operators import sampling
    from . import queries as q

    comp = q.q_dedup_groups_oracle()
    return f"""
        select doc_id, group_key,
               {sampling.split_expr("group_key", sampling.DEFAULT_SPLITS, DUCK)} as split
        from (
            select d.doc_id, coalesce(c.component, d.doc_id) as group_key
            from documents d
            left join ({comp}) c on c.doc_id = d.doc_id
        ) g"""


# ---------------------------------------------------------------------------
# Exact supercover line rasterization: cells a polyline actually crosses
# ---------------------------------------------------------------------------
_LR_RES = 11


def _line_raster_sql(d: str, res: int = _LR_RES) -> str:
    """Per occupied cell: how many polyline segments (and distinct zones)
    actually CROSS it — the exact supercover, not a bbox smear.  A segment
    crosses cell rect [x0,x1]×[y0,y1] iff the parametric t-intervals where
    x(t) and y(t) lie inside the bounds intersect within [0,1] — the
    slab test, exact in IEEE (identical divisions both engines), with the
    degenerate axis (dx=0 / dy=0) handled by a containment case.

    Scale: candidate cells are the segment's OWN bbox cells (no padding —
    cover size is the segment's true cell extent); the slab test prunes
    bbox corners the line misses; cell-keyed partial aggregation.  The
    bbox explode is the seg_candidates shape, fan-out bounded for
    street-scale segments at the res knob."""
    from ..functions import geo
    from . import queries as q

    n = 2 ** res
    cw, ch = 360.0 / n, 180.0 / n
    polys = "geo_polys" if d == SPARK else f"({q.polys_sql(DUCK)})"
    if d == SPARK:
        segs = (
            f"select zone_id, element_at(pos_list, cast(2*i - 1 as int)) as ay,"
            f" element_at(pos_list, cast(2*i as int)) as ax,"
            f" element_at(pos_list, cast(2*i + 1 as int)) as by_,"
            f" element_at(pos_list, cast(2*i + 2 as int)) as bx"
            f" from (select zone_id, pos_list,"
            f" explode(sequence(1, size(pos_list) div 2 - 1)) as i from {polys})"
        )
    else:
        segs = (
            f"select zone_id, pos_list[2*t.i - 1] as ay, pos_list[2*t.i] as ax,"
            f" pos_list[2*t.i + 1] as by_, pos_list[2*t.i + 2] as bx"
            f" from {polys}, unnest(generate_series(1, len(pos_list) // 2 - 1)) t(i)"
        )
    ix_lo, iy_lo = geo.quad_ixy("least(ay, by_)", "least(ax, bx)", res, d)
    ix_hi, iy_hi = geo.quad_ixy("greatest(ay, by_)", "greatest(ax, bx)", res, d)
    if d == SPARK:
        cells = (
            f"select zone_id, ay, ax, by_, bx, cy, explode(sequence(ixl, ixh)) as cx"
            f" from (select zone_id, ay, ax, by_, bx, {ix_lo} as ixl, {ix_hi} as ixh,"
            f" explode(sequence({iy_lo}, {iy_hi})) as cy from ({segs}))"
        )
    else:
        cells = (
            f"select zone_id, ay, ax, by_, bx, cy.y as cy, cx.x as cx"
            f" from ({segs}) s,"
            f" unnest(generate_series({iy_lo}, {iy_hi})) cy(y),"
            f" unnest(generate_series({ix_lo}, {ix_hi})) cx(x)"
        )
    x0 = f"(-180.0e0 + cast(cx as double) * {q.flit(cw)})"
    x1 = f"(-180.0e0 + cast(cx + 1 as double) * {q.flit(cw)})"
    y0 = f"(-90.0e0 + cast(cy as double) * {q.flit(ch)})"
    y1 = f"(-90.0e0 + cast(cy + 1 as double) * {q.flit(ch)})"
    slab = (
        f"case when bx = ax then (ax >= {x0} and ax <= {x1}) "
        f"when by_ = ay then (ay >= {y0} and ay <= {y1}) "
        f"else greatest("
        f"least(({x0} - ax) / (bx - ax), ({x1} - ax) / (bx - ax)), "
        f"least(({y0} - ay) / (by_ - ay), ({y1} - ay) / (by_ - ay)), 0.0e0)"
        f" <= least("
        f"greatest(({x0} - ax) / (bx - ax), ({x1} - ax) / (bx - ax)), "
        f"greatest(({y0} - ay) / (by_ - ay), ({y1} - ay) / (by_ - ay)), 1.0e0) end"
    )
    # the pure-vertical/-horizontal cases above skip the OTHER axis's slab:
    # restore it by re-checking the bbox explode already bounds that axis
    cell = geo.quad_pack("cx", "cy", res)
    return f"""
        select {cell} as cell,
               cast(count(*) as bigint) as n_segs,
               cast(count(distinct zone_id) as bigint) as n_zones
        from ({cells}) c
        where {slab}
        group by 1"""


def q_line_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_line_raster_sql(SPARK))


def q_line_raster_oracle() -> str:
    return _line_raster_sql(DUCK)


# ---------------------------------------------------------------------------
# TPC-H Q6 and Q14 shapes (filters-only agg; join with ratio-of-sums)
# ---------------------------------------------------------------------------
def _tpch_q6_sql(d: str) -> str:
    """TPC-H Q6 shape — the forecasting-revenue-change scan: ONE fact table,
    THREE pushed-down range predicates, no join, no group — the purest
    predicate-pushdown / scan-throughput probe in the suite.  Revenue
    (extendedprice × discount) quantized per row to int 1e-4 before the sum
    (the engine's TPC-H idiom)."""
    return """
        select cast(count(*) as bigint) as n_lines,
               cast(sum(cast(floor(l_extendedprice * l_discount
                    * 1.0e4 + 0.5e0) as bigint)) as bigint) as revenue_q4
        from lineitem
        where l_shipdate >= timestamp '1996-01-01 00:00:00'
          and l_shipdate <  timestamp '1997-01-01 00:00:00'
          and l_discount >= 0.03e0 and l_discount <= 0.05e0
          and l_quantity < 24.0e0"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q6_sql(SPARK))


def q_tpch_q6_oracle() -> str:
    return _tpch_q6_sql(DUCK)


def _tpch_q14_sql(d: str) -> str:
    """TPC-H Q14 shape — promo revenue share: fact→part join with a
    CONDITIONAL numerator over the same aggregate pass (promo vs total), a
    ratio of two integer-quantized sums, one final division; the testdata's
    p_type carries real 'PROMO ...' values so the predicate is verbatim."""
    promo = "p_type like 'PROMO%'"
    rev = "cast(floor(l_extendedprice * (1.0e0 - l_discount) * 1.0e4 + 0.5e0) as bigint)"
    return f"""
        select cast(sum(case when {promo} then {rev} else 0 end) as bigint)
                   as promo_rev_q4,
               cast(sum({rev}) as bigint) as total_rev_q4,
               round(100.0e0 * cast(sum(case when {promo} then {rev} else 0 end)
                     as double) / cast(sum({rev}) as double), 9) as promo_pct
        from lineitem
        join part on p_partkey = l_partkey
        where l_shipdate >= timestamp '1996-09-01 00:00:00'
          and l_shipdate <  timestamp '1996-10-01 00:00:00'"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q14_sql(SPARK))


def q_tpch_q14_oracle() -> str:
    return _tpch_q14_sql(DUCK)


# ---------------------------------------------------------------------------
# Marketing attribution: first/last touch within a lookback window
# ---------------------------------------------------------------------------
_ATTR_WIN_US = 7 * 86400 * 1_000_000  # 7-day lookback, integer micros


def _attribution_sql(d: str) -> str:
    """Per conversion ('purchase'), the FIRST- and LAST-touch among the
    user's 'click'/'view' events in a 7-day lookback, plus the touch count
    — the single-pass form of first-/last-touch attribution.  (ts, type)
    packs into one bigint (ts_us·2 + type bit), so both extremes are plain
    min/max over a numeric RANGE frame — no struct aggregates, no
    self-join; conversions with no touch in window coalesce to
    ('none', 0).

    Exactness: integer micros and packed bigints end to end; RANGE
    CURRENT ROW includes equal-ts peers identically in both engines, and
    min/max over packed values is total-ordered.

    Scale: ONE user-keyed sort serves all three window aggregates; the
    corpus crosses the shuffle once."""
    # NTZ-safe integer micros (the temporal.py idiom): timestampdiff is
    # timezone-free, matching DuckDB's epoch_us on the same NTZ values
    ts_us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
        " as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    win = f"range between {_ATTR_WIN_US} preceding and current row"
    w = f"over (partition by user_id order by ts_us {win})"
    dv = "div" if d == SPARK else "//"
    return f"""
        with ev as (
            select user_id, event_id, event_type, {ts_us} as ts_us
            from events where event_type in ('purchase', 'click', 'view')
        ),
        base as (
            select user_id, event_id, event_type, ts_us,
                   case when event_type in ('click', 'view') then 1 else 0 end
                       as is_touch,
                   case when event_type in ('click', 'view') then
                        ts_us * 2 + (case when event_type = 'view' then 1
                                          else 0 end) end as packed
            from ev
        ),
        wnd as (
            select user_id, event_id, event_type, ts_us,
                   min(case when is_touch = 1 then packed end) {w} as first_p,
                   max(case when is_touch = 1 then packed end) {w} as last_p,
                   sum(is_touch) {w} as n_touches
            from base
        )
        select event_id, user_id, ts_us,
               coalesce(case when first_p % 2 = 1 then 'view'
                             when first_p is not null then 'click' end,
                        'none') as first_touch,
               cast(coalesce(first_p {dv} 2, 0) as bigint) as first_ts_us,
               coalesce(case when last_p % 2 = 1 then 'view'
                             when last_p is not null then 'click' end,
                        'none') as last_touch,
               cast(coalesce(last_p {dv} 2, 0) as bigint) as last_ts_us,
               cast(n_touches as bigint) as n_touches
        from wnd where event_type = 'purchase'"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_attribution_sql(SPARK))


def q_attribution_oracle() -> str:
    return _attribution_sql(DUCK)


# ---------------------------------------------------------------------------
# Google Encoded Polyline (interchange format for zone rings / tracks)
# ---------------------------------------------------------------------------
def _polyline_encode_sql(d: str) -> str:
    """Per zone, the Google Encoded Polyline Algorithm Format string of its
    ring: 1e-5 quantize (floor(x·1e5+0.5) both dialects), same-axis deltas,
    zigzag, 5-bit little-endian chunks with continuation bit, +63 ASCII —
    verified against the algorithm's published worked example
    ('_p~iF~ps|U_ulLnnqC_mqNvxq`@').  The wire format map APIs exchange
    routes in, as a pure scan-parallel projection.

    Scale: zone-table-sized; zero joins, zero shuffles beyond the scan."""
    if d == SPARK:
        chunk = (
            "case when i = 0 or shiftright(v, 5*i) > 0 then "
            "char(cast((shiftright(v, 5*i) & 31) + "
            "(case when shiftright(v, 5*(i+1)) > 0 then 32 else 0 end) + 63 as int)) "
            "else '' end"
        )
        enc = f"concat_ws('', transform(sequence(0, 6), i -> {chunk}))"
        return f"""
            select zone_id, cast(size(pos_list) div 2 as bigint) as n_pts,
                   concat_ws('', transform(zz, v -> {enc})) as polyline
            from (
              select zone_id, pos_list,
                     transform(dl, x -> case when x >= 0 then 2*x else -2*x - 1 end) as zz
              from (
                select zone_id, pos_list,
                       transform(sequence(1, size(pos_list)), i ->
                         element_at(qq, cast(i as int)) -
                         (case when i > 2 then element_at(qq, cast(i - 2 as int))
                               else cast(0 as bigint) end)) as dl
                from (
                  select zone_id, pos_list,
                         transform(pos_list, x ->
                           cast(floor(x * 1.0e5 + 0.5e0) as bigint)) as qq
                  from geo_polys)))"""
    from . import queries as q

    chunk = (
        "case when i = 0 or (v >> (5*i)) > 0 then "
        "chr(cast(((v >> (5*i)) & 31) + "
        "(case when (v >> (5*(i+1))) > 0 then 32 else 0 end) + 63 as integer)) "
        "else '' end"
    )
    enc = f"list_aggregate(list_transform(generate_series(0, 6), i -> {chunk}), 'string_agg', '')"
    return f"""
        select zone_id, cast(len(pos_list) // 2 as bigint) as n_pts,
               list_aggregate(list_transform(zz, v -> {enc}), 'string_agg', '')
                   as polyline
        from (
          select zone_id, pos_list,
                 list_transform(dl, x -> case when x >= 0 then 2*x else -2*x - 1 end) as zz
          from (
            select zone_id, pos_list,
                   list_transform(generate_series(1, len(pos_list)), i ->
                     qq[i] - (case when i > 2 then qq[i-2]
                                   else cast(0 as bigint) end)) as dl
            from (
              select zone_id, pos_list,
                     list_transform(pos_list, x ->
                       cast(floor(x * 1.0e5 + 0.5e0) as bigint)) as qq
              from ({q.polys_sql(DUCK)}) geo_polys)))"""


def q_polyline_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_polyline_encode_sql(SPARK))


def q_polyline_encode_oracle() -> str:
    return _polyline_encode_sql(DUCK)


def _polyline_roundtrip_sql(d: str) -> str:
    """Self-checking inverse: decode every zone's encoded polyline back to
    quantized coordinates entirely in SQL (chunk regrouping by
    continuation bit via one cumulative window, 5-bit shifts, zigzag
    undo, per-axis prefix sums) and emit the max abs error vs the
    quantized original ring — 0 for every zone proves encode/decode are
    exact inverses inside BOTH engines, not just in the Python replay.

    Scale: string explode is ∝ encoded length over the zone DIMENSION;
    windows partition by zone; the corpus is never touched."""
    enc = _polyline_encode_sql(d)
    if d == SPARK:
        chars = (
            "select zone_id, i, ascii(substring(polyline, i, 1)) - 63 as code "
            "from (select zone_id, polyline, "
            "explode(sequence(1, length(polyline))) as i from enc)"
        )
        shift = "cast(shiftleft(cast(1 as bigint), cast(5 * (i - min_i) as int)) as bigint)"
        dv = "div"
        orig = (
            "select zone_id, cast((k - 1) as bigint) div 2 as pt, (k - 1) % 2 as axis, "
            "cast(floor(element_at(pos_list, cast(k as int)) * 1.0e5 + 0.5e0) as bigint) as q5 "
            "from (select zone_id, pos_list, "
            "explode(sequence(1, size(pos_list))) as k from geo_polys)"
        )
    else:
        from . import queries as q

        chars = (
            "select zone_id, t.i as i, ascii(polyline[t.i]) - 63 as code "
            "from enc, unnest(generate_series(1, length(polyline))) t(i)"
        )
        shift = "(cast(1 as bigint) << cast(5 * (i - min_i) as integer))"
        dv = "//"
        orig = (
            f"select zone_id, cast((t.k - 1) as bigint) // 2 as pt, (t.k - 1) % 2 as axis, "
            f"cast(floor(pos_list[t.k] * 1.0e5 + 0.5e0) as bigint) as q5 "
            f"from ({q.polys_sql(DUCK)}) geo_polys, "
            f"unnest(generate_series(1, len(pos_list))) t(k)"
        )
    return f"""
        with enc as ({enc}),
        chars as ({chars}),
        grp as (
            select zone_id, i, code,
                   coalesce(sum(case when code < 32 then 1 else 0 end)
                       over (partition by zone_id order by i
                             rows between unbounded preceding and 1 preceding),
                       0) as g
            from chars
        ),
        vals as (
            select zone_id, g,
                   cast(sum((code % 32) * {shift}) as bigint) as z
            from (select zone_id, i, code, g,
                         min(i) over (partition by zone_id, g) as min_i
                  from grp) t
            group by zone_id, g
        ),
        deltas as (
            select zone_id, g,
                   case when z % 2 = 1 then -((z + 1) {dv} 2)
                        else z {dv} 2 end as dd
            from vals
        ),
        coords as (
            select zone_id, g {dv} 2 as pt, g % 2 as axis,
                   sum(dd) over (partition by zone_id, g % 2 order by g) as q
            from deltas
        ),
        orig as ({orig}),
        joined as (
            select o.zone_id, abs(c.q - o.q5) as err
            from orig o join coords c
              on c.zone_id = o.zone_id and c.pt = o.pt and c.axis = o.axis
        )
        select zone_id, cast(count(*) as bigint) as n_vals,
               cast(max(err) as bigint) as max_abs_err
        from joined group by zone_id"""


def q_polyline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_polyline_roundtrip_sql(SPARK))


def q_polyline_roundtrip_oracle() -> str:
    return _polyline_roundtrip_sql(DUCK)


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation per source (completes the rank pair)
# ---------------------------------------------------------------------------
def _kendall_sql(d: str) -> str:
    """Kendall's τ-b with full tie correction over the SAME variable pair
    as spearman (n_chars vs distinct-token count, per source): τ-b =
    (C − D) / sqrt((n0 − n1)(n0 − n2)) with n0 = n(n−1)/2 and n1/n2 the
    x-/y-tie pair counts — the concordance-based complement to Spearman's
    rank-Pearson (τ weights pair ORDER agreement, not rank distance,
    and is the robust choice under heavy ties).

    Exactness: C, D, and every tie count are exact bigints from integer
    comparisons; ONE sqrt of exact integer products and one division at
    the end, rounded to 1e-9.

    Scale: the pairwise join is GROUP-bounded (doc_id_a < doc_id_b within
    source — the Theil-Sen posture, never cross-source); tie counts are
    two dimension-sized aggregates."""
    from ..functions import text as tx

    toks = tx.tokens("text", d)
    ntypes = (
        f"cast(size(array_distinct({toks})) as bigint)"
        if d == SPARK
        else f"cast(len(list_distinct({toks})) as bigint)"
    )
    return f"""
        with base as (
            select source, doc_id, cast(n_chars as bigint) as x, {ntypes} as y
            from documents
        ),
        cd as (
            select a.source,
                   cast(sum(case when (a.x - b.x) * (a.y - b.y) > 0
                            then 1 else 0 end) as bigint) as c_pairs,
                   cast(sum(case when (a.x - b.x) * (a.y - b.y) < 0
                            then 1 else 0 end) as bigint) as d_pairs
            from base a join base b
              on b.source = a.source and a.doc_id < b.doc_id
            group by a.source
        ),
        n_tot as (select source, cast(count(*) as bigint) as n from base group by source),
        tx_ as (
            select source,
                   cast(sum(c * (c - 1) / 2) as bigint) as n1
            from (select source, x, cast(count(*) as bigint) as c
                  from base group by source, x) t group by source
        ),
        ty_ as (
            select source,
                   cast(sum(c * (c - 1) / 2) as bigint) as n2
            from (select source, y, cast(count(*) as bigint) as c
                  from base group by source, y) t group by source
        )
        select n_tot.source, n_tot.n,
               cast(c_pairs - d_pairs as bigint) as c_minus_d,
               round(cast(c_pairs - d_pairs as double)
                     / nullif(sqrt((cast(n_tot.n as double) * cast(n_tot.n - 1 as double) / 2.0e0
                                    - cast(n1 as double))
                                   * (cast(n_tot.n as double) * cast(n_tot.n - 1 as double) / 2.0e0
                                      - cast(n2 as double))),
                              0.0e0), 9) as tau_b
        from n_tot
        join cd on cd.source = n_tot.source
        join tx_ on tx_.source = n_tot.source
        join ty_ on ty_.source = n_tot.source"""


def q_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_kendall_sql(SPARK))


def q_kendall_oracle() -> str:
    return _kendall_sql(DUCK)


# ---------------------------------------------------------------------------
# Map-matching quality diagnostics per trajectory
# ---------------------------------------------------------------------------
def q_match_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per trajectory over the gated map_match output: matched-step count,
    total/mean emission (how far the track sits from its matched segments)
    and the switch count (path smoothness) — the acceptance numbers a
    map-matching pipeline monitors.  One traj-keyed window + groupBy on
    the (tiny) match table; composes the already-gated operator."""
    from pyspark.sql import Window

    from . import queries as q

    mm = q.q_map_match(spark, sf_dir)
    w = Window.partitionBy("traj_id").orderBy("step")
    st = mm.select(
        "traj_id", "step", "emis_mm",
        F.when(
            (F.lag("zone_id").over(w).isNotNull())
            & (
                (F.lag("zone_id").over(w) != F.col("zone_id"))
                | (F.lag("seg_idx").over(w) != F.col("seg_idx"))
            ),
            1,
        )
        .otherwise(0)
        .alias("sw"),
    )
    return st.groupBy("traj_id").agg(
        F.count("*").cast("long").alias("n_steps"),
        F.sum("emis_mm").cast("long").alias("total_emis_mm"),
        F.sum("sw").cast("long").alias("n_switches"),
        F.round(
            F.sum("emis_mm").cast("double") / F.count("*").cast("double"), 6
        ).alias("mean_emis_mm"),
    )


def q_match_quality_oracle() -> str:
    from . import queries as q

    return f"""
        with mm as ({q.q_map_match_oracle()})
        select traj_id,
               cast(count(*) as bigint) as n_steps,
               cast(sum(emis_mm) as bigint) as total_emis_mm,
               cast(sum(sw) as bigint) as n_switches,
               round(cast(sum(emis_mm) as double)
                     / cast(count(*) as double), 6) as mean_emis_mm
        from (
            select traj_id, emis_mm,
                   case when lag(zone_id) over w is not null
                             and (lag(zone_id) over w <> zone_id
                                  or lag(seg_idx) over w <> seg_idx)
                        then 1 else 0 end as sw
            from mm
            window w as (partition by traj_id order by step)
        ) t group by traj_id"""


# ---------------------------------------------------------------------------
# Content-defined chunking (FastCDC-style) + sub-document dedup stats
# ---------------------------------------------------------------------------
_CDC_W = 16      # local hash window (chars)
_CDC_MASK = 64   # boundary iff window-hash % mask == 0 (expected chunk ~64)


def _cdc_chunks_sql(d: str) -> str:
    """Content-defined chunk boundaries per document: a position ends a
    chunk iff the portable hash of the LAST 16 characters is ≡ 0 mod 64 —
    boundaries depend only on a local window, so an insertion re-chunks
    only its neighbourhood (the CDC property fixed-window span dedup
    lacks), and identical passages align to identical chunks across
    documents.  Output: one corpus row (n_chunks, n_distinct,
    n_cross_doc, mean_len) — the sub-document duplication report.

    Exactness: boundary decisions and chunk ids are the portable md5 hash;
    lengths are ints; ONE rounded division for mean_len.

    Scale: per-doc HOFs (one md5 per character position — scan-parallel,
    no joins); the chunk table aggregates map-side; cross-doc dup is a
    chunk-hash-keyed count-distinct, dimension-sized."""
    from ..functions.portable import phash60

    n = "length(text)"
    win_h = phash60(f"substring(text, i - {_CDC_W - 1}, {_CDC_W})", d)
    chunk_h = phash60("substring(text, element_at(cuts, cast(k as int)) + 1, "
                      "element_at(cuts, cast(k + 1 as int)) - element_at(cuts, cast(k as int)))", d) \
        if d == SPARK else phash60("substring(text, cuts[k] + 1, cuts[k + 1] - cuts[k])", d)
    if d == SPARK:
        empty = "slice(sequence(cast(0 as bigint), cast(0 as bigint)), 1, 0)"
        bnd = (f"if({n} >= {_CDC_W}, "
               f"filter(sequence(cast({_CDC_W} as bigint), cast({n} as bigint)), "
               f"i -> {win_h} % {_CDC_MASK} = 0), {empty})")
        cuts = (f"concat(array(cast(0 as bigint)), {bnd}, "
                f"array(cast({n} as bigint)))")
        chunks = (
            f"filter(transform(sequence(1, size(cuts) - 1), k -> named_struct("
            f"'len', element_at(cuts, cast(k + 1 as int)) - element_at(cuts, cast(k as int)), "
            f"'h', {chunk_h})), c -> c.len > 0)"
        )
        doc = (f"select doc_id, explode({chunks}) as c from "
               f"(select doc_id, text, {cuts} as cuts from documents)")
    else:
        bnd = (f"list_filter(generate_series({_CDC_W}, {n}), "
               f"i -> {win_h} % {_CDC_MASK} = 0)")
        cuts = f"([cast(0 as bigint)] || {bnd} || [cast({n} as bigint)])"
        chunks = (
            f"list_filter(list_transform(generate_series(1, len(cuts) - 1), "
            f"k -> struct_pack(len := cuts[k + 1] - cuts[k], h := {chunk_h})), "
            f"c -> c.len > 0)"
        )
        doc = (f"select doc_id, unnest({chunks}) as c from "
               f"(select doc_id, text, {cuts} as cuts from documents)")
    hh = "c.h" if d == SPARK else "c['h']"
    ll = "c.len" if d == SPARK else "c['len']"
    return f"""
        with ch as (select doc_id, {hh} as h, {ll} as len from ({doc}) t),
        cross_doc as (
            select h from ch group by h having count(distinct doc_id) > 1
        )
        select cast(count(*) as bigint) as n_chunks,
               cast(count(distinct h) as bigint) as n_distinct,
               (select cast(count(*) as bigint) from cross_doc) as n_cross_doc,
               round(cast(sum(len) as double) / cast(count(*) as double), 6)
                   as mean_len
        from ch"""


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_cdc_chunks_sql(SPARK))


def q_cdc_chunks_oracle() -> str:
    return _cdc_chunks_sql(DUCK)


_CDC_MAX_DF = 50   # postings guardrail: drop chunk hashes in > max_df docs
_CDC_MIN_SHARED = 2


def _cdc_pairs_sql(d: str) -> str:
    """Document pairs sharing ≥ 2 content-defined chunks — the EXACT
    shared-passage pair finder (a quote or boilerplate block shared by two
    docs aligns to identical chunks regardless of position).  Complements
    the similarity family: MinHash finds high-overlap docs, this finds
    specific copied passages at any overall similarity.

    Scale: postings self-join keyed on chunk hash with the containment
    guardrail (df ≤ 50 — drop boilerplate chunks every doc shares);
    pair fan-out Θ(Σ df²) over the FILTERED postings."""
    doc_sql = _cdc_chunks_sql(d)
    # reuse only the chunk explode (everything before the final agg)
    body = doc_sql.split("with ch as (", 1)[1].split("),\n        cross_doc", 1)[0]
    return f"""
        with raw as ({body}),
        ch as (select distinct doc_id, h from raw),
        keep as (
            select h from ch group by h
            having count(*) <= {_CDC_MAX_DF}
        ),
        p as (
            select a.doc_id as doc_a, b.doc_id as doc_b,
                   cast(count(*) as bigint) as n_shared
            from ch a
            join keep k on k.h = a.h
            join ch b on b.h = a.h and a.doc_id < b.doc_id
            group by a.doc_id, b.doc_id
        )
        select doc_a, doc_b, n_shared from p
        where n_shared >= {_CDC_MIN_SHARED}"""


def q_cdc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_cdc_pairs_sql(SPARK))


def q_cdc_pairs_oracle() -> str:
    return _cdc_pairs_sql(DUCK)


def _tpch_q17_sql(d: str) -> str:
    """TPC-H Q17 shape — small-quantity-order revenue: the CORRELATED
    scalar-subquery pattern (l_quantity < 0.2 · per-part average), planned
    as a per-part aggregate joined back to the fact.  The fractional
    predicate is made integer-exact: l_quantity is integral in this data,
    so q < 0.2·(sum/cnt) ⟺ 5·q·cnt < sum — bigint comparison, no float
    average anywhere (a parallel double avg would be fold-order-dependent).

    Scale: one map-side-combined per-part aggregate, broadcast back; the
    fact is scanned twice (agg + probe) — the standard Q17 plan."""
    return """
        select cast(count(*) as bigint) as n_lines,
               cast(sum(cast(floor(l_extendedprice * 1.0e4 + 0.5e0) as bigint))
                    as bigint) as revenue_q4
        from lineitem
        join part on p_partkey = l_partkey
        join (select l_partkey as pk,
                     cast(sum(cast(l_quantity as bigint)) as bigint) as sq,
                     cast(count(*) as bigint) as cnt
              from lineitem group by l_partkey) a on a.pk = l_partkey
        where p_brand in ('Brand#1', 'Brand#2', 'Brand#3')
          and 5 * cast(l_quantity as bigint) * cnt < sq"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q17_sql(SPARK))


def q_tpch_q17_oracle() -> str:
    return _tpch_q17_sql(DUCK)


def _tpch_q15_sql(d: str) -> str:
    """TPC-H Q15 shape — top supplier(s) by 3-month revenue: the
    argmax-over-aggregate pattern (view + global max + equality join in the
    original), planned as one supplier aggregate reused for both the max
    and the probe.  Revenue integer-quantized per row before the sum, so
    the global max and the equality filter are exact bigint comparisons —
    ties kept, as the spec requires."""
    return """
        with rev as (
            select l_suppkey as supplier_no,
                   cast(sum(cast(floor(l_extendedprice * (1.0e0 - l_discount)
                        * 1.0e4 + 0.5e0) as bigint)) as bigint) as total_q4
            from lineitem
            where l_shipdate >= timestamp '1996-01-01 00:00:00'
              and l_shipdate <  timestamp '1996-04-01 00:00:00'
            group by l_suppkey
        )
        select s_suppkey, s_name, total_q4
        from supplier join rev on supplier_no = s_suppkey
        where total_q4 = (select max(total_q4) from rev)"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q15_sql(SPARK))


def q_tpch_q15_oracle() -> str:
    return _tpch_q15_sql(DUCK)


def register_r5(QUERIES: dict) -> None:
    QUERIES["embedding_near_dup_ensemble"] = (
        q_embed_near_dup_ensemble,
        q_embed_near_dup_ensemble_oracle,
    )
    QUERIES["embedding_recall"] = (q_embed_recall, q_embed_recall_oracle)
    QUERIES["frechet_join"] = (q_frechet_join, q_frechet_join_oracle)
    QUERIES["st_dbscan"] = (q_st_dbscan, q_st_dbscan_oracle)
    QUERIES["rbo_eval"] = (q_rbo_eval, q_rbo_eval_oracle)
    QUERIES["leakage_safe_split"] = (q_leakage_safe_split, q_leakage_safe_split_oracle)
    QUERIES["line_raster"] = (q_line_raster, q_line_raster_oracle)
    QUERIES["tpch_q6"] = (q_tpch_q6, q_tpch_q6_oracle)
    QUERIES["tpch_q14"] = (q_tpch_q14, q_tpch_q14_oracle)
    QUERIES["attribution"] = (q_attribution, q_attribution_oracle)
    QUERIES["polyline_encode"] = (q_polyline_encode, q_polyline_encode_oracle)
    QUERIES["polyline_roundtrip"] = (q_polyline_roundtrip, q_polyline_roundtrip_oracle)
    QUERIES["kendall_tau"] = (q_kendall, q_kendall_oracle)
    QUERIES["match_quality"] = (q_match_quality, q_match_quality_oracle)
    QUERIES["cdc_chunks"] = (q_cdc_chunks, q_cdc_chunks_oracle)
    QUERIES["cdc_dedup_pairs"] = (q_cdc_pairs, q_cdc_pairs_oracle)
    QUERIES["tpch_q17"] = (q_tpch_q17, q_tpch_q17_oracle)
    QUERIES["tpch_q15"] = (q_tpch_q15, q_tpch_q15_oracle)
