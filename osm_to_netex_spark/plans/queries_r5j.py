"""Round-5 batch J (SURVEY §2.3 `(r5)` rows): embedding drift monitor,
binary-quantized vector search with recall eval, geodesic densification.

Landing discipline as everywhere (LANDING.md): dual-dialect SQL, exact
integer folds (embedding component sums quantized 1e-3 BEFORE any
cross-row aggregation; Hamming distances are integer bit_counts over two
32-bit sign words), deterministic tie-breaks, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK, haversine_m


def _emb_view(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )


# ---------------------------------------------------------------------------
# Embedding drift (per-label centroid divergence)
# ---------------------------------------------------------------------------
_DRIFT_DIM = 64


def _pos_explode_emb(d: str) -> str:
    if d == SPARK:
        return (
            "select label, pos, cast(floor(cast(v as double) * 1.0e3 + 0.5e0)"
            " as bigint) as v_q3 from (select label,"
            " posexplode(embedding) as (pos, v) from embeddings)"
        )
    return (
        "select label, t.i - 1 as pos, cast(floor(cast(embedding[t.i] as"
        " double) * 1.0e3 + 0.5e0) as bigint) as v_q3 from embeddings,"
        " unnest(generate_series(1, len(embedding))) t(i)"
    )


def _embedding_drift_sql(d: str) -> str:
    """Pairwise cosine between per-label embedding centroids — the drift
    monitor that flags when one corpus slice's representation departs
    from another's (or from its own last snapshot).  Cosine is computed
    on the component-SUM vectors (scale-invariant ⇒ identical to the
    mean-vector cosine), and those sums are exact bigints of 1e-3
    quantized components — no float fold crosses rows anywhere; the
    cosine is one fixed float sequence per label pair.

    Scale: one (label, dim) map-side-combined aggregate (label·64 rows),
    then an all-pairs join over the LABEL table — dimension-sized, never
    the corpus."""
    return f"""
        with comp as ({_pos_explode_emb(d)}),
        cent as (
            select label, pos, cast(sum(v_q3) as bigint) as s
            from comp group by label, pos
        ),
        pair as (
            select a.label as label_a, b.label as label_b,
                   cast(sum(a.s * b.s) as bigint) as dot,
                   cast(sum(a.s * a.s) as bigint) as naa,
                   cast(sum(b.s * b.s) as bigint) as nbb
            from cent a
            join cent b on b.pos = a.pos and a.label < b.label
            group by a.label, b.label
        )
        select label_a, label_b,
               round(cast(dot as double)
                     / (sqrt(cast(naa as double)) * sqrt(cast(nbb as double))),
                     9) as centroid_cos
        from pair"""


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    _emb_view(spark, sf_dir)
    return spark.sql(_embedding_drift_sql(SPARK))


def q_embedding_drift_oracle() -> str:
    return _embedding_drift_sql(DUCK)


# ---------------------------------------------------------------------------
# Binary-quantized search (sign bits + Hamming shortlist + exact rerank)
# ---------------------------------------------------------------------------
_BQ_QUERY_MOD = 97
_BQ_SHORTLIST = 32
_BQ_K = 10


def _bq_sql(d: str) -> str:
    """Binary-quantization ANN eval: vectors collapse to 64 sign bits
    (two 32-bit words — bit 63 of a single bigint would overflow
    engine-dependently), candidates shortlist by Hamming distance
    (integer bit_count over XOR), the shortlist reranks by exact cosine,
    and recall@10 is measured against the brute-force cosine top-10 per
    query — the modern vector-DB BQ pipeline end to end.

    Determinism: Hamming and its (distance, vec_id) tie-break are pure
    integers; the rerank rounds cosine to 1e-6 with a vec_id tie-break —
    the ann_recall conventions.

    Scale: the sign words are a scan projection; the query side
    (vec_id % 97) broadcasts against the word table, so the Hamming pass
    is corpus × queries with a 64-bit integer kernel — the cheap filter
    that makes the exact cosine run only on shortlist×queries.  Brute
    ground truth is the documented eval-only quadratic (lsh_recall
    posture)."""
    from ..operators.dedup import cosine_expr

    xor = (lambda a, b: f"({a} ^ {b})") if d == SPARK else (
        lambda a, b: f"xor({a}, {b})"
    )
    if d == SPARK:
        word = (
            lambda lo, hi: "aggregate(sequence({lo}, {hi}), cast(0 as bigint),"
            " (s, i) -> s + cast(case when cast(element_at(embedding,"
            " cast(i + 1 as int)) as double) > 0.0e0 then shiftleft(cast(1 as"
            " bigint), i - {lo}) else 0 end as bigint))".format(lo=lo, hi=hi)
        )
    else:
        word = (
            lambda lo, hi: "list_reduce(list_prepend(cast(0 as bigint),"
            " list_transform(generate_series({lo}, {hi}), i -> cast(case when"
            " cast(embedding[i + 1] as double) > 0.0e0 then (cast(1 as bigint)"
            " << (i - {lo})) else 0 end as bigint))), (s, v) -> s + v)".format(
                lo=lo, hi=hi
            )
        )
    cos = cosine_expr("q.embedding", "t.embedding", d)
    return f"""
        with sig as (
            select vec_id, embedding,
                   {word(0, 31)} as w_lo, {word(32, 63)} as w_hi
            from embeddings
        ),
        qs as (select * from sig where vec_id % {_BQ_QUERY_MOD} = 0),
        ham as (
            select q.vec_id as qid, t.vec_id as tid,
                   cast(bit_count({xor('q.w_lo', 't.w_lo')})
                        + bit_count({xor('q.w_hi', 't.w_hi')}) as bigint)
                       as hd,
                   row_number() over (
                       partition by q.vec_id
                       order by bit_count({xor('q.w_lo', 't.w_lo')})
                              + bit_count({xor('q.w_hi', 't.w_hi')}) asc,
                              t.vec_id asc) as hrk
            from qs q join sig t on t.vec_id <> q.vec_id
        ),
        rerank as (
            select h.qid, h.tid,
                   row_number() over (
                       partition by h.qid
                       order by round({cos}, 6) desc, h.tid asc) as rrk
            from ham h
            join embeddings q on q.vec_id = h.qid
            join embeddings t on t.vec_id = h.tid
            where h.hrk <= {_BQ_SHORTLIST}
        ),
        brute as (
            select q.vec_id as qid, t.vec_id as tid,
                   row_number() over (
                       partition by q.vec_id
                       order by round({cos}, 6) desc, t.vec_id asc) as brk
            from (select * from embeddings
                  where vec_id % {_BQ_QUERY_MOD} = 0) q
            join embeddings t on t.vec_id <> q.vec_id
        )
        select b.qid as query_id,
               cast(count(r.tid) as bigint) as n_hits,
               cast(count(r.tid) * 100000 as bigint) as recall_q6
        from brute b
        left join rerank r on r.qid = b.qid and r.tid = b.tid
             and r.rrk <= {_BQ_K}
        where b.brk <= {_BQ_K}
        group by b.qid"""


def q_bq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _emb_view(spark, sf_dir)
    return spark.sql(_bq_sql(SPARK))


def q_bq_search_oracle() -> str:
    return _bq_sql(DUCK)


# ---------------------------------------------------------------------------
# Geodesic densification
# ---------------------------------------------------------------------------
_DN_STEP_M = 500.0


def _densify_sql(d: str) -> str:
    """Per zone: vertex count, ring length, and the number of vertices a
    500 m geodesic densification inserts (k−1 per segment, k =
    ⌈len/step⌉) — the pre-processing step under raster sampling along
    boundaries and high-resolution buffering.  Segment lengths quantize
    to integer millimetres BEFORE the ceil-division, so the step count is
    an exact integer decision (the sub-mm rounding convention every
    distance query here uses).

    Scale: segment explode keyed by zone (the line_raster segs shape) +
    one zone-keyed map-side-combined aggregate; no lattice, no join."""
    from . import queries as q

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
    div = "div" if d == SPARK else "//"
    step_mm = int(_DN_STEP_M * 1000)
    leg_mm = (
        f"cast(floor({haversine_m('ay', 'ax', 'by_', 'bx', d)} * 1.0e3"
        f" + 0.5e0) as bigint)"
    )
    return f"""
        with segs as ({segs}),
        lens as (
            select zone_id, {leg_mm} as leg_mm,
                   ((({leg_mm}) + {step_mm} - 1) {div} {step_mm}) as k
            from segs
        )
        select zone_id,
               cast(count(*) as bigint) as n_segs,
               cast(sum(leg_mm) as bigint) as len_mm,
               cast(sum(greatest(k, 1) - 1) as bigint) as n_inserted
        from lens
        group by zone_id"""


def q_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_densify_sql(SPARK))


def q_densify_oracle() -> str:
    return _densify_sql(DUCK)


def register_r5j(QUERIES: dict) -> None:
    QUERIES["embedding_drift"] = (q_embedding_drift, q_embedding_drift_oracle)
    QUERIES["bq_search"] = (q_bq_search, q_bq_search_oracle)
    QUERIES["densify"] = (q_densify, q_densify_oracle)
