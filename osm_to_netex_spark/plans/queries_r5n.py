"""Round-5 batch N (SURVEY §2.3 `(r5)` rows): mutual-kNN embedding graph
and the spatial QA audit.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects where syntax allows, the ann_recall determinism conventions
(cosine rounded 1e-6, vec_id tie-breaks), exact integer outputs,
identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK

_MK_K = 5
# the brute rank runs over a deterministic id-sample universe (the
# embedding_recall convention) — bounds the eval-posture quadratic at
# every SF; the production path feeds the same reciprocal filter from
# the gated IVF/LSH candidate sets
_MK_MOD = 3


# ---------------------------------------------------------------------------
# Mutual-kNN graph (the backbone graph of semantic clustering/dedup)
# ---------------------------------------------------------------------------
def _mutual_knn_sql(d: str) -> str:
    """Mutual-kNN pairs over the embedding corpus: (a, b) is an edge iff
    b is in a's cosine top-5 AND a is in b's — the reciprocal filter that
    turns a noisy kNN into the high-precision graph semantic clustering
    pipelines (SemDeDup-style) build components on.  Determinism: cosine
    rounded 1e-6, vec_id tie-breaks, canonical a < b.

    Scale: the neighbor lists here come from the brute rank over a
    deterministic id-sample universe (vec_id % 3 = 0 — the
    embedding_recall convention, bounding the eval-posture quadratic at
    every SF); the production path feeds the same reciprocal filter from
    the IVF or LSH candidate sets already gated in this registry.  The
    mutual join itself is an ids-only self-join of two k·n row lists."""
    from ..operators.dedup import cosine_expr

    cos = cosine_expr("a.embedding", "b.embedding", d)
    return f"""
        with uni as (
            select vec_id, embedding from embeddings
            where vec_id % {_MK_MOD} = 0
        ),
        ranked as (
            select a.vec_id as src, b.vec_id as dst,
                   round({cos}, 6) as cos,
                   row_number() over (
                       partition by a.vec_id
                       order by round({cos}, 6) desc, b.vec_id asc) as rk
            from uni a join uni b on b.vec_id <> a.vec_id
        ),
        topk as (select src, dst, cos from ranked where rk <= {_MK_K})
        select f.src as vec_id_a, f.dst as vec_id_b,
               cast(floor(f.cos * 1.0e6 + 0.5e0) as bigint) as cos_q6
        from topk f
        join topk r on r.src = f.dst and r.dst = f.src
        where f.src < f.dst"""


def q_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_mutual_knn_sql(SPARK))


def q_mutual_knn_oracle() -> str:
    return _mutual_knn_sql(DUCK)


# ---------------------------------------------------------------------------
# Spatial QA audit (coverage gaps between the point and polygon layers)
# ---------------------------------------------------------------------------
def _spatial_qa_sql(d: str) -> str:
    """One-row spatial QA audit of the point↔polygon layers — the data
    quality gate a geo ingestion pipeline runs before publishing: points
    covered by no zone (orphans), points in ≥2 zones (overlap ambiguity),
    zones containing no point (empty), plus the layer sizes.  Exact
    integer counts from the same ray-cast predicate the `pip` operator
    gates.

    Scale: at audit scale the predicate join IS the pip cell-pruned join
    (this audit composes its result); counts are map-side-combined."""
    from ..functions import geo

    pred = geo.point_in_polygon("p.lat", "p.lon", "z.pos_list", d)
    return f"""hits as (
            select p.point_id, z.zone_id
            from geo_points p join geo_polys z on {pred}
        ),
        per_point as (
            select p.point_id, count(h.zone_id) as nz
            from geo_points p
            left join hits h on h.point_id = p.point_id
            group by p.point_id
        ),
        per_zone as (
            select z.zone_id, count(h.point_id) as np
            from geo_polys z
            left join hits h on h.zone_id = z.zone_id
            group by z.zone_id
        )
        select
            cast((select count(*) from geo_points) as bigint) as n_points,
            cast((select count(*) from geo_polys) as bigint) as n_zones,
            cast((select count(*) from per_point where nz = 0) as bigint)
                as n_orphan_points,
            cast((select count(*) from per_point where nz >= 2) as bigint)
                as n_ambiguous_points,
            cast((select count(*) from per_zone where np = 0) as bigint)
                as n_empty_zones,
            cast((select count(*) from hits) as bigint) as n_assignments"""


def q_spatial_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(f"with {_spatial_qa_sql(SPARK)}")


def q_spatial_qa_oracle() -> str:
    from . import queries as q

    return f"{q.duck_geometry_ctes()}, {_spatial_qa_sql(DUCK)}"


def register_r5n(QUERIES: dict) -> None:
    QUERIES["mutual_knn"] = (q_mutual_knn, q_mutual_knn_oracle)
    QUERIES["spatial_qa"] = (q_spatial_qa, q_spatial_qa_oracle)
