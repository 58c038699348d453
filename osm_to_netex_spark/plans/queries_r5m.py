"""Round-5 batch M (SURVEY §2.3 `(r5)` rows): road-edge elevation
profiles (the raster↔vector overlay the north star names — elevation
along the routing network) and the corpus novelty curve (the
dedup-monitoring statistic over shingle first-occurrence).

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects where syntax allows, exact integer folds, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK


# ---------------------------------------------------------------------------
# Edge elevation profiles (way_split edges × elevation raster)
# ---------------------------------------------------------------------------
def _edge_profiles_sql(d: str) -> str:
    """Elevation profile per routing edge: the way_split edges (road
    lattice between junctions) sample the elevation raster at every node
    they traverse, yielding per-edge start/end/min/max elevation, total
    climb, and the grade — the raster↔vector overlay that prices road
    segments for routing (the north star's "elevation overlays" made
    concrete, composing two gated operators).

    Exactness: elevations are exact 1e-3 integers; the climb is a sum of
    positive consecutive differences folded per edge over the integer
    node order; the grade is one float division of exact operands.

    Scale: the way_split machinery (junction aggregate + way window) +
    ONE lattice equi-join of way nodes against the raster + an
    edge-keyed map-side-combined aggregate; the raster join is keyed on
    the packed node id — no geometry math at all."""
    from .queries_r5d import _raster
    from .queries_r5e import _way_split_sql, _ways_sql

    # node_id packs iy*100000+ix; unpack to join the raster
    div = "div" if d == SPARK else "//"
    split_body = _way_split_sql(d).split("with ", 1)[1]
    return f"""
        with ras0 as ({_raster(d)}),
        ras as (
            select iy * 100000 + ix as node_id,
                   cast(floor(value * 1.0e3 + 0.5e0) as bigint) as z_q3
            from ras0
        ),
        {split_body.rsplit("select cast(way_id", 1)[0].rstrip()},
        edges as (
            select way_id,
                   cast(cut_idx as bigint) as edge_idx,
                   pos as pos_from, next_pos as pos_to
            from cuts where next_pos is not null
        ),
        nodez as (
            select w.way_id, w.pos, r.z_q3,
                   lag(r.z_q3) over (partition by w.way_id order by w.pos)
                       as prev_z
            from ways w join ras r on r.node_id = w.node_id
        ),
        seg as (
            select e.way_id, e.edge_idx, n.pos, n.z_q3,
                   case when n.pos > e.pos_from and n.prev_z is not null
                        and n.z_q3 > n.prev_z
                   then n.z_q3 - n.prev_z else 0 end as climb
            from edges e
            join nodez n on n.way_id = e.way_id
                 and n.pos >= e.pos_from and n.pos <= e.pos_to
        )
        select way_id, edge_idx,
               cast(count(*) as bigint) as n_nodes,
               cast(min(z_q3) as bigint) as z_min_q3,
               cast(max(z_q3) as bigint) as z_max_q3,
               cast(sum(climb) as bigint) as climb_q3,
               round(cast(max(z_q3) - min(z_q3) as double)
                     / (1000.0e0 * cast(count(*) - 1 as double)), 9)
                   as relief_per_step
        from seg
        group by way_id, edge_idx"""


def q_edge_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)
    return spark.sql(_edge_profiles_sql(SPARK))


def q_edge_profiles_oracle() -> str:
    return _edge_profiles_sql(DUCK)


# ---------------------------------------------------------------------------
# Corpus novelty curve (shingle first-occurrence by ingestion order)
# ---------------------------------------------------------------------------
_NV_SHINGLE = 5


def _novelty_sql(d: str) -> str:
    """Per document (in doc_id ingestion order): how many of its 5-gram
    word shingles appear here for the FIRST time in the corpus — the
    novelty curve dataset curators watch to decide when a source is
    mined out (marginal novel-shingle yield under exact substring
    dedup).  A shingle's owner is its minimum doc_id; novelty =
    owned-shingles / distinct-shingles, as exact integers.

    Scale: one shingle explode (scan-parallel), one shingle-keyed
    min-aggregate (map-side-combined — the exact-dedup shuffle), one
    doc-keyed count join back; novelty never needs pairwise comparison."""
    if d == SPARK:
        toks = (
            "select doc_id, posexplode(filter(split(lower(text), "
            "'[^a-z0-9]+'), t -> t <> '')) as (pos, tok) from documents"
        )
        sh = (
            "select doc_id, pos, concat_ws(' ', tok, "
            + ", ".join(
                f"lead(tok, {k}) over (partition by doc_id order by pos)"
                for k in range(1, _NV_SHINGLE)
            )
            + ") as shingle, "
            + f"lead(tok, {_NV_SHINGLE - 1}) over (partition by doc_id "
            "order by pos) as last_tok from toks"
        )
    else:
        toks = (
            "select doc_id, t.i - 1 as pos, arr[t.i] as tok from "
            "(select doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), t -> t <> '') as arr from documents) a, "
            "unnest(generate_series(1, len(arr))) t(i)"
        )
        sh = (
            "select doc_id, pos, concat_ws(' ', tok, "
            + ", ".join(
                f"lead(tok, {k}) over (partition by doc_id order by pos)"
                for k in range(1, _NV_SHINGLE)
            )
            + ") as shingle, "
            + f"lead(tok, {_NV_SHINGLE - 1}) over (partition by doc_id "
            "order by pos) as last_tok from toks"
        )
    return f"""
        with toks as ({toks}),
        sh as ({sh}),
        shing as (
            select distinct doc_id, shingle from sh where last_tok is not null
        ),
        owner as (
            select shingle, cast(min(doc_id) as bigint) as owner_doc
            from shing group by shingle
        )
        select s.doc_id,
               cast(count(*) as bigint) as n_shingles,
               cast(sum(case when o.owner_doc = s.doc_id then 1 else 0 end)
                    as bigint) as n_novel,
               cast((sum(case when o.owner_doc = s.doc_id then 1 else 0 end)
                     * 1000000) {"div" if d == SPARK else "//"} count(*)
                    as bigint) as novelty_q6
        from shing s join owner o on o.shingle = s.shingle
        group by s.doc_id"""


def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_novelty_sql(SPARK))


def q_novelty_oracle() -> str:
    return _novelty_sql(DUCK)


def register_r5m(QUERIES: dict) -> None:
    QUERIES["edge_profiles"] = (q_edge_profiles, q_edge_profiles_oracle)
    QUERIES["novelty_curve"] = (q_novelty, q_novelty_oracle)
