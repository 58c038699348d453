"""Driver-contract query suite: every operator as (Spark builder, DuckDB oracle).

Each query derives its geometry deterministically FROM the shared testdata
tables (customer → points, supplier → polygons) using only cross-engine-exact
arithmetic from functions.portable/geo — md5 hashing, +,*,/, floor, round —
and **no trigonometry** in any oracle-gated value (polygons are
square-perimeter stars, distances are equirectangular-squared), so the DuckDB
oracle reproduces the engine's outputs bit-for-bit and the driver's
value-hash gate is a real verification, not an echo.

The Spark side runs the *smart* plan (cell-pruned joins, broadcast hints,
window top-k); the oracle runs the naive semantic definition (brute-force
cross joins).  Agreement proves the pruning layers lose nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import geo, text as tx
from ..functions.portable import (
    DUCK, SPARK, concat_str, flit, haversine_m, phash60, prand, seq,
    transform as transform_,
)
from ..operators import dedup, sampling, textstats

BBOX = (59.4, 60.2, 9.6, 10.6)
LAT_LO, LAT_HI, LON_LO, LON_HI = BBOX
DLAT, DLON = LAT_HI - LAT_LO, LON_HI - LON_LO


def _pr(key_parts: list[str], d: str) -> str:
    return f"({phash60(concat_str(key_parts, d), d)} / {flit(float(2**60))})"


# ---------------------------------------------------------------------------
# derived geometry (shared SQL text per dialect)
# ---------------------------------------------------------------------------
def points_sql(d: str, table: str = "customer") -> str:
    """Deterministic points from customer keys (point_id, lat, lon)."""
    la = _pr(["'pt:lat:'", "c_custkey"], d)
    lo = _pr(["'pt:lon:'", "c_custkey"], d)
    return (
        f"select c_custkey as point_id, "
        f"{flit(LAT_LO)} + {la} * {flit(DLAT)} as lat, "
        f"{flit(LON_LO)} + {lo} * {flit(DLON)} as lon "
        f"from {table}"
    )


def polys_sql(d: str, table: str = "supplier") -> str:
    """Deterministic star polygons from supplier keys (zone_id, pos_list)."""
    pr_lat = _pr(["'z:lat:'", "s_suppkey"], d)
    clat = f"({flit(LAT_LO + 0.05)} + {pr_lat} * {flit(DLAT - 0.1)})"
    pr_lon = _pr(["'z:lon:'", "s_suppkey"], d)
    pr_rad = _pr(["'z:rad:'", "s_suppkey"], d)
    pr_nv = _pr(["'z:nv:'", "s_suppkey"], d)
    clon = f"({flit(LON_LO + 0.05)} + {pr_lon} * {flit(DLON - 0.1)})"
    # radius shrinks with √zone-count so aggregate zone area (and therefore
    # PIP hit density per point) stays constant across scale factors —
    # sqrt() is correctly-rounded IEEE, identical in both engines
    dens = f"sqrt(100.0e0 / (select count(*) from {table}))"
    rad = f"(({flit(0.03)} + {pr_rad} * {flit(0.12)}) * {dens})"
    nv = f"cast(8 + floor({pr_nv} * 9) as int)"

    m = "(j % nv)"
    t4 = f"(4.0e0 * {m} / nv)"
    side = f"cast(floor({t4}) as int)"
    u = f"({t4} - floor({t4}))"
    x = (
        f"(CASE WHEN {side} = 0 THEN -1.0e0 + 2.0e0 * {u} "
        f"WHEN {side} = 1 THEN 1.0e0 "
        f"WHEN {side} = 2 THEN 1.0e0 - 2.0e0 * {u} "
        f"ELSE -1.0e0 END)"
    )
    y = (
        f"(CASE WHEN {side} = 0 THEN -1.0e0 "
        f"WHEN {side} = 1 THEN -1.0e0 + 2.0e0 * {u} "
        f"WHEN {side} = 2 THEN 1.0e0 "
        f"ELSE 1.0e0 - 2.0e0 * {u} END)"
    )
    pr_vr = _pr(["'z:vr:'", "s_suppkey", "':'", m], d)
    rj = f"(0.6e0 + 0.8e0 * {pr_vr})"
    vlat = f"(clat + rad * {rj} * {y})"
    vlon = f"(clon + rad * {rj} * {x})"

    if d == SPARK:
        pos = f"flatten(transform(sequence(0, nv), j -> array({vlat}, {vlon})))"
    else:
        pos = f"flatten(list_transform(generate_series(0, cast(nv as bigint)), j -> [{vlat}, {vlon}]))"
    return (
        f"select s_suppkey as zone_id, {pos} as pos_list from ("
        f"select s_suppkey, {clat} as clat, {clon} as clon, {rad} as rad, {nv} as nv "
        f"from {table}) t"
    )


def register_geometry_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables + derived geometry as temp views.

    Memoized per (session, sf_dir): every query builder calls this, and the
    6 parquet schema reads cost ~0.8 s per call — pure setup, not engine
    work.  Temp views are session-scoped, so the memo rides the session
    object; a different sf_dir re-registers (views are replaced)."""
    if getattr(spark, "_graft_geo_views", None) == sf_dir:
        return
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    spark.sql(f"create or replace temp view geo_points as {points_sql(SPARK)}")
    spark.sql(f"create or replace temp view geo_polys as {polys_sql(SPARK)}")
    spark._graft_geo_views = sf_dir


def duck_geometry_ctes() -> str:
    """WITH-clause text for oracle queries (testdata views pre-registered)."""
    return (
        f"with geo_points as ({points_sql(DUCK)}), "
        f"geo_polys as ({polys_sql(DUCK)})"
    )


# equirectangular squared distance in deg² — trig-free, exact cross-engine.
COSLAT0 = 0.5225  # fixed constant ≈ cos(58.5°)... kept literal & identical on both sides


def dist2(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"(({lat2} - {lat1}) * ({lat2} - {lat1}) + "
        f"({flit(COSLAT0)} * ({lon2} - {lon1})) * ({flit(COSLAT0)} * ({lon2} - {lon1})))"
    )


# ---------------------------------------------------------------------------
# queries — each returns a Spark DataFrame builder + matching oracle SQL
# ---------------------------------------------------------------------------
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point cell-assign at res 7/8/9, hex + quad (north-rule headline).

    Hex cells go through the staged-intermediate builder (same values as the
    inline oracle formula, ~40% less compute — geo.hex_cells_staged)."""
    register_geometry_views(spark, sf_dir)
    pts = spark.table("geo_points")
    staged, hex_cols = geo.hex_cells_staged(pts, "lat", "lon", (7, 8, 9))
    cols = ["point_id"]
    for r, h in zip((7, 8, 9), hex_cols):
        cols.append(f"{h} as hex_r{r}")
        cols.append(f"{geo.quad_cell('lat', 'lon', r, SPARK)} as quad_r{r}")
    return staged.selectExpr(*cols)


def q_tile_assign_oracle() -> str:
    exprs = []
    for r in (7, 8, 9):
        exprs.append(f"{geo.hex_cell('lat', 'lon', r, DUCK)} as hex_r{r}")
        exprs.append(f"{geo.quad_cell('lat', 'lon', r, DUCK)} as quad_r{r}")
    return f"{duck_geometry_ctes()} select point_id, {', '.join(exprs)} from geo_points"


def q_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon covering as exploded (zone_id, scheme, res, cell) rows.

    Built through tiling.cover_cells (staged bounds + explode(sequence)) —
    row-identical to the single cover-expression form but ~3.4x faster at
    sf0.1 because the mega-expression's Catalyst/Janino fixed cost is gone
    (measured in tools/exp_polyfill_explode.py; BASELINE.md caveat)."""
    from ..operators.tiling import cover_cells

    register_geometry_views(spark, sf_dir)
    polys = spark.table("geo_polys")
    out = None
    for scheme in ("hex", "quad"):
        for r in (7, 8):
            part = cover_cells(polys, "zone_id", r, scheme).selectExpr(
                "zone_id", f"'{scheme}' as scheme", f"{r} as res", "cell"
            )
            out = part if out is None else out.unionByName(part)
    return out


def q_polyfill_oracle() -> str:
    parts = []
    for scheme, fn in (("hex", geo.hex_cover_bbox), ("quad", geo.quad_cover_bbox)):
        for r in (7, 8):
            parts.append(
                f"select zone_id, '{scheme}' as scheme, {r} as res, "
                f"unnest({fn('pos_list', r, DUCK)}) as cell from geo_polys"
            )
    return f"{duck_geometry_ctes()} " + " union all ".join(parts)


def q_kring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex k-ring expansion (k=2) as exploded rows."""
    register_geometry_views(spark, sf_dir)
    cell = geo.hex_cell("lat", "lon", 8, SPARK)
    return spark.sql(
        f"select point_id, explode({geo.hex_kring(cell, 8, 2, SPARK)}) as ring_cell from geo_points"
    )


def q_kring_oracle() -> str:
    cell = geo.hex_cell("lat", "lon", 8, DUCK)
    return (
        f"{duck_geometry_ctes()} select point_id, "
        f"unnest({geo.hex_kring(cell, 8, 2, DUCK)}) as ring_cell from geo_points"
    )


def q_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP binding — engine: quad-cell-pruned join + ray cast; oracle: brute."""
    from ..operators import pip

    register_geometry_views(spark, sf_dir)
    pts = spark.table("geo_points")
    polys = spark.table("geo_polys")
    return pip.bind_points_to_polygons(pts, polys, res=12, scheme="quad")


def q_pip_oracle() -> str:
    pred = geo.point_in_polygon("p.lat", "p.lon", "z.pos_list", DUCK)
    return (
        f"{duck_geometry_ctes()} "
        f"select distinct p.point_id as point_id, z.zone_id as zone_id "
        f"from geo_points p cross join geo_polys z where {pred}"
    )


def q_pip_celljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same PIP binding through the NON-broadcast strategy
    (broadcast_polygons=False): shuffled cell equi-join against the
    classified polygon index — the plan used when the polygon set outgrows
    the broadcast threshold at the 100 TB design point.  Oracle identical
    to `pip`; agreement proves strategy-independence of the result."""
    from ..operators import pip

    register_geometry_views(spark, sf_dir)
    pts = spark.table("geo_points")
    polys = spark.table("geo_polys")
    return pip.bind_points_to_polygons(
        pts, polys, res=12, scheme="quad", broadcast_polygons=False
    )


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN (k=3): every 10th point (quay) → 3 nearest other points (stops),
    equirect-squared metric.

    Engine plan: quad-cell ring-1 candidate join at res 13 + window top-k;
    quays whose 3rd hit falls outside the ring's guarantee radius (or with
    < 3 hits) are re-ranked brute-force — a data-driven anti-join fallback,
    no driver loop.  Exact vs the brute-force oracle by construction.
    """
    register_geometry_views(spark, sf_dir)
    res, k = 13, 3
    cellh = 180.0 / 2**res
    cellw = 360.0 / 2**res
    g2 = min(cellh, cellw * COSLAT0) ** 2  # dist2 ball certainly covered by ring 1

    q = spark.sql(
        f"select point_id as quay_id, lat as qlat, lon as qlon, "
        f"{geo.quad_cell('lat', 'lon', res, SPARK)} as qcell "
        f"from geo_points where point_id % 10 = 0"
    )
    s = spark.sql(
        f"select point_id as stop_id, lat as slat, lon as slon, "
        f"{geo.quad_cell('lat', 'lon', res, SPARK)} as scell "
        f"from geo_points where point_id % 10 <> 0"
    )
    # the stop side is 90% of the corpus — NOT a dimension table, so no
    # broadcast anywhere on it: the candidate join is a shuffled cell
    # equi-join (AQE splits skewed cells), the resolution check is a window
    # over the ranking partition (one shuffle, reused sort), and the
    # remainder anti-join + fallback stay shuffle-based too
    ring = q.withColumn("cand_cell", F.explode(F.expr(geo.quad_kring("qcell", res, 1, SPARK))))
    cand = ring.join(s, ring.cand_cell == s.scell).withColumn(
        "d2", F.expr(dist2("qlat", "qlon", "slat", "slon"))
    )
    w = Window.partitionBy("quay_id").orderBy(F.col("d2").asc(), F.col("stop_id").asc())
    ranked = (
        cand.select("quay_id", "stop_id", "d2")
        .withColumn("rn", F.row_number().over(w))
        .where(f"rn <= {k}")
    )
    wq = Window.partitionBy("quay_id")
    flagged = ranked.withColumn(
        "__resolved",
        (F.count("*").over(wq) == k) & (F.max("d2").over(wq) <= F.lit(g2)),
    )
    done = flagged.where("__resolved").select("quay_id", "stop_id", "d2", "rn")
    resolved = flagged.where("__resolved").select("quay_id")
    rest = q.join(resolved, "quay_id", "left_anti")
    fb_cand = rest.crossJoin(s.drop("scell")).withColumn(
        "d2", F.expr(dist2("qlat", "qlon", "slat", "slon"))
    )
    fb = (
        fb_cand.select("quay_id", "stop_id", "d2")
        .withColumn("rn", F.row_number().over(w))
        .where(f"rn <= {k}")
    )
    return (
        done.unionByName(fb)
        .selectExpr("quay_id", "stop_id", "rn", "round(d2, 12) as d2r")
    )


def q_knn_oracle() -> str:
    d2 = dist2("q.lat", "q.lon", "s.lat", "s.lon")
    return f"""{duck_geometry_ctes()},
        cand as (
            select q.point_id as quay_id, s.point_id as stop_id, {d2} as d2,
                   row_number() over (partition by q.point_id order by {d2} asc, s.point_id asc) as rn
            from geo_points q cross join geo_points s
            where q.point_id % 10 = 0 and s.point_id % 10 <> 0
        )
        select quay_id, stop_id, rn, round(d2, 12) as d2r from cand where rn <= 3"""


def q_raster_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal raster stats at quad res 12 over the derived polygons."""
    from ..operators import raster

    register_geometry_views(spark, sf_dir)
    ras = raster.synthesize_raster(spark, res=12, bbox=BBOX)
    polys = spark.table("geo_polys")
    out = raster.zonal_stats(polys, ras, res=12)
    return out.selectExpr(
        "zone_id", "avg_value", "round(min_value, 6) as min_value",
        "round(max_value, 6) as max_value", "n_cells"
    )


def q_raster_zonal_oracle() -> str:
    # inline raster synthesis (mirrors raster.synthesize_raster arithmetic)
    res, n = 12, 2**12
    iy_lo = int((LAT_LO + 90.0) / 180.0 * n)
    iy_hi = int((LAT_HI + 90.0) / 180.0 * n)
    ix_lo = int((LON_LO + 180.0) / 360.0 * n)
    ix_hi = int((LON_HI + 180.0) / 360.0 * n)
    w = ix_hi - ix_lo + 1
    total = (iy_hi - iy_lo + 1) * w
    h = phash60(concat_str(["'42:ras:'", "iy", "':'", "ix"], DUCK), DUCK)
    return f"""{duck_geometry_ctes()},
        raster as (
            select {geo.quad_pack('ix', 'iy', res)} as cell,
                   round(({h} / {flit(float(2**60))}) * 2000.0e0, 3) as value
            from (select ({iy_lo} + i // {w}) as iy, ({ix_lo} + i % {w}) as ix
                  from generate_series(0, {total - 1}) t(i)) g
        ),
        cover as (
            select zone_id, unnest({geo.quad_cover_bbox('pos_list', res, DUCK)}) as cell
            from geo_polys
        )
        select zone_id, round(avg(value), 6) as avg_value, round(min(value), 6) as min_value,
               round(max(value), 6) as max_value, count(*) as n_cells
        from cover join raster using (cell)
        group by zone_id"""


# --- training-data operators over the shared documents/embeddings tables ---
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup(docs)


def q_dedup_exact_oracle() -> str:
    norm = dedup.normalize_expr("text", DUCK)
    return (
        f"select md5({norm}) as content_key, count(*) as n_dupes, "
        f"min(doc_id) as survivor_id from documents group by 1"
    )


def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = dedup.minhash_signatures(docs, n_shingle=3, n_perm=16)
    return sigs.selectExpr("doc_id", "array_join(sig, ',') as sig_str")


def q_minhash_oracle() -> str:
    base = tx.shingle_base_hashes("text", 3, DUCK)
    sig = tx.minhash_from_base("mh_base", 16, DUCK)
    return (
        f"with staged as (select doc_id, {base} as mh_base from documents) "
        f"select doc_id, array_to_string({sig}, ',') as sig_str from staged"
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(docs, n_perm=16, bands=4, jaccard_threshold=0.4)


def q_minhash_pairs_oracle() -> str:
    bh = tx.shingle_base_hashes("text", 3, DUCK)
    sig = tx.minhash_from_base("mh_base", 16, DUCK)
    return f"""
        with staged as (
            select doc_id, {bh} as mh_base from documents
        ),
        base as (
            select doc_id, {sig} as sig, list_distinct(mh_base) as shingles from staged
        ),
        banded as (
            select doc_id, shingles, b as band,
                   md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), ',')) as bucket
            from base, unnest(generate_series(0, 3)) t(b)
        ),
        cand as (
            select distinct a.doc_id as doc_a, b.doc_id as doc_b,
                   a.shingles as sh_a, b.shingles as sh_b
            from banded a join banded b using (band, bucket)
            where a.doc_id < b.doc_id
        )
        select doc_a, doc_b,
               round(cast(len(list_intersect(sh_a, sh_b)) as double) /
                     cast(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)) as double), 6) as jaccard
        from cand
        where round(cast(len(list_intersect(sh_a, sh_b)) as double) /
                    cast(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)) as double), 6) >= 0.4
    """


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.selectExpr("doc_id", f"{tx.simhash64('text', SPARK)} as simhash")


def q_simhash_oracle() -> str:
    return f"select doc_id, {tx.simhash64('text', DUCK)} as simhash from documents"


def q_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.text_stats(docs)


def q_textstats_oracle() -> str:
    return textstats.text_stats_oracle_sql("documents")


def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id % 50 = 0")
    return similarity.topk_cosine_brute(queries, emb, k=5)


def q_embed_topk_oracle() -> str:
    cos = dedup.cosine_expr("q.embedding", "c.embedding", DUCK)
    return f"""
        with scored as (
            select q.vec_id as query_id, c.vec_id as vec_id, round({cos}, 6) as cos
            from embeddings q cross join embeddings c
            where q.vec_id % 50 = 0 and c.vec_id <> q.vec_id
        ),
        ranked as (
            select query_id, vec_id, cos,
                   row_number() over (partition by query_id order by cos desc, vec_id asc) as rn
            from scored
        )
        select query_id, vec_id, cos, rn from ranked where rn <= 5"""


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    return dedup.embedding_near_dup(emb, dim=dim, n_bits=4, cos_threshold=0.35)


def q_embed_near_dup_oracle(dim: int = 64) -> str:
    bits = dedup.hyperplane_bits("embedding", 4, dim, DUCK)
    cos = dedup.cosine_expr("a.embedding", "b.embedding", DUCK)
    return f"""
        with sig as (select vec_id, embedding, {bits} as bucket from embeddings)
        select a.vec_id as id_a, b.vec_id as id_b, round({cos}, 6) as cos
        from sig a join sig b using (bucket)
        where a.vec_id < b.vec_id and round({cos}, 6) >= 0.35"""


def q_polyfill_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tight quad covering (bbox cover filtered to center-inside OR
    edge-overlap cells — functions.geo.quad_cover_refined): the 2-5x
    fan-out reduction used by the PIP index, verified cell-for-cell."""
    register_geometry_views(spark, sf_dir)
    # exploded bbox cover + per-row classify>0 filter: same predicate as
    # quad_cover_refined's (center_in OR edge_overlap), small expressions
    from ..operators.tiling import cover_cells

    cov = cover_cells(
        spark.table("geo_polys"), "zone_id", 9, "quad", keep=("pos_list",)
    )
    return cov.where(
        F.expr(f"({geo.quad_cell_classify('cell', 'pos_list', 9, SPARK)}) > 0")
    ).select("zone_id", "cell")


def q_polyfill_refined_oracle() -> str:
    return (
        f"{duck_geometry_ctes()} "
        f"select zone_id, unnest({geo.quad_cover_refined('pos_list', 9, DUCK)}) as cell "
        f"from geo_polys"
    )


def q_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: per-cell point counts at res 9 aggregated to the
    parent cells at res 8 and 7 via the strict cell hierarchy (quad_parent) —
    the hypertable-rollup pattern: coarse tiles are aggregations of fine
    tiles, never a re-scan of the points."""
    register_geometry_views(spark, sf_dir)
    ctes, sel = _rollup_parts(SPARK)
    return spark.sql(f"with {ctes} {sel}")


def _rollup_parts(d: str) -> tuple[str, str]:
    c9 = geo.quad_cell("lat", "lon", 12, d)
    p8 = geo.quad_parent("c9", 12, d)
    p7 = geo.quad_parent("p8", 11, d)
    ctes = f"""c as (select {c9} as c9 from geo_points),
        f9 as (select 12 as res, c9 as cell, count(*) as n_points from c group by c9),
        f8 as (select 11 as res, p8 as cell, count(*) as n_points
               from (select {p8} as p8 from c) t group by p8),
        f7 as (select 10 as res, p7 as cell, count(*) as n_points
               from (select {p7} as p7 from (select {p8} as p8 from c) t) t2 group by p7)"""
    sel = "select * from f9 union all select * from f8 union all select * from f7"
    return ctes, sel


def q_cell_rollup_oracle() -> str:
    ctes, sel = _rollup_parts(DUCK)
    return f"{duck_geometry_ctes()}, {ctes} {sel}"


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) — the classic training-data /
    clickstream operator: lag + cumulative sum over one per-user window
    partition, no self-join.  Ties broken by event_id for determinism."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.createOrReplaceTempView("events")
    return spark.sql(_sessionize_sql(SPARK))


def _sessionize_sql(d: str) -> str:
    # fractional epoch seconds: micros/1e6 in BOTH engines — bit-identical
    # doubles, immune to timestamp->string formatting differences and free of
    # any session-timezone dependence (ts is NTZ; timestampdiff is tz-free)
    ep = (
        (lambda c: f"(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {c}) / 1.0e6)")
        if d == SPARK
        else (lambda c: f"epoch({c})")
    )
    gap = f"{ep('ts')} - {ep('lag(ts) over w')}"
    return f"""
        with flagged as (
            select user_id, event_id, ts, value,
                   case when ({gap}) is null or ({gap}) > 1800 then 1 else 0 end as brk
            from events
            window w as (partition by user_id order by ts asc, event_id asc)
        ),
        sessioned as (
            select user_id, event_id, ts, value,
                   cast(sum(brk) over (partition by user_id order by ts asc, event_id asc
                                  rows between unbounded preceding and current row)
                        as bigint) as session_idx
            from flagged
        )
        select user_id, session_idx,
               count(*) as n_events,
               cast(sum(cast(floor(value * 1.0e6 + 0.5e0) as bigint)) as bigint)
                   as sum_value_q6,
               round({ep('min(ts)')}, 6) as session_start,
               round({ep('max(ts)')}, 6) as session_end
        from sessioned group by user_id, session_idx"""


def q_events_sessionize_oracle() -> str:
    return _sessionize_sql(DUCK)


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets analytics: ROLLUP (event_type, day) with grand totals —
    partial aggregation handles every grouping set in one shuffle (Catalyst
    Expand + HashAggregate), no per-level re-scan."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.createOrReplaceTempView("events")
    return spark.sql(_rollup_events_sql(SPARK))


def _rollup_events_sql(d: str) -> str:
    day = "cast(date_trunc('day', ts) as date)"
    return f"""
        select coalesce(event_type, '<all>') as event_type,
               coalesce(cast({day} as string), '<all>') as day,
               count(*) as n_events,
               cast(sum(cast(floor(value * 1.0e6 + 0.5e0) as bigint)) as bigint)
                   as sum_value_q6,
               count(distinct user_id) as n_users
        from events
        group by rollup (event_type, {day})"""


def q_events_rollup_oracle() -> str:
    return _rollup_events_sql(DUCK)


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (p50/p90/p99 of value per event_type) —
    Spark's exact `percentile` and DuckDB's `quantile_cont` both use linear
    interpolation between closest ranks, so the values agree bit-for-bit
    after rounding."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        *[
            F.round(F.expr(f"percentile(value, {q})"), 6).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ],
    )


def q_events_quantiles_oracle() -> str:
    qs = ", ".join(
        f"round(quantile_cont(value, {q}), 6) as p{int(q * 100)}"
        for q in (0.5, 0.9, 0.99)
    )
    return f"select event_type, count(*) as n, {qs} from events group by event_type"


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed/sessionized analytics over the events stream table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("cast(floor(value * 1.0e6 + 0.5e0) as bigint)")).alias(
            "sum_value_q6"
        ),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_events_window_oracle() -> str:
    return """
        select date_trunc('hour', ts) as hour, event_type,
               count(*) as n_events,
               cast(sum(cast(floor(value * 1.0e6 + 0.5e0) as bigint)) as bigint)
                   as sum_value_q6,
               count(distinct user_id) as n_users
        from events group by 1, 2"""


# --- reference-parity operators over derived relational fixtures -----------
def q_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 ordered reassembly verified against a SQL ordered-aggregation oracle:
    nodes = polygon vertices keyed (zone_id*1000+j); ways reference them."""
    register_geometry_views(spark, sf_dir)
    nodes = spark.sql(
        "select zone_id * 1000 + (pos - 1) as node_id, "
        "pos_list[cast(2 * pos - 2 as int)] as lat, pos_list[cast(2 * pos - 1 as int)] as lon "
        "from (select zone_id, pos_list, explode(sequence(1, size(pos_list) div 2)) as pos from geo_polys)"
    )
    ways = spark.sql(
        "select zone_id as way_id, transform(sequence(1, size(pos_list) div 2), "
        "p -> zone_id * 1000 + (p - 1)) as nd_refs, "
        "cast(null as map<string,string>) as tags from geo_polys"
    )
    from ..operators import assemble

    out = assemble.assemble_poslist(ways, nodes, broadcast_nodes=True, strict=False)
    # exploded to scalar rows: the driver canonicalizer cannot hash array
    # cells, and per-coordinate rows make the order check explicit
    return out.selectExpr("way_id", "posexplode(pos_list) as (pos_idx, coord)")


def q_assemble_oracle() -> str:
    return f"""{duck_geometry_ctes()},
        verts as (
            select zone_id, pos,
                   pos_list[2 * pos - 1] as lat, pos_list[2 * pos] as lon
            from geo_polys, unnest(generate_series(1, len(pos_list) // 2)) t(pos)
        ),
        asm as (
            select zone_id as way_id,
                   flatten(list([lat, lon] order by pos asc)) as pos_list
            from verts group by zone_id
        )
        select way_id, t.i - 1 as pos_idx, a.pos_list[t.i] as coord
        from asm a, unnest(generate_series(1, len(a.pos_list))) t(i)"""


def q_zone_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/M4/M5 — the engine's real tag→zone mapper (zones.map_zones) over
    derived tags, vs a semantic SQL oracle.  Exercises: id generation
    (OsmToNetexMapper.java:337-339), the name:lang extraction incl. the
    plain-``name`` quirk (:341-343), zone_type → KeyList, and every
    ValidBetween branch (:320-326)."""
    from ..operators import zones

    register_geometry_views(spark, sf_dir)
    assembled = spark.sql(
        """
        select zone_id as way_id, pos_list,
               map_filter(map(
                 'codespace', 'BRA',
                 'reference', cast(zone_id as string),
                 case when zone_id % 3 = 0 then 'name:nor'
                      when zone_id % 3 = 1 then 'name:eng'
                      else 'name' end, concat('Zone-', zone_id),
                 'zone_type', case when zone_id % 2 = 0 then 'tariffZone' end,
                 'valid_from', case when zone_id % 4 = 0 then '2021-02-01'
                                    when zone_id % 4 = 1 then '2021-02-01'
                                    when zone_id % 4 = 2 then '2030-01-01' end,
                 'valid_to',   case when zone_id % 4 = 0 then '2031-02-01'
                                    when zone_id % 4 = 2 then '2020-01-01' end
               ), (k, v) -> v is not null) as tags
        from geo_polys
        """
    )
    z = zones.map_zones(assembled, "TariffZone", strict=True)
    return z.selectExpr(
        "zone_id",
        "name",
        "name_lang",
        "polygon_id",
        "element_at(key_list, 'zone_type') as zone_type",
        "cast(valid_from as string) as valid_from",
        "cast(valid_to as string) as valid_to",
    )


def q_zone_mapping_oracle() -> str:
    return f"""{duck_geometry_ctes()}
        select concat('BRA', ':', 'TariffZone', ':', cast(zone_id as varchar)) as zone_id,
               concat('Zone-', cast(zone_id as varchar)) as name,
               case when zone_id % 3 = 0 then 'nor'
                    when zone_id % 3 = 1 then 'eng'
                    else 'name' end as name_lang,
               concat('GEN-PolygonType', cast(zone_id as varchar)) as polygon_id,
               case when zone_id % 2 = 0 then 'tariffZone' end as zone_type,
               -- ValidBetween: both iff to>from; from-only iff to missing; else none
               case when zone_id % 4 = 0 then '2021-02-01'
                    when zone_id % 4 = 1 then '2021-02-01' end as valid_from,
               case when zone_id % 4 = 0 then '2031-02-01' end as valid_to
        from geo_polys"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by the `lang` column to
    bound the quadratic term per block (the 100 TB path: block key = lang or
    a coarse LSH band, never an unblocked self-join)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(docs, n_shingle=3, threshold=0.4, prefilter_key="lang")


def q_ngram_jaccard_oracle() -> str:
    sh = tx.word_shingles("text", 3, DUCK)
    jac = (
        "cast(len(list_intersect(a.sh, b.sh)) as double) / "
        "nullif(cast(len(list_distinct(list_cat(a.sh, b.sh))) as double), 0.0e0)"
    )
    return f"""
        with base as (
            select doc_id, lang as blk, list_distinct({sh}) as sh from documents
        )
        select doc_a, doc_b, jaccard from (
            select a.doc_id as doc_a, b.doc_id as doc_b, round({jac}, 6) as jaccard
            from base a join base b on a.blk = b.blk and a.doc_id < b.doc_id
        ) where jaccard >= 0.4"""


def q_embed_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF buckets (deterministic centroids = lowest vec_ids,
    n_probe nearest buckets per query) — the scale path for similarity
    search; the oracle replays the identical bucketing in SQL, so this is an
    exact check of the approximate plan."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id % 50 = 0")
    return similarity.topk_cosine_ivf(queries, emb, k=5, n_centroids=16, n_probe=4)


def q_embed_topk_ivf_oracle() -> str:
    cos_ac = dedup.cosine_expr("e.embedding", "c.cent_vec", DUCK)
    cos_qc = dedup.cosine_expr("q.qv", "c.cent_vec", DUCK)
    cos_qv = dedup.cosine_expr("p.qv", "a.cv", DUCK)
    return f"""
        with cents as (
            select vec_id as cent_id, embedding as cent_vec
            from embeddings order by vec_id asc limit 16
        ),
        assigned as (
            select vec_id, cv, cent_id from (
                select e.vec_id, e.embedding as cv, c.cent_id,
                       row_number() over (partition by e.vec_id
                                          order by {cos_ac} desc, c.cent_id asc) as rn
                from embeddings e cross join cents c
            ) where rn = 1
        ),
        queries as (
            select vec_id as query_id, embedding as qv from embeddings where vec_id % 50 = 0
        ),
        probes as (
            select query_id, qv, cent_id from (
                select q.query_id, q.qv, c.cent_id,
                       row_number() over (partition by q.query_id
                                          order by {cos_qc} desc, c.cent_id asc) as rn
                from queries q cross join cents c
            ) where rn <= 4
        ),
        cand as (
            select p.query_id, a.vec_id, round({cos_qv}, 6) as cos
            from assigned a join probes p using (cent_id)
            where p.query_id <> a.vec_id
        )
        select query_id, vec_id, cos, rn from (
            select query_id, vec_id, cos,
                   row_number() over (partition by query_id
                                      order by cos desc, vec_id asc) as rn
            from cand
        ) where rn <= 5"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → dedup GROUPS: MinHash-LSH pairs fed through the
    alternating-star connected-components operator; component = min doc_id
    reachable.  The oracle replays reachability with a recursive CTE."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, n_perm=16, bands=4, jaccard_threshold=0.4)
    out = dedup.connected_components(pairs)  # eagerly checkpoints the edge set
    dedup.unpersist_intermediates(pairs)
    return out


def q_dedup_groups_oracle() -> str:
    pairs_sql = q_minhash_pairs_oracle()
    return f"""
        with recursive pairs as (select doc_a, doc_b from ({pairs_sql}) tp),
        edges as (
            select doc_a as a, doc_b as b from pairs
            union
            select doc_b as a, doc_a as b from pairs
        ),
        reach(v, l) as (
            select a, a from edges
            union
            select e.a, r.l from edges e join reach r on r.v = e.b
        )
        select v as doc_id, min(l) as component from reach group by v
    """


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — every doc, hash-ranged."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.assign_split(docs).select("doc_id", "split")


def q_corpus_split_oracle() -> str:
    return (
        f"select doc_id, {sampling.split_expr('doc_id', sampling.DEFAULT_SPLITS, DUCK)} "
        f"as split from documents"
    )


_STRATA_BANDS = "(CASE WHEN length(text) < 400 THEN 'short' WHEN length(text) < 800 THEN 'mid' ELSE 'long' END)"
_STRATA_FRACTIONS = {"short": 0.5, "mid": 0.2, "long": 0.05}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (length bands)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    banded = docs.withColumn("band", F.expr(_STRATA_BANDS))
    return sampling.stratified_sample(banded, "band", _STRATA_FRACTIONS).select(
        "doc_id", "band"
    )


def q_stratified_sample_oracle() -> str:
    u = prand(concat_str(["'samp:'", "doc_id"], DUCK), DUCK)
    frac = (
        "(CASE band WHEN 'short' THEN 0.5e0 WHEN 'mid' THEN 0.2e0 ELSE 0.05e0 END)"
    )
    return f"""
        select doc_id, band from (
            select doc_id, {_STRATA_BANDS} as band from documents
        ) t where {u} < {frac}
    """


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date range join: per order, how many lineitems (of ANY order) shipped
    within [o_orderdate, o_orderdate+7d] — bucketed equi-join + refine (the
    scalable form); the oracle runs the naive BETWEEN theta-join."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    orders = spark.table("orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("d1"),
    )
    # the point side is keyless vs the interval side, so result size is
    # |points in window| × |orders| / date-span — scope the point side (returned
    # small-quantity shipments, ~5% of lineitem) to keep the workload the
    # range-join pattern, not an intentionally quadratic blow-up: unscoped at
    # sf0.1 the join legitimately emits ~285M pairs (benched at 130s)
    items = spark.table("lineitem").where(
        "l_returnflag = 'R' and l_quantity <= 10"
    ).select(F.col("l_shipdate").alias("sd"))
    joined = temporal.date_interval_join(
        items, orders, point_date="sd", start_date="d0", end_date="d1", bucket_days=7
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipped_in_window")
    )


def q_range_join_oracle() -> str:
    return """
        select o.o_orderkey as o_orderkey,
               cast(count(*) as bigint) as n_shipped_in_window
        from orders o join lineitem l
          on cast(l.l_shipdate as date)
             between cast(o.o_orderdate as date)
                 and cast(o.o_orderdate as date) + interval 7 day
        where l.l_returnflag = 'R' and l.l_quantity <= 10
        group by o.o_orderkey
    """


def q_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join: all point pairs within 2 km, via the
    data-driven ring join (operators.distjoin) — cell-pruned candidates +
    exact haversine; the oracle is the brute-force cross join.  res 13 puts
    the cell edge (~2.4 km at 60°N) at the radius, so the ring is 3×3-ish."""
    from ..operators import distjoin

    register_geometry_views(spark, sf_dir)
    pts = spark.table("geo_points")
    pairs = distjoin.radius_join(pts, pts, radius_m=2000.0, res=13)
    return pairs.where(F.col("point_id_a") < F.col("point_id_b"))


def q_radius_join_oracle() -> str:
    dist = haversine_m("a.lat", "a.lon", "b.lat", "b.lon", DUCK)
    return f"""{duck_geometry_ctes()}
        select a.point_id as point_id_a, b.point_id as point_id_b,
               round({dist}, 6) as dist_m
        from geo_points a cross join geo_points b
        where a.point_id < b.point_id and {dist} <= 2000.0e0"""


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key at quad res 14 — the write-layout key
    (sources.layout.write_zordered) as a value-gated formula: parallel-prefix
    bit spread + interleave, portable SQL in both engines."""
    from ..sources import layout

    register_geometry_views(spark, sf_dir)
    return spark.sql(
        f"select point_id, {layout.zorder_expr('lat', 'lon', 14, SPARK)} as z "
        "from geo_points"
    )


def q_zorder_key_oracle() -> str:
    from ..sources import layout

    return (
        f"{duck_geometry_ctes()} select point_id, "
        f"{layout.zorder_expr('lat', 'lon', 14, DUCK)} as z from geo_points"
    )


def q_zone_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector zonal statistics: shoelace area, centroid, perimeter, vertex
    count per polygon — pure projection (scan-parallel at any scale), one
    formula source for both dialects."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(
        "select zone_id, "
        f"cast(size(pos_list) / 2 - 1 as bigint) as n_vertices, "
        f"round({geo.poly_area('pos_list', SPARK)}, 9) as area_deg2, "
        f"round({geo.poly_centroid_lat('pos_list', SPARK)}, 9) as centroid_lat, "
        f"round({geo.poly_centroid_lon('pos_list', SPARK)}, 9) as centroid_lon, "
        f"round({geo.poly_perimeter_deg('pos_list', SPARK)}, 9) as perimeter_deg "
        "from geo_polys"
    )


def q_zone_stats_oracle() -> str:
    return (
        f"{duck_geometry_ctes()} select zone_id, "
        f"cast(len(pos_list) / 2 - 1 as bigint) as n_vertices, "
        f"round({geo.poly_area('pos_list', DUCK)}, 9) as area_deg2, "
        f"round({geo.poly_centroid_lat('pos_list', DUCK)}, 9) as centroid_lat, "
        f"round({geo.poly_centroid_lon('pos_list', DUCK)}, 9) as centroid_lon, "
        f"round({geo.poly_perimeter_deg('pos_list', DUCK)}, 9) as perimeter_deg "
        "from geo_polys"
    )


def _hll_distinct_sql(d: str) -> str:
    """Batch HLL distinct-users per event_type, next to the exact count.

    The Σ 2^-M_j harmonic sum is kept in INTEGERS (Σ 2^(53-M_j), ≤ 2^60)
    so it is order-free under any partitioning — float summation of the
    dyadic terms would round differently per accumulation order.  The only
    float op is the final division."""
    from ..functions import sketch

    reg = sketch.hll_register("user_id", d)
    rho = sketch.hll_rho("user_id", d)
    term = (
        f"shiftleft(cast(1 as bigint), 53 - m)" if d == SPARK
        else f"(cast(1 as bigint) << (53 - m))"
    )
    numer = sketch.ALPHA_256 * sketch.M_REGISTERS * sketch.M_REGISTERS * float(2**53)
    return f"""
        with regs as (
            select event_type, {reg} as j, max({rho}) as m
            from events group by event_type, {reg}
        ),
        sums as (
            select event_type,
                   cast(count(*) as bigint) as n_hit,
                   sum({term}) as s_int
            from regs group by event_type
        ),
        exact as (
            select event_type, cast(count(distinct user_id) as bigint) as exact_distinct
            from events group by event_type
        )
        select s.event_type as event_type, s.n_hit as n_registers_hit,
               round({numer!r} / cast(s.s_int + ({sketch.M_REGISTERS} - s.n_hit) * cast({2**53} as bigint) as double), 6) as hll_estimate,
               e.exact_distinct as exact_distinct
        from sums s join exact e on s.event_type = e.event_type
    """


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch HLL sketch (m=256 registers as ROWS — one map-side-combined
    groupBy, mergeable by construction) beside the exact distinct count."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_hll_distinct_sql(SPARK))


def q_hll_distinct_oracle() -> str:
    return _hll_distinct_sql(DUCK)


def _cms_sql(d: str) -> str:
    """Count-min-sketch frequency estimates beside exact counts, per user.

    Build: one shuffle — explode CMS_DEPTH hash rows per event, groupBy
    (row, bucket) count.  The register table is DEPTH×WIDTH rows (1024) no
    matter the corpus size, mergeable by addition, and integer end-to-end
    (bit-exact oracle).  Probe: distinct users join their DEPTH registers,
    estimate = min over rows (classic CMS overestimate bound)."""
    from ..functions import sketch

    b = sketch.cms_bucket("user_id", "i", d)
    depths = (
        f"lateral view explode(sequence(0, {sketch.CMS_DEPTH - 1})) t as i"
        if d == SPARK
        else f"cross join unnest(generate_series(0, {sketch.CMS_DEPTH - 1})) t(i)"
    )
    return f"""
        with regs as (
            select i, {b} as bucket, cast(count(*) as bigint) as c
            from events {depths}
            group by i, {b}
        ),
        probes as (
            select user_id, i, {b} as bucket
            from (select distinct user_id from events) u {depths}
        ),
        est as (
            select p.user_id as user_id, min(r.c) as cms_est
            from probes p join regs r on p.i = r.i and p.bucket = r.bucket
            group by p.user_id
        ),
        exact as (
            select user_id, cast(count(*) as bigint) as exact_n
            from events group by user_id
        )
        select e.user_id as user_id, est.cms_est as cms_est, e.exact_n as exact_n
        from exact e join est on e.user_id = est.user_id
    """


def q_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4×256 integer registers as rows) vs exact counts."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_cms_sql(SPARK))


def q_cms_frequencies_oracle() -> str:
    return _cms_sql(DUCK)


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click annotated with the user's most recent
    prior-or-equal view (merge form: union + one window, zero joins).  The
    oracle is DuckDB's native ASOF JOIN — an independent algorithm."""
    from ..operators import temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts", "value")
    out = temporal.asof_join(
        clicks, views, keys=["user_id"], ts_col="ts",
        payload_cols=["event_id", "value"], right_order_cols=["event_id"],
    )
    # null-free projection: driver/oracle canonicalizers compare value
    # tuples where NaN != NaN, so left-outer misses use sentinels
    return out.selectExpr(
        "event_id", "user_id",
        "coalesce(asof_event_id, -1) as asof_event_id",
        "coalesce(asof_value, -1.0e0) as asof_value",
    )


def q_events_asof_oracle() -> str:
    return """
        select c.event_id, c.user_id,
               coalesce(v.event_id, -1) as asof_event_id,
               coalesce(v.value, -1.0e0) as asof_value
        from (select event_id, user_id, ts from events where event_type = 'click') c
        asof left join (select event_id, user_id, ts, value from events where event_type = 'view') v
          on c.user_id = v.user_id and c.ts >= v.ts
    """


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-GATED slice of the multimodal pipeline: the mapInPandas decode
    stub derives every scalar (format/width/height/n_frames) from sha256 of
    the payload bytes, so a DuckDB SQL re-derivation is an exact independent
    oracle for the Arrow-batched Python path (features stay rows-only in
    media_pipeline — float32 numpy semantics are not SQL-expressible)."""
    from ..operators import media
    from .convert_queries import FIXTURE_CORPUS

    corpus = spark.read.parquet(FIXTURE_CORPUS)
    feats = media.decode_media(media.extract_media_refs(corpus))
    frames = media.frame_sample(feats, every_n=2)
    return (
        feats.join(frames.groupBy("doc_id", "media_ref").count(), ["doc_id", "media_ref"])
        .selectExpr(
            "doc_id", "media_ref", "format", "width", "height", "n_frames",
            "cast(count as bigint) as n_sampled_frames",
        )
    )


def q_media_meta_oracle() -> str:
    from .convert_queries import FIXTURE_CORPUS

    byte = lambda i: f"cast(('0x' || substr(h, {2 * i + 1}, 2)) as int)"
    return f"""
        with m as (
            select doc_id, span.media_ref as media_ref,
                   sha256('blob:' || span.media_ref) as h
            from (select doc_id, unnest(spans) as span
                  from read_parquet('{FIXTURE_CORPUS}')) t
            where span.kind = 'media'
        )
        select doc_id, media_ref,
               (['stub_jpeg', 'stub_png', 'stub_webp'])[{byte(0)} % 3 + 1] as format,
               64 + ({byte(1)} % 16) * 32 as width,
               64 + ({byte(2)} % 16) * 32 as height,
               1 + {byte(3)} % 4 as n_frames,
               cast((1 + {byte(3)} % 4 + 1) // 2 as bigint) as n_sampled_frames
        from m
    """


QUERIES = {
    "tile_assign": (q_tile_assign, q_tile_assign_oracle),
    "polyfill": (q_polyfill, q_polyfill_oracle),
    "kring": (q_kring, q_kring_oracle),
    "pip": (q_pip, q_pip_oracle),
    "pip_celljoin": (q_pip_celljoin, q_pip_oracle),
    "knn": (q_knn, q_knn_oracle),
    "raster_zonal": (q_raster_zonal, q_raster_zonal_oracle),
    "assemble_poslist": (q_assemble, q_assemble_oracle),
    "zone_mapping": (q_zone_mapping, q_zone_mapping_oracle),
    "dedup_exact": (q_dedup_exact, q_dedup_exact_oracle),
    "minhash_signatures": (q_minhash, q_minhash_oracle),
    "minhash_lsh_pairs": (q_minhash_pairs, q_minhash_pairs_oracle),
    "simhash": (q_simhash, q_simhash_oracle),
    "textstats": (q_textstats, q_textstats_oracle),
    "embedding_topk": (q_embed_topk, q_embed_topk_oracle),
    "embedding_topk_ivf": (q_embed_topk_ivf, q_embed_topk_ivf_oracle),
    "embedding_near_dup": (q_embed_near_dup, q_embed_near_dup_oracle),
    "ngram_jaccard": (q_ngram_jaccard, q_ngram_jaccard_oracle),
    "events_window": (q_events_window, q_events_window_oracle),
    "polyfill_refined": (q_polyfill_refined, q_polyfill_refined_oracle),
    "cell_rollup": (q_cell_rollup, q_cell_rollup_oracle),
    "events_sessionize": (q_events_sessionize, q_events_sessionize_oracle),
    "events_rollup": (q_events_rollup, q_events_rollup_oracle),
    "events_quantiles": (q_events_quantiles, q_events_quantiles_oracle),
    "dedup_groups": (q_dedup_groups, q_dedup_groups_oracle),
    "events_asof": (q_events_asof, q_events_asof_oracle),
    "zone_stats": (q_zone_stats, q_zone_stats_oracle),
    "range_join": (q_range_join, q_range_join_oracle),
    "radius_join": (q_radius_join, q_radius_join_oracle),
    "zorder_key": (q_zorder_key, q_zorder_key_oracle),
    "media_meta": (q_media_meta, q_media_meta_oracle),
    "hll_distinct": (q_hll_distinct, q_hll_distinct_oracle),
    "cms_frequencies": (q_cms_frequencies, q_cms_frequencies_oracle),
    "corpus_split": (q_corpus_split, q_corpus_split_oracle),
    "stratified_sample": (q_stratified_sample, q_stratified_sample_oracle),
}

# conversion-pipeline queries (documents fixture → zones/groups/tiles/metrics),
# oracle-gated since round 2: both engines read the committed fixture parquet
from .convert_queries import CONVERT_QUERIES  # noqa: E402

QUERIES.update(CONVERT_QUERIES)


# rows-only queries (no SQL oracle: Arrow-batched media decode, streaming state)
def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: media spans → binary payload → mapInPandas decode
    (deterministic stub; sha256-keyed fake features) → resize → frame sampling.
    Rows-only: the Arrow-batched decode has no SQL oracle, but every value it
    emits is a pure function of media_ref, so the output is deterministic."""
    from ..operators import media
    from .convert_queries import FIXTURE_CORPUS

    corpus = spark.read.parquet(FIXTURE_CORPUS)
    refs = media.extract_media_refs(corpus)
    feats = media.resize_media(media.decode_media(refs), target_w=224, target_h=224)
    frames = media.frame_sample(feats, every_n=2)
    return (
        feats.join(frames.groupBy("doc_id", "media_ref").count(), ["doc_id", "media_ref"])
        .selectExpr(
            "doc_id", "media_ref", "format", "width", "height", "n_frames",
            "count as n_sampled_frames", "round(features[0], 6) as f0",
        )
    )


def q_streaming_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming path end to end: replay the committed fixture
    corpus as a file-source stream, run the availableNow tile-assign with a
    checkpoint, read the committed sink back and aggregate per cell.
    ORACLE-GATED: the per-cell index is arrival-order-independent, so a
    DuckDB span-explode + cell-math re-derivation over the SAME fixture
    parquet is an exact oracle for the streamed result."""
    import tempfile

    from ..streaming import stream as st
    from .convert_queries import FIXTURE_CORPUS

    tmp = tempfile.mkdtemp(prefix="graft_stream_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    corpus = spark.read.parquet(FIXTURE_CORPUS)
    corpus.repartition(8).write.mode("overwrite").parquet(src)
    assigned = st.streaming_tile_assign(st.read_document_stream(spark, src), res=8)
    st.run_stream_to_parquet(assigned, out, ckpt).awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("quad_cell")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("hex_cell").alias("n_hex"),
        )
    )


def q_streaming_tiles_oracle() -> str:
    from .convert_queries import FIXTURE_CORPUS

    return f"""
        with nodes as (
            select doc_id,
                   cast(cast(span.text as json)->'$.lat' as double) as lat,
                   cast(cast(span.text as json)->'$.lon' as double) as lon
            from (select doc_id, unnest(spans) as span
                  from read_parquet('{FIXTURE_CORPUS}')) t
            where span.kind = 'osm_node'
        )
        select {geo.quad_cell('lat', 'lon', 8, DUCK)} as quad_cell,
               cast(count(distinct doc_id) as bigint) as n_docs,
               cast(count(distinct {geo.hex_cell('lat', 'lon', 8, DUCK)}) as bigint) as n_hex
        from nodes group by 1
    """


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over a replayed document stream
    (dropDuplicatesWithinWatermark, availableNow, parquet sink + checkpoint).
    ORACLE-GATED despite being a streaming query: the surviving content-hash
    SET is arrival-order-independent, so `select distinct md5(text)` is an
    exact batch oracle for the streamed result."""
    import tempfile

    from ..streaming import stream as st

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tmp = tempfile.mkdtemp(prefix="graft_sdedup_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    docs.repartition(8).write.mode("overwrite").parquet(src)
    stream_df = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    deduped = st.streaming_dedup_exact(stream_df)
    (
        deduped.select("content_hash")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).select("content_hash").distinct()


def q_streaming_dedup_oracle() -> str:
    return "select distinct md5(text) as content_hash from documents"


def q_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming running top-k docs per cell via custom bounded state
    (applyInPandasWithState, k entries/cell).  ORACLE-GATED: the score is a
    deterministic portable hash of doc_id, so the final top-k set is
    arrival-order-independent and a DuckDB window-rank over the same
    fixture re-derives it exactly."""
    import tempfile

    from ..streaming import stateful, stream as st
    from .convert_queries import FIXTURE_CORPUS

    tmp = tempfile.mkdtemp(prefix="graft_topk_")
    corpus = spark.read.parquet(FIXTURE_CORPUS)
    corpus.repartition(8).write.mode("overwrite").parquet(f"{tmp}/src")
    assigned = st.streaming_tile_assign(
        st.read_document_stream(spark, f"{tmp}/src"), res=8
    )
    score = prand(concat_str(["'score:'", "doc_id"], SPARK), SPARK)
    scored = assigned.selectExpr("quad_cell", "doc_id", f"{score} as score")
    stateful.run_stateful_to_memory(
        spark, stateful.stateful_topk_per_cell(scored, k=3), name="q_topk"
    )
    w = Window.partitionBy("quad_cell")
    return (
        spark.table("q_topk")
        .withColumn("mx", F.max("seen").over(w))
        .where("seen = mx")
        .selectExpr("quad_cell", "doc_id", "round(score, 9) as score")
    )


def q_streaming_topk_oracle() -> str:
    from .convert_queries import FIXTURE_CORPUS

    score = prand(concat_str(["'score:'", "doc_id"], DUCK), DUCK)
    return f"""
        with nodes as (
            select doc_id,
                   cast(cast(span.text as json)->'$.lat' as double) as lat,
                   cast(cast(span.text as json)->'$.lon' as double) as lon
            from (select doc_id, unnest(spans) as span
                  from read_parquet('{FIXTURE_CORPUS}')) t
            where span.kind = 'osm_node'
        ),
        assigned as (
            select distinct doc_id, {geo.quad_cell('lat', 'lon', 8, DUCK)} as quad_cell
            from nodes
        ),
        ranked as (
            select quad_cell, doc_id, {score} as score,
                   row_number() over (partition by quad_cell
                                      order by {score} desc, doc_id asc) as rn
            from assigned
        )
        select quad_cell, doc_id, round(score, 9) as score from ranked where rn <= 3
    """


def q_streaming_stateful_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-cell
    bounded-state HLL distinct-doc sketch, update-mode memory sink, availableNow.
    Rows-only: deterministic (register max is order-independent), no SQL oracle."""
    import tempfile

    from ..sources import documents as docs_src
    from ..streaming import stateful, stream as st

    tmp = tempfile.mkdtemp(prefix="graft_hll_")
    corpus = docs_src.synthesize_corpus(spark, n_docs=400, n_zones=16, n_groups=4, n_points=120)
    corpus.repartition(8).write.mode("overwrite").parquet(f"{tmp}/src")
    assigned = st.streaming_tile_assign(
        st.read_document_stream(spark, f"{tmp}/src"), res=8
    ).select("doc_id", "quad_cell")
    stateful.run_stateful_to_memory(
        spark, stateful.stateful_cell_counts(assigned), name="q_hll"
    )
    w = Window.partitionBy("quad_cell").orderBy(F.col("n_rows").desc())
    return (
        spark.table("q_hll")
        .withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select("quad_cell", "n_rows", "n_docs_est")
    )


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window sessions over a replayed event stream (availableNow,
    complete mode): the streaming twin of events_sessionize.  ORACLE-GATED:
    the session set is arrival-order-independent, so a DuckDB lag+cumsum
    re-derivation (with session_window's >=gap break semantics and
    end = last_ts + gap) is an exact batch oracle; timestamps compare as
    fractional epoch seconds (session tz pinned UTC), immune to
    timestamp-to-string formatting differences."""
    import tempfile

    from ..streaming import stream as st

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = tempfile.mkdtemp(prefix="graft_sess_")
    ev.repartition(5).write.mode("overwrite").parquet(f"{tmp}/src")
    stream_df = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/src")
    )
    sess = st.streaming_cell_sessions(stream_df, gap="30 minutes", watermark="365 days")
    q = (
        sess.writeStream.format("memory")
        .queryName("q_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("q_sessions").selectExpr(
        "user_id",
        "round(unix_micros(session_start) / 1.0e6, 6) as session_start",
        "round(unix_micros(session_end) / 1.0e6, 6) as session_end",
        "n_events",
        "sum_value_q6",
    )


def q_streaming_sessions_oracle() -> str:
    # session_window semantics: strict merge (break when gap >= 1800s);
    # window end = last event + gap
    g = "epoch(ts) - epoch(lag(ts) over w)"
    return f"""
        with flagged as (
            select user_id, event_id, ts, value,
                   case when ({g}) is null or ({g}) >= 1800 then 1 else 0 end as brk
            from events
            window w as (partition by user_id order by ts asc, event_id asc)
        ),
        sessioned as (
            select user_id, ts, value,
                   cast(sum(brk) over (partition by user_id order by ts asc, event_id asc
                                  rows between unbounded preceding and current row)
                        as bigint) as session_idx
            from flagged
        )
        select user_id,
               round(epoch(min(ts)), 6) as session_start,
               round(epoch(max(ts)) + 1800, 6) as session_end,
               cast(count(*) as bigint) as n_events,
               cast(sum(cast(floor(value * 1.0e6 + 0.5e0) as bigint)) as bigint)
                   as sum_value_q6
        from sessioned group by user_id, session_idx
    """


# oracle-gated despite streaming: output set is arrival-order-independent
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase ← preceding 24 h of clicks per
    user), replayed from files with availableNow.  ORACLE-GATED: the emitted
    pair set is arrival-order-independent (each qualifying pair exactly
    once), so the batch interval join is an exact oracle."""
    import tempfile

    from ..streaming import stream as st

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = tempfile.mkdtemp(prefix="graft_ssjoin_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    events.repartition(8).write.mode("overwrite").parquet(src)

    def side(tp: str) -> DataFrame:
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
            .where(F.col("event_type") == tp)
        )

    joined = st.streaming_interval_join(side("purchase"), side("click"))
    (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).select("left_event_id", "right_event_id")


def q_streaming_interval_join_oracle() -> str:
    return """
        select p.event_id as left_event_id, c.event_id as right_event_id
        from events p join events c
          on p.user_id = c.user_id
         and p.event_type = 'purchase' and c.event_type = 'click'
         and c.ts >= p.ts - interval 24 hour and c.ts <= p.ts
    """


QUERIES["streaming_interval_join"] = (
    q_streaming_interval_join,
    q_streaming_interval_join_oracle,
)
QUERIES["streaming_dedup"] = (q_streaming_dedup, q_streaming_dedup_oracle)
QUERIES["streaming_sessions"] = (q_streaming_sessions, q_streaming_sessions_oracle)
QUERIES["streaming_tiles"] = (q_streaming_tiles, q_streaming_tiles_oracle)
QUERIES["streaming_topk"] = (q_streaming_topk, q_streaming_topk_oracle)

ROWS_ONLY = {
    "media_pipeline": q_media_pipeline,
    "streaming_stateful_hll": q_streaming_stateful_hll,
}


_BM25_TERMS = ["spark", "join", "window", "vector"]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: global top-15 docs for a fixed query-term bag.
    Postings pruned before explode; corpus stats + df broadcast; top-k via
    TakeOrderedAndProject (operators/retrieval.py)."""
    from ..operators import retrieval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return retrieval.bm25_topk(docs, _BM25_TERMS, k=15)


def q_bm25_topk_oracle() -> str:
    from ..operators import retrieval

    return retrieval.bm25_topk_oracle_sql(_BM25_TERMS, k=15)


QUERIES["bm25_topk"] = (q_bm25_topk, q_bm25_topk_oracle)


def q_poly_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-polygon overlap join: cell-cover prefilter + distinct pairs +
    exact vertex/edge-crossing refine (operators/overlap.py).  Oracle is the
    brute O(n²) cross join with the identical exact predicate."""
    from ..operators import overlap

    register_geometry_views(spark, sf_dir)
    # materialize the synthesized rings first (poly-table-sized, tiny):
    # inlined, the ring-generator expression composes into the cover AND
    # both ring join-back branches' codegen — 25 s of compile vs 3 s with
    # the barrier at sf0.1 (same class as q_dissolve's shrunk-ring note)
    polys = spark.table("geo_polys").localCheckpoint(eager=True)
    return overlap.polygon_overlap_join(polys, res=12)


def q_poly_overlap_oracle() -> str:
    pred = geo.polygons_overlap("a.pos_list", "b.pos_list", DUCK)
    return (
        f"{duck_geometry_ctes()} "
        f"select a.zone_id as id_a, b.zone_id as id_b "
        f"from geo_polys a cross join geo_polys b "
        f"where a.zone_id < b.zone_id and {pred}"
    )


QUERIES["poly_overlap"] = (q_poly_overlap, q_poly_overlap_oracle)


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality gate -> exact dedup -> near-dup
    group removal -> split assignment, one composed plan (operators/
    curation.py); the oracle replays every stage in one DuckDB query."""
    from ..operators import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curation.curate_corpus(docs, quality_min=0.63)


def q_curate_corpus_oracle() -> str:
    from ..operators import curation

    return curation.curate_corpus_oracle_sql(quality_min=0.63)


QUERIES["curate_corpus"] = (q_curate_corpus, q_curate_corpus_oracle)


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point Lloyd k-means (operators/clustering.py): iterative, yet
    value-hash-gated — exact integer arithmetic makes every iteration
    bit-identical across engines and partitionings."""
    from ..operators import clustering

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return clustering.kmeans_fixed_point(emb, k=8, iters=3)


def q_kmeans_oracle() -> str:
    from ..operators import clustering

    return clustering.kmeans_oracle_sql(k=8, iters=3, dim=64)


QUERIES["kmeans"] = (q_kmeans, q_kmeans_oracle)


def q_cover_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-style cover compaction: the refined res-9 quad cover of each zone
    compacted to mixed res 7-9 (complete 4-sibling sets -> parent,
    operators.tiling.compact_cover).  Canonical minimal index form."""
    register_geometry_views(spark, sf_dir)
    from ..operators import tiling

    cov = tiling.cover_cells(
        spark.table("geo_polys"), "zone_id", 9, "quad", keep=("pos_list",)
    ).where(
        F.expr(f"({geo.quad_cell_classify('cell', 'pos_list', 9, SPARK)}) > 0")
    ).select("zone_id", "cell")
    return tiling.compact_cover(cov, "zone_id", res_hi=9, res_lo=7)


def q_cover_compact_oracle() -> str:
    pow_res = 2**geo.QUAD_RES_BITS
    p9 = geo.quad_parent("cell", 9, DUCK)
    p8 = geo.quad_parent("cell", 8, DUCK)
    return f"""{duck_geometry_ctes()},
        cov as (
            select zone_id, unnest({geo.quad_cover_refined('pos_list', 9, DUCK)}) as cell
            from geo_polys
        ),
        l9 as (
            select zone_id, cell,
                   count(*) over (partition by zone_id, {p9}) as n,
                   min(cell) over (partition by zone_id, {p9}) as mn
            from cov
        ),
        s9 as (
            select zone_id, case when n = 4 then {p9} else cell end as cell
            from l9 where n < 4 or cell = mn
        ),
        l8 as (
            select zone_id, cell,
                   count(*) over (partition by zone_id, {p8}) as n,
                   min(cell) over (partition by zone_id, {p8}) as mn
            from s9 where cell // {pow_res} = 8
        ),
        s8 as (
            select zone_id, case when n = 4 then {p8} else cell end as cell
            from l8 where n < 4 or cell = mn
        )
        select zone_id, cell from s9 where cell // {pow_res} != 8
        union all
        select zone_id, cell from s8"""


QUERIES["cover_compact"] = (q_cover_compact, q_cover_compact_oracle)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank, 5 iterations over the deterministic
    skewed link graph (operators.graph) — iterative yet value-hash-gated."""
    from ..operators import graph

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.pagerank(spark, docs, n_iter=5)


def q_pagerank_oracle() -> str:
    from ..operators import graph

    return graph.pagerank_oracle_sql("documents", n_iter=5)


QUERIES["pagerank"] = (q_pagerank, q_pagerank_oracle)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis-Spirakis weighted reservoir: top-20 docs per
    language by ln(u)/w key, w = n_chars — P(selection) proportional to doc
    length, zero RNG state, stable under any partitioning."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.weighted_sample(
        docs, k=20, id_col="doc_id", weight_col="n_chars", stratum_col="lang"
    )


def q_weighted_sample_oracle() -> str:
    from ..operators import sampling

    key = sampling.es_key_expr("doc_id", "n_chars", DUCK)
    return f"""
        select doc_id, lang, rank from (
            select doc_id, lang,
                   row_number() over (partition by lang order by {key} desc, doc_id) as rank
            from documents)
        where rank <= 20"""


QUERIES["weighted_sample"] = (q_weighted_sample, q_weighted_sample_oracle)


def q_snap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-segment snap (map-matching-lite): each point bound to the
    closest polyline segment within 2 km — padded-bbox cell prefilter + exact
    planar refine + per-point window argmin (operators.distjoin.snap_join)."""
    from ..operators import distjoin

    register_geometry_views(spark, sf_dir)
    return distjoin.snap_join(
        spark.table("geo_points"),
        spark.table("geo_polys"),
        radius_m=2000.0,
        res=14,
    )


def q_snap_join_oracle() -> str:
    from ..operators import distjoin

    dist = distjoin.seg_dist_m("p.lat", "p.lon", "s.say", "s.sax", "s.sby", "s.sbx", DUCK)
    return f"""{duck_geometry_ctes()},
        segs as (
            select zone_id, t.i as seg_idx,
                   pos_list[2*t.i - 1] as say, pos_list[2*t.i] as sax,
                   pos_list[2*t.i + 1] as sby, pos_list[2*t.i + 2] as sbx
            from geo_polys, unnest(generate_series(1, len(pos_list) // 2 - 1)) t(i)
        ),
        cand as (
            select p.point_id, s.zone_id, s.seg_idx, {dist} as d
            from geo_points p cross join segs s
        )
        select point_id, zone_id, seg_idx, round(d, 6) as dist_m
        from (select *, row_number() over (partition by point_id order by d, zone_id, seg_idx) as rn
              from cand where d <= 2000.0e0)
        where rn = 1"""


QUERIES["snap_join"] = (q_snap_join, q_snap_join_oracle)


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy hitters: top-10 tokens per language (map-side-combined
    term counts, window over the vocabulary not the corpus)."""
    from ..operators import retrieval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return retrieval.top_terms(docs, n=10)


def q_top_terms_oracle() -> str:
    from ..functions import text as tx

    return f"""
        select lang, term, n_occ, rank from (
            select lang, term, count(*) as n_occ,
                   row_number() over (partition by lang order by count(*) desc, term) as rank
            from (select lang, unnest({tx.tokens('text', DUCK)}) as term from documents)
            group by lang, term)
        where rank <= 10"""


QUERIES["top_terms"] = (q_top_terms, q_top_terms_oracle)


def q_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard geohash (base32) of every point at precision 8 — interchange
    cell encoding with free hierarchical prefix containment."""
    from ..sources import layout

    register_geometry_views(spark, sf_dir)
    return spark.sql(
        "select point_id, "
        + layout.geohash_expr("lat", "lon", 8, SPARK)
        + " as gh from geo_points"
    )


def q_geohash_oracle() -> str:
    from ..sources import layout

    return (
        f"{duck_geometry_ctes()} select point_id, "
        + layout.geohash_expr("lat", "lon", 8, DUCK)
        + " as gh from geo_points"
    )


QUERIES["geohash"] = (q_geohash, q_geohash_oracle)


def q_adaptive_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quadtree partition: coarsest res in 9-11 whose cell holds
    <= 100 points (the skew-bounding partitioner, closed-form — no driver
    iteration)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.adaptive_partition(
        spark.table("geo_points"), cap=100, res_lo=9, res_hi=11
    )


def q_adaptive_cells_oracle() -> str:
    cells = {r: geo.quad_cell("lat", "lon", r, DUCK) for r in (9, 10, 11)}
    return f"""{duck_geometry_ctes()},
        pts as (select point_id, {cells[9]} as c9, {cells[10]} as c10, {cells[11]} as c11
                from geo_points),
        n9 as (select c9, count(*) as k9 from pts group by c9),
        n10 as (select c10, count(*) as k10 from pts group by c10)
        select point_id,
               case when k9 <= 100 then c9 when k10 <= 100 then c10 else c11 end as cell,
               case when k9 <= 100 then 9 when k10 <= 100 then 10 else 11 end as res
        from pts join n9 using (c9) join n10 using (c10)"""


QUERIES["adaptive_cells"] = (q_adaptive_cells, q_adaptive_cells_oracle)


def stations_sql(d: str, table: str = "supplier") -> str:
    """Deterministic weather-station-style points with a measured value —
    same center derivation as polys_sql, plus a hash value in [0, 2000)."""
    pr_lat = _pr(["'z:lat:'", "s_suppkey"], d)
    clat = f"({flit(LAT_LO + 0.05)} + {pr_lat} * {flit(DLAT - 0.1)})"
    pr_lon = _pr(["'z:lon:'", "s_suppkey"], d)
    clon = f"({flit(LON_LO + 0.05)} + {pr_lon} * {flit(DLON - 0.1)})"
    pr_v = _pr(["'st:v:'", "s_suppkey"], d)
    v = f"({pr_v} * 2000.0e0)"
    return (
        f"select s_suppkey as station_id, {clat} as lat, {clon} as lon, "
        f"{v} as value from {table}"
    )


def q_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW-2 interpolation of station values onto points within 20 km —
    ring-join candidates + order-free sorted weight fold."""
    from ..operators import raster as R

    register_geometry_views(spark, sf_dir)
    stations = spark.sql(stations_sql(SPARK))
    return R.idw_interpolate(
        spark.table("geo_points"), stations, radius_m=20000.0, res=11
    )


def q_idw_oracle() -> str:
    hav = haversine_m("p.lat", "p.lon", "s.lat", "s.lon", DUCK)
    w = "1.0e0 / (greatest(dist_m, 1.0e0) * greatest(dist_m, 1.0e0))"
    return f"""{duck_geometry_ctes()},
        stations as ({stations_sql(DUCK)}),
        pairs as (
            select p.point_id as pid, s.station_id as sid,
                   round({hav}, 6) as dist_m, s.value as v
            from geo_points p cross join stations s
            where {hav} <= 20000.0e0
        ),
        contrib as (
            select pid, sid, {w} as w, ({w}) * v as wv from pairs
        ),
        per as (
            select pid,
                   list_reduce(list_prepend(0.0e0, list_transform(
                       list_sort(list(struct_pack(sid := sid, w := w, wv := wv))),
                       x -> x.w)), (s, v) -> s + v) as sw,
                   list_reduce(list_prepend(0.0e0, list_transform(
                       list_sort(list(struct_pack(sid := sid, w := w, wv := wv))),
                       x -> x.wv)), (s, v) -> s + v) as swv,
                   count(*) as n_stations
            from contrib group by pid
        )
        select pid as point_id, round(swv / sw, 6) as idw_value, n_stations
        from per"""


QUERIES["idw"] = (q_idw, q_idw_oracle)


def q_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-4 Douglas-Peucker simplification of every zone ring at 0.005 deg
    tolerance — kept-vertex set, deterministic argmax splits."""
    from ..operators import simplify

    register_geometry_views(spark, sf_dir)
    return simplify.simplify_dp(
        spark.table("geo_polys"), eps_deg=0.005, k_rounds=4
    )


def q_simplify_oracle() -> str:
    from ..operators import simplify

    return duck_geometry_ctes() + simplify.simplify_dp_oracle_sql(
        "geo_polys", eps_deg=0.005, k_rounds=4, with_prefix=False
    )


QUERIES["simplify"] = (q_simplify, q_simplify_oracle)


def q_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory trip segmentation + movement stats (path via order-free
    sorted leg fold, endpoints via struct min/max)."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.trip_stats(spark, ev)


def q_trips_oracle() -> str:
    from ..operators import trajectory

    return trajectory.trip_stats_sql(DUCK, "events")


QUERIES["trips"] = (q_trips, q_trips_oracle)


def q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point detection (stop/move segmentation, Li et al. 2008 shape):
    distance-rule runs + duration/count gates, integer-fold centroids."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.stay_points(spark, ev)


def q_stay_points_oracle() -> str:
    from ..operators import trajectory

    return trajectory.stay_points_sql(DUCK, "events")


QUERIES["stay_points"] = (q_stay_points, q_stay_points_oracle)


def q_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction: filter built over big-spender
    custkeys (orders > 40k), probed by every customer; output carries the
    deterministic might_contain verdict AND exact membership, so the false
    positives themselves are value-hash-gated."""
    from ..operators import bloom

    register_geometry_views(spark, sf_dir)
    keys = (
        spark.table("orders")
        .where("o_totalprice > 40000.0e0")
        .selectExpr("o_custkey as k")
        .distinct()
    )
    bits = bloom.bloom_build(keys, "k", m_bits=2048, k_hashes=3)
    probes = spark.table("customer").selectExpr("c_custkey as k")
    out = bloom.bloom_probe(probes, bits, "k", m_bits=2048, k_hashes=3)
    actual = keys.selectExpr("k", "true as actual")
    return out.join(actual, "k", "left").selectExpr(
        "k as cust_key", "might_contain", "coalesce(actual, false) as actual"
    )


def q_bloom_oracle() -> str:
    from ..operators import bloom

    bits = ", ".join(
        bloom.bit_expr("k", s, 2048, DUCK) for s in range(3)
    )
    return f"""
        with keys as (select distinct o_custkey as k from orders
                      where o_totalprice > 40000.0e0),
        bts as (select distinct bit from (
            {' union all '.join(f'select {bloom.bit_expr("k", s, 2048, DUCK)} as bit from keys' for s in range(3))}
        )),
        probes as (select c_custkey as k from customer),
        pr as (select k, unnest([{bits}]) as bit from probes),
        hits as (select k from pr join bts using (bit)
                 group by k having count(*) = 3)
        select p.k as cust_key,
               (h.k is not null) as might_contain,
               (kk.k is not null) as actual
        from probes p
        left join hits h on p.k = h.k
        left join keys kk on p.k = kk.k"""


QUERIES["bloom"] = (q_bloom, q_bloom_oracle)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 10 != 0) flagged by
    4-gram overlap with the held-out eval slice (doc_id % 10 == 0); eval
    shingle-hash set is broadcast, the corpus is never shuffled by shingle."""
    from ..operators import contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.where("doc_id % 10 <> 0")
    ev = docs.where("doc_id % 10 = 0")
    return contamination.decontaminate(train, ev, n_shingle=4)


def q_decontaminate_oracle() -> str:
    from ..operators import contamination

    return contamination.decontaminate_oracle_sql(
        "doc_id % 10 <> 0", "doc_id % 10 = 0", n_shingle=4
    )


QUERIES["decontaminate"] = (q_decontaminate, q_decontaminate_oracle)


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: duplicate-2gram occurrence
    fraction and top-2gram character coverage per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.repetition_stats(docs, n=2)


def q_repetition_oracle() -> str:
    return textstats.repetition_stats_oracle_sql(n=2)


QUERIES["repetition"] = (q_repetition, q_repetition_oracle)


def q_line_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polyline crossing join: ring segments of odd zones × even zones,
    properly-crossing pairs with the intersection point (cell-cover
    prefilter, dedup before refine — operators.distjoin)."""
    from ..operators import distjoin

    register_geometry_views(spark, sf_dir)
    polys = spark.table("geo_polys")
    return distjoin.line_intersection_join(
        polys.where("zone_id % 2 = 1"), polys.where("zone_id % 2 = 0"), res=12
    )


def q_line_intersect_oracle() -> str:
    from ..operators import distjoin

    body = distjoin.line_intersection_oracle_sql(
        "(select * from geo_polys where zone_id % 2 = 1)",
        "(select * from geo_polys where zone_id % 2 = 0)",
    )
    return f"{duck_geometry_ctes()} {body}"


QUERIES["line_intersect"] = (q_line_intersect, q_line_intersect_oracle)


def q_smooth_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel-smoothed cell density heatmap (quad res 12, Chebyshev k=2):
    integer-scaled weights fold exactly, one double division at the end."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.smooth_density(spark.table("geo_points"), res=12, k=2)


def q_smooth_density_oracle() -> str:
    from ..operators import tiling

    return tiling.smooth_density_oracle_sql(points_sql(DUCK), res=12, k=2)


QUERIES["smooth_density"] = (q_smooth_density, q_smooth_density_oracle)


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN spatial clustering (eps 2 km, min_pts 3): radius_join pairs →
    core counts → connected components over core-core edges → deterministic
    min-label borders; noise = -1 (operators.clustering.dbscan)."""
    from ..operators import clustering

    register_geometry_views(spark, sf_dir)
    return clustering.dbscan(spark.table("geo_points"), eps_m=2000.0, min_pts=3, res=13)


def q_dbscan_oracle() -> str:
    from ..operators import clustering

    body = clustering.dbscan_oracle_sql(points_sql(DUCK), eps_m=2000.0, min_pts=3)
    return body


QUERIES["dbscan"] = (q_dbscan, q_dbscan_oracle)


def q_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-preserving chunk packing of the interleaved text+media fixture
    corpus: budget-64 chunks, media spans cost 16, spans never split or
    reordered (operators.chunking)."""
    from ..operators import chunking
    from .convert_queries import FIXTURE_CORPUS

    corpus = spark.read.parquet(FIXTURE_CORPUS)
    return chunking.chunk_documents(corpus, token_budget=64, media_token_cost=16)


def q_chunk_spans_oracle() -> str:
    from ..operators import chunking
    from .convert_queries import FIXTURE_CORPUS

    return chunking.chunk_documents_oracle_sql(
        FIXTURE_CORPUS, token_budget=64, media_token_cost=16
    )


QUERIES["chunk_spans"] = (q_chunk_spans, q_chunk_spans_oracle)


def q_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value trend: exact integer sums (centered seconds ×
    half-up-quantized values), one shuffle, two float divisions at the end."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    return temporal.trend_fit(spark.table("events"))


def q_trend_fit_oracle() -> str:
    from ..operators import temporal

    return temporal.trend_fit_oracle_sql()


QUERIES["trend_fit"] = (q_trend_fit, q_trend_fit_oracle)


def _hll_setops_sql(d: str) -> str:
    """HLL sketch SET ALGEBRA: union via per-register max (the property that
    makes HLL mergeable across partitions/days/tables without re-scanning),
    intersection via inclusion-exclusion — next to the exact answers.

    A = click users with value > 120, B = purchase users with value > 120
    (overlapping but distinct subsets).  Register sums stay integer
    (Σ 2^(53-M_j)) exactly as _hll_distinct_sql; merging sketches is a
    256-row full-outer max — constant cost no matter the corpus."""
    from ..functions import sketch

    reg = sketch.hll_register("user_id", d)
    rho = sketch.hll_rho("user_id", d)
    term = (
        "shiftleft(cast(1 as bigint), 53 - m)" if d == SPARK
        else "(cast(1 as bigint) << (53 - m))"
    )
    m_regs = sketch.M_REGISTERS
    numer = sketch.ALPHA_256 * m_regs * m_regs * float(2**53)
    est = (
        lambda s, n: f"({numer!r} / cast({s} + ({m_regs} - {n}) * cast({2**53} as bigint) as double))"
    )
    return f"""
        with a as (select distinct user_id from events
                   where event_type = 'click' and value > 120.0e0),
        b as (select distinct user_id from events
              where event_type = 'purchase' and value > 120.0e0),
        ra as (select {reg} as j, max({rho}) as m from a group by {reg}),
        rb as (select {reg} as j, max({rho}) as m from b group by {reg}),
        ru as (
            select coalesce(ra.j, rb.j) as j,
                   greatest(coalesce(ra.m, 0), coalesce(rb.m, 0)) as m
            from ra full outer join rb on ra.j = rb.j
        ),
        sa as (select sum({term}) as s, cast(count(*) as bigint) as n from ra),
        sb as (select sum({term}) as s, cast(count(*) as bigint) as n from rb),
        su as (select sum({term}) as s, cast(count(*) as bigint) as n from ru),
        ex as (
            select cast(count(*) as bigint) as exact_intersection
            from (select user_id from a) ia
            join (select user_id from b) ib using (user_id)
        ),
        exu as (
            select cast(count(distinct user_id) as bigint) as exact_union
            from (select user_id from a union all select user_id from b) u
        )
        select round({est('sa.s', 'sa.n')}, 6) as est_a,
               round({est('sb.s', 'sb.n')}, 6) as est_b,
               round({est('su.s', 'su.n')}, 6) as est_union,
               round({est('sa.s', 'sa.n')} + {est('sb.s', 'sb.n')}
                     - {est('su.s', 'su.n')}, 6) as est_intersection,
               ex.exact_intersection, exu.exact_union
        from sa, sb, su, ex, exu"""


def q_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch union (register max merge) + inclusion-exclusion
    intersection, beside exact answers — bit-exact integer register sums."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_hll_setops_sql(SPARK))


def q_hll_setops_oracle() -> str:
    return _hll_setops_sql(DUCK)


QUERIES["hll_setops"] = (q_hll_setops, q_hll_setops_oracle)


def _bfs_sources_sql(d: str, res: int) -> str:
    ix, iy = geo.quad_ixy("lat", "lon", res, d)
    return (
        f"select {ix} as cell_x, {iy} as cell_y from geo_points "
        f"where point_id % 20 = 0"
    )


def _bfs_blocked_sql(d: str, res: int) -> str:
    """Obstacle cells: REFINED covers (center-inside or edge-overlap — the
    tight covering, not the blanket bbox) of every 10th polygon, unpacked to
    grid coordinates."""
    ix, iy = geo.quad_unpack("cell", res, d)
    cover = geo.quad_cover_refined("pos_list", res, d)
    inner = (
        f"select explode({cover}) as cell from geo_polys where zone_id % 10 = 0"
        if d == SPARK
        else f"select unnest({cover}) as cell from geo_polys where zone_id % 10 = 0"
    )
    return f"select {ix} as cell_x, {iy} as cell_y from ({inner}) t"


def q_grid_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isochrone grid BFS: 6-step multi-source frontier expansion at quad
    res 12 from sampled stop cells, refined polygon covers as obstacles
    (operators.graph.grid_bfs)."""
    from ..operators import graph

    register_geometry_views(spark, sf_dir)
    res, k = 12, 6
    sources = spark.sql(f"{_bfs_sources_sql(SPARK, res)}")
    blocked = spark.sql(f"{_bfs_blocked_sql(SPARK, res)}")
    return graph.grid_bfs(sources, blocked, max_dist=k, res=res)


def q_grid_bfs_oracle() -> str:
    from ..operators import graph

    res, k = 12, 6
    body = graph.grid_bfs_oracle_sql(
        _bfs_sources_sql(DUCK, res), _bfs_blocked_sql(DUCK, res), max_dist=k, res=res
    )
    # graph.grid_bfs_oracle_sql opens its own `with recursive`; splice the
    # geometry CTEs into it
    return body.replace(
        "with recursive", f"{duck_geometry_ctes().replace('with ', 'with recursive ')},", 1
    )


QUERIES["grid_bfs"] = (q_grid_bfs, q_grid_bfs_oracle)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase per user: chained
    conditional-min aggregations, integer epoch micros throughout."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    return temporal.funnel(spark.table("events"), ["view", "click", "purchase"])


def q_funnel_oracle() -> str:
    from ..operators import temporal

    return temporal.funnel_oracle_sql(["view", "click", "purchase"])


QUERIES["funnel"] = (q_funnel, q_funnel_oracle)


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid resampling with linear interpolation per user: exact
    bucket means (integer sums), fixed-op-order interpolation."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    return temporal.gap_fill(spark.table("events"), bucket_s=3600)


def q_gap_fill_oracle() -> str:
    from ..operators import temporal

    return temporal.gap_fill_oracle_sql(bucket_s=3600)


QUERIES["gap_fill"] = (q_gap_fill, q_gap_fill_oracle)


def _hist_quantiles_sql(d: str, width: float = 5.0, qs=(0.5, 0.9, 0.99)) -> str:
    """Mergeable histogram quantile sketch beside exact percentiles.

    The fourth sketch of the family (CMS=frequency, HLL=distinct,
    Bloom=membership, histogram=quantiles): per event_type, value counts in
    fixed ``width`` buckets — a table of (key, bucket, cnt) rows, mergeable
    by ADDITION like the others, constant-size per key no matter the corpus.
    Quantile estimate = bucket lower edge + linear interpolation within the
    bucket at rank q·n (integer cumsums; the interpolation is the only float
    arithmetic, fixed op order).  The exact percentile_cont runs beside it so
    the approximation error is visible in the gated output.
    """
    yq = "cast(floor(value * 100.0e0 + 0.5e0) as bigint)"
    wq = int(round(width * 100))
    bkt = f"({yq} div {wq})" if d == SPARK else f"({yq} // {wq})"
    est_cols = []
    for q in qs:
        tag = str(q).replace("0.", "p")
        # rank in [0, n-1] at quantile q, half-up; compare against cumulative
        # counts to find the owning bucket, interpolate inside it
        est_cols.append(
            f"""max(case when cum_hi > rank_{tag} and cum_lo <= rank_{tag} then
                round((bucket * {wq} + {wq}.0e0 *
                       (cast(rank_{tag} - cum_lo as double) / cast(cnt as double)))
                      / 100.0e0, 9) end) as est_{tag}"""
        )
        # declared per-row below
    ranks = ", ".join(
        f"cast(floor({q!r}e0 * cast(n - 1 as double) + 0.5e0) as bigint) as rank_{str(q).replace('0.', 'p')}"
        for q in qs
    )
    exact = ", ".join(
        f"round(quantile_cont(value, {q!r}e0), 9) as exact_{str(q).replace('0.', 'p')}"
        if d == DUCK
        else f"round(percentile(value, {q!r}e0), 9) as exact_{str(q).replace('0.', 'p')}"
        for q in qs
    )
    win = "partition by event_type order by bucket rows between unbounded preceding and current row"
    return f"""
        with hist as (
            select event_type, {bkt} as bucket,
                   cast(count(*) as bigint) as cnt
            from events group by event_type, {bkt}
        ),
        cum as (
            select event_type, bucket, cnt,
                   sum(cnt) over ({win}) as cum_hi,
                   sum(cnt) over ({win}) - cnt as cum_lo
            from hist
        ),
        tot as (select event_type, sum(cnt) as n from hist group by event_type),
        ranked as (
            select c.*, t.n, {ranks}
            from cum c join tot t on c.event_type = t.event_type
        ),
        ests as (
            select event_type, max(n) as n, {', '.join(est_cols)}
            from ranked group by event_type
        ),
        ex as (select event_type, {exact} from events group by event_type)
        select e.event_type, cast(e.n as bigint) as n,
               {', '.join('e.est_' + str(q).replace('0.', 'p') for q in qs)},
               {', '.join('x.exact_' + str(q).replace('0.', 'p') for q in qs)}
        from ests e join ex x on e.event_type = x.event_type"""


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch (mergeable bucket-count rows) with exact
    percentile_cont beside the estimates."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_hist_quantiles_sql(SPARK))


def q_hist_quantiles_oracle() -> str:
    return _hist_quantiles_sql(DUCK)


QUERIES["hist_quantiles"] = (q_hist_quantiles, q_hist_quantiles_oracle)


def _anomaly_sql(d: str, z_thresh: float = 3.0) -> str:
    """Z-score outlier detection per event_type — exact integer moment sums.

    Σy and Σy² over half-up-quantized values are order-free bigint folds
    (map-side combinable; |Σy²| < 2^63 to ~10^9 rows/type at this value
    range — quantization scale is the knob beyond that); mean and sample
    std are two deterministic float ops on them, z a fixed op sequence.
    Shape: one partial-agg pass for the 5-row stats table, broadcast back
    into a second scan — both scans parallel, no wide shuffle.
    """
    yq = "cast(floor(value * 100.0e0 + 0.5e0) as bigint)"
    return f"""
        with s as (
            select event_type, cast(count(*) as bigint) as n,
                   sum({yq}) as sy, sum({yq} * {yq}) as syy
            from events group by event_type
        ),
        st as (
            select event_type, n,
                   (cast(sy as double) / cast(n as double)) as mean_q,
                   sqrt(cast(n * syy - sy * sy as double)
                        / (cast(n as double) * cast(n - 1 as double))) as std_q
            from s
        )
        select e.event_id, e.event_type, e.value,
               round(({yq} - st.mean_q) / st.std_q, 6) as z
        from events e join st on e.event_type = st.event_type
        where abs(({yq} - st.mean_q) / st.std_q) > {z_thresh!r}e0"""


def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier events per type: exact integer moments, broadcast
    stats join, both passes scan-parallel."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_anomaly_sql(SPARK))


def q_anomaly_oracle() -> str:
    return _anomaly_sql(DUCK)


QUERIES["anomaly"] = (q_anomaly, q_anomaly_oracle)


def _robust_anomaly_sql(d: str) -> str:
    """Median/MAD (robust z-score) outlier detection per event type — the
    Iglewicz-Hoaglin modified z with the 0.6745 consistency constant and the
    3.5 flag threshold; immune to the outliers themselves (unlike the
    3-sigma `anomaly` query, whose mean/stddev the outliers drag).

    Exactness: values quantized to bigint 1e-6 first; both engines
    interpolate percentiles identically over the integer domain (the
    events_quantiles discipline), and the median/MAD are re-quantized
    half-up before the z computation so the only float ops are one fixed
    multiply/divide sequence on integer-derived doubles.

    Scale: two per-type exact percentiles (type-keyed shuffles over the
    quantized column) + one broadcast-sized stats join back; flags are a
    scan-parallel projection."""
    pct = (
        (lambda x, p: f"percentile({x}, {p})")
        if d == SPARK
        else (lambda x, p: f"quantile_cont({x}, {p})")
    )
    zq = (
        "cast(floor(0.6745e0 * cast(xq - medq as double)"
        " / cast(madq as double) * 1.0e9 + 0.5e0) as bigint)"
    )
    return f"""
        with q as (
            select event_type, event_id,
                   cast(floor(value * 1.0e6 + 0.5e0) as bigint) as xq
            from events
        ),
        med as (
            select event_type,
                   cast(floor({pct('xq', '0.5e0')} + 0.5e0) as bigint) as medq
            from q group by event_type
        ),
        dev as (
            select q.event_type, q.event_id, q.xq, med.medq,
                   abs(q.xq - med.medq) as adev
            from q join med using (event_type)
        ),
        mad as (
            select event_type,
                   cast(floor({pct('adev', '0.5e0')} + 0.5e0) as bigint) as madq
            from dev group by event_type
        )
        select dev.event_type, dev.event_id, dev.xq, dev.medq, mad.madq,
               {zq} as robust_z_q9,
               abs({zq}) > 3500000000 as outlier
        from dev join mad using (event_type)
        where mad.madq > 0"""


def q_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection (see _robust_anomaly_sql)."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_robust_anomaly_sql(SPARK))


def q_robust_anomaly_oracle() -> str:
    return _robust_anomaly_sql(DUCK)


QUERIES["robust_anomaly"] = (q_robust_anomaly, q_robust_anomaly_oracle)


_LABEL_RES = 12


def q_label_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon label point (pole-of-inaccessibility, grid form): per zone,
    the cover cell at res 12 whose CENTER lies inside the polygon and
    maximizes the minimum distance to the boundary — where map renderers
    drop the zone's name so it never touches the outline (the polylabel
    problem, discretized to the engine's own cell grid so it is exact and
    value-hash-gateable rather than an iterative approximation).  Zones
    finer than the grid emit no label point (raise the res for them — a
    knob, not a redesign).

    Shape: candidate centers from the exploded bbox cover + the gated
    ray-cast, boundary segments from the packed ring; the distance join is
    zone-keyed (cells × OWN segments only, never cross-zone), the min folds
    map-side, the argmax is a per-zone window.  Integer mm via the snap
    metric ⇒ deterministic ties (clearance desc, cell asc)."""
    from ..operators.distjoin import _segments, seg_dist_m
    from ..operators.tiling import cover_cells
    from ..functions.portable import round_half

    register_geometry_views(spark, sf_dir)
    polys = spark.table("geo_polys")
    cov = cover_cells(polys, "zone_id", _LABEL_RES, "quad", keep=("pos_list",))
    clat, clon = geo.quad_cell_center("cell", _LABEL_RES, SPARK)
    cent = cov.where(
        F.expr(geo.point_in_polygon(clat, clon, "pos_list", SPARK))
    ).selectExpr("zone_id", "cell", f"{clat} as clat", f"{clon} as clon")
    segs = _segments(polys, "zone_id", "pos_list", "s")
    dmm = round_half(
        f"({seg_dist_m('clat', 'clon', 'sy1', 'sx1', 'sy2', 'sx2', SPARK)})"
        " * 1000.0e0",
        SPARK,
    )
    dist = (
        cent.join(segs, cent.zone_id == segs.s_id)
        .select("zone_id", "cell", F.expr(dmm).alias("dmm"))
        .groupBy("zone_id", "cell")
        .agg(F.min("dmm").alias("clearance_mm"))
    )
    w = Window.partitionBy("zone_id").orderBy(
        F.col("clearance_mm").desc(), F.col("cell").asc()
    )
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("zone_id", F.col("cell").alias("label_cell"), "clearance_mm")
    )


def q_label_point_oracle() -> str:
    from ..operators.distjoin import seg_dist_m
    from ..functions.portable import round_half

    r = _LABEL_RES
    clat, clon = geo.quad_cell_center("cell", r, DUCK)
    dmm = round_half(
        f"({seg_dist_m('c.clat', 'c.clon', 's.sy1', 's.sx1', 's.sy2', 's.sx2', DUCK)})"
        " * 1000.0e0",
        DUCK,
    )
    return f"""{duck_geometry_ctes()},
        cov as (
            select zone_id, pos_list,
                   unnest({geo.quad_cover_bbox('pos_list', r, DUCK)}) as cell
            from geo_polys
        ),
        cent as (
            select zone_id, cell, {clat} as clat, {clon} as clon
            from cov
            where {geo.point_in_polygon(clat, clon, 'pos_list', DUCK)}
        ),
        segs as (
            select zone_id,
                   pos_list[2*t.i - 1] as sy1, pos_list[2*t.i] as sx1,
                   pos_list[2*t.i + 1] as sy2, pos_list[2*t.i + 2] as sx2
            from geo_polys,
                 unnest(generate_series(1, len(pos_list) // 2 - 1)) t(i)
        ),
        d as (
            select c.zone_id, c.cell, min({dmm}) as clearance_mm
            from cent c join segs s on s.zone_id = c.zone_id
            group by c.zone_id, c.cell
        )
        select zone_id, cell as label_cell, clearance_mm from (
            select zone_id, cell, clearance_mm,
                   row_number() over (
                       partition by zone_id
                       order by clearance_mm desc, cell asc
                   ) as rn
            from d
        ) t where rn = 1"""


QUERIES["label_point"] = (q_label_point, q_label_point_oracle)


def q_pip_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-containing-zone assignment: where zones overlap, PIP yields
    multiple bindings per point — downstream consumers (stop→zone mapping)
    need exactly ONE.  Deterministic rule: the SMALLEST containing zone by
    |shoelace cross-sum| (most specific wins, the GIS convention), ties to
    zone_id asc.  Composes the gated cell-pruned PIP with the gated zonal
    area arithmetic; the dedup is a per-point argmin window over the
    (tiny) multi-match set."""
    from ..operators import pip

    register_geometry_views(spark, sf_dir)
    pts = spark.table("geo_points")
    polys = spark.table("geo_polys")
    bound = pip.bind_points_to_polygons(pts, polys, res=12, scheme="quad")
    area2 = polys.selectExpr(
        "zone_id",
        f"abs({geo.poly_cross_sum('pos_list', SPARK)}) as area2",
    )
    w = Window.partitionBy("point_id").orderBy(
        F.col("area2").asc(), F.col("zone_id").asc()
    )
    return (
        bound.join(F.broadcast(area2), "zone_id")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("point_id", "zone_id", F.round("area2", 9).alias("area2"))
    )


def q_pip_best_oracle() -> str:
    pred = geo.point_in_polygon("p.lat", "p.lon", "z.pos_list", DUCK)
    return f"""{duck_geometry_ctes()},
        m as (
            select p.point_id, z.zone_id,
                   abs({geo.poly_cross_sum('pos_list', DUCK)}) as area2
            from geo_points p cross join geo_polys z
            where {pred}
        )
        select point_id, zone_id, round(area2, 9) as area2 from (
            select point_id, zone_id, area2,
                   row_number() over (
                       partition by point_id order by area2 asc, zone_id asc
                   ) as rn
            from m
        ) t where rn = 1"""


QUERIES["pip_best"] = (q_pip_best, q_pip_best_oracle)


def q_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-document structure profiler — the input_hint's span
    invariants as an oracle-gated aggregate over the committed fixture
    corpus: per doc the span-kind counts, offset monotonicity violations,
    max offset gap, and the number of interleave RUNS (maximal same-kind
    stretches in span order) — the text/media interleaving signal a
    multimodal dataloader keys on."""
    from .convert_queries import FIXTURE_CORPUS

    spark.read.parquet(FIXTURE_CORPUS).createOrReplaceTempView("__span_docs")
    return spark.sql(_span_profile_sql(SPARK))


def _span_profile_sql(d: str) -> str:
    if d == SPARK:
        ex = (
            "select doc_id, pos, s.kind as kind, s.offset as off from "
            "(select doc_id, posexplode(spans) as (pos, s) from __span_docs) e"
        )
    else:
        from .convert_queries import FIXTURE_CORPUS

        ex = (
            "select doc_id, pos, span.kind as kind, span.\"offset\" as off "
            "from (select doc_id, generate_subscripts(spans, 1) - 1 as pos, "
            f"unnest(spans) as span from read_parquet('{FIXTURE_CORPUS}')) e"
        )
    return f"""
        with sp as ({ex}),
        lagged as (
            select doc_id, pos, kind, off,
                   lag(kind) over w as prev_kind,
                   lag(off) over w as prev_off
            from sp
            window w as (partition by doc_id order by pos asc)
        )
        select doc_id,
               cast(count(*) as bigint) as n_spans,
               cast(count(case when kind = 'text' then 1 end) as bigint) as n_text,
               cast(count(case when kind = 'media' then 1 end) as bigint) as n_media,
               cast(count(case when kind like 'osm%' then 1 end) as bigint) as n_osm,
               cast(count(case when prev_off is not null and off < prev_off
                          then 1 end) as bigint) as n_offset_inversions,
               cast(coalesce(max(case when prev_off is not null
                                 then off - prev_off end), 0) as bigint)
                   as max_offset_gap,
               cast(count(case when prev_kind is null or kind <> prev_kind
                          then 1 end) as bigint) as n_runs
        from lagged group by doc_id"""


def q_span_profile_oracle() -> str:
    return _span_profile_sql(DUCK)


QUERIES["span_profile"] = (q_span_profile, q_span_profile_oracle)


def _decayed_density_sql(d: str, res: int = 12, halflife_s: int = 86400) -> str:
    """Exponential time-decay heatmap: each event contributes
    exp(−ln2·age/halflife) at its user's home cell, age measured from the
    corpus's max event time — the 'recent activity' surface map tiles and
    alerting read.  Per-row weights quantized to bigint 1e-9 BEFORE the
    per-cell fold (order-free); cell from the same deterministic hash
    location family as geo_points, so the whole query composes with every
    cell consumer.

    Scale: one corpus scan + one cell-keyed map-side-combined groupBy; the
    max-ts anchor is a 1-row aggregate cross-joined (broadcast)."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    la = _pr(["'pt:lat:'", "user_id"], d)
    lo = _pr(["'pt:lon:'", "user_id"], d)
    lat = f"({flit(LAT_LO)} + {la} * {flit(DLAT)})"
    lon = f"({flit(LON_LO)} + {lo} * {flit(DLON)})"
    cell = geo.quad_cell(lat, lon, res, d)
    lam = f"(0.6931471805599453e0 / {float(halflife_s)!r}e0)"  # ln2/halflife
    age_s = "(cast(t.max_us - e.us as double) / 1.0e6)"
    wq = f"cast(floor(exp(-({lam}) * {age_s}) * 1.0e9 + 0.5e0) as bigint)"
    return f"""
        with e as (
            select user_id, {us} as us, {cell} as cell from events
        ),
        t as (select max(us) as max_us from e)
        select e.cell,
               cast(count(*) as bigint) as n_events,
               cast(sum({wq}) as bigint) as decayed_q9
        from e cross join t
        group by e.cell"""


def q_decayed_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_decayed_density_sql(SPARK))


def q_decayed_density_oracle() -> str:
    return _decayed_density_sql(DUCK)


QUERIES["decayed_density"] = (q_decayed_density, q_decayed_density_oracle)


def _ab_test_sql(d: str) -> str:
    """Two-sample A/B analysis per event_type: users hash-split into arms
    (the deterministic assignment an experimentation platform uses), Welch
    z on the 1e-6-quantized outcome — exact integer moments (n, Σx, Σx²)
    per arm, then ONE fixed float sequence for the z, quantized to 1e-9 so
    the significance flag is a stable integer compare.

    Scale: one scan + one (type, arm) map-side-combined aggregate; the
    pivot to arm columns is a 2-row-per-type self-join on the dimension."""
    arm_key = concat_str(["'ab:'", "cast(user_id as string)"], d)
    arm = f"({phash60(arm_key, d)}) % 2"
    xq = "cast(floor(value * 1.0e6 + 0.5e0) as bigint)"
    mean = "(cast(sx as double) / cast(n as double))"
    var = (
        "((cast(sxx as double) - cast(sx as double) * cast(sx as double)"
        " / cast(n as double)) / cast(n - 1 as double))"
    )
    z = (
        "((a.mean_x - b.mean_x) / sqrt(a.var_x / cast(a.n as double)"
        " + b.var_x / cast(b.n as double)))"
    )
    zq = f"cast(floor({z} * 1.0e9 + 0.5e0) as bigint)"
    return f"""
        with q as (
            select event_type, {arm} as arm, {xq} as xq from events
        ),
        s as (
            select event_type, arm,
                   cast(count(*) as bigint) as n,
                   cast(sum(xq) as bigint) as sx,
                   cast(sum(xq * xq) as bigint) as sxx
            from q group by event_type, arm
        ),
        m as (
            select event_type, arm, n, {mean} as mean_x, {var} as var_x
            from s
        )
        select a.event_type,
               a.n as n_a, b.n as n_b,
               round(a.mean_x / 1.0e6, 9) as mean_a,
               round(b.mean_x / 1.0e6, 9) as mean_b,
               {zq} as welch_z_q9,
               abs({zq}) > 1959963985 as significant
        from m a join m b on a.event_type = b.event_type
        where a.arm = 0 and b.arm = 1"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_ab_test_sql(SPARK))


def q_ab_test_oracle() -> str:
    return _ab_test_sql(DUCK)


QUERIES["ab_test"] = (q_ab_test, q_ab_test_oracle)


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node over the link graph
    (operators.graph.clustering_coeff_sql)."""
    from ..operators import graph

    register_geometry_views(spark, sf_dir)
    return spark.sql(graph.clustering_coeff_sql(SPARK))


def q_clustering_coeff_oracle() -> str:
    from ..operators import graph

    return graph.clustering_coeff_sql(DUCK)


QUERIES["clustering_coeff"] = (q_clustering_coeff, q_clustering_coeff_oracle)


def q_hyperanf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF neighborhood function, depths 0-2
    (operators.graph.hyperanf)."""
    from ..operators import graph

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.hyperanf(spark, docs, n_rounds=2)


def q_hyperanf_oracle() -> str:
    from ..operators import graph

    return graph.hyperanf_oracle_sql("documents", n_rounds=2)


QUERIES["hyperanf"] = (q_hyperanf, q_hyperanf_oracle)


def q_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch logistic regression, 3 synchronous GD rounds over the
    embedding features (operators.regression.logreg_gd_sql)."""
    from ..operators import regression

    register_geometry_views(spark, sf_dir)
    return spark.sql(regression.logreg_gd_sql(SPARK))


def q_logreg_oracle() -> str:
    from ..operators import regression

    return regression.logreg_gd_sql(DUCK)


QUERIES["logreg"] = (q_logreg, q_logreg_oracle)


def _target_encode_sql(d: str, m: float = 10.0) -> str:
    """Smoothed target (mean) encoding of a categorical column — the
    leakage-resistant categorical feature every tabular/ranking pipeline
    ships: enc(cat) = (Σy_cat + m·prior) / (n_cat + m) with the global
    mean as prior (m = pseudo-count).  Integer target sums; one fixed
    float sequence per category quantized to 1e-9.

    Scale: one dimension-sized groupBy + the 1-row global prior broadcast;
    the per-row join-back is by category (broadcast at any real
    cardinality)."""
    return f"""
        with g as (
            select cast(sum(n_chars) as bigint) as sy,
                   cast(count(*) as bigint) as n
            from documents
        ),
        c as (
            select source,
                   cast(sum(n_chars) as bigint) as sy,
                   cast(count(*) as bigint) as n
            from documents group by source
        ),
        enc as (
            select c.source,
                   c.n as n_cat,
                   cast(floor((cast(c.sy as double)
                        + {m!r}e0 * (cast(g.sy as double) / cast(g.n as double)))
                        / (cast(c.n as double) + {m!r}e0)
                        * 1.0e9 + 0.5e0) as bigint) as enc_q9
            from c cross join g
        )
        select d.doc_id, d.source, e.n_cat, e.enc_q9
        from documents d join enc e on e.source = d.source"""


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_target_encode_sql(SPARK))


def q_target_encode_oracle() -> str:
    return _target_encode_sql(DUCK)


QUERIES["target_encode"] = (q_target_encode, q_target_encode_oracle)


def _pii_docs_sql(d: str) -> str:
    """Documents with deterministic synthetic PII appended (the shared
    corpus carries none): an email, an IPv4 from the doc_id bytes, and a
    phone-ish digit run — same text bytes on both engines."""
    return f"""
        select doc_id,
               concat(text, ' contact user', cast(doc_id as {'string' if d == SPARK else 'varchar'}),
                      '@example.com or 10.', cast(doc_id % 256 as {'string' if d == SPARK else 'varchar'}),
                      '.0.1 call +47 22 33 44 ', cast(10 + doc_id % 90 as {'string' if d == SPARK else 'varchar'})) as text
        from documents where doc_id % 3 <> 0
        union all
        select doc_id, text from documents where doc_id % 3 = 0"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a corpus with deterministic synthetic PII: typed
    placeholder redaction + per-doc counts, pure projection."""
    from ..operators import textstats as T

    register_geometry_views(spark, sf_dir)
    docs = spark.sql(_pii_docs_sql(SPARK))
    return T.redact_pii(docs)


def q_redact_pii_oracle() -> str:
    from ..operators import textstats as T

    return T.redact_pii_oracle_sql(table=f"({_pii_docs_sql(DUCK)})")


QUERIES["redact_pii"] = (q_redact_pii, q_redact_pii_oracle)


def _winsorize_sql(d: str, lo: float = 0.05, hi: float = 0.95) -> str:
    """Winsorized [0,1] scaling per event_type: clip at the exact p05/p95
    (linear-interpolated percentiles — the same cross-engine-deterministic
    primitive events_quantiles gates) then rescale.  The feature-
    normalization step of a training pipeline, robust to the tail outliers
    the anomaly query flags.  Shape: one percentile agg (5-row stats table)
    broadcast into a second scan — no wide shuffle."""
    pc = (
        (lambda q: f"percentile(value, {q!r}e0)")
        if d == SPARK
        else (lambda q: f"quantile_cont(value, {q!r}e0)")
    )
    return f"""
        with st as (
            select event_type, {pc(lo)} as p_lo, {pc(hi)} as p_hi
            from events group by event_type
        )
        select e.event_id, e.event_type,
               round((least(greatest(e.value, st.p_lo), st.p_hi) - st.p_lo)
                     / (st.p_hi - st.p_lo), 9) as scaled
        from events e join st on e.event_type = st.event_type"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type feature scaling: winsorize at p05/p95, rescale to
    [0,1]; stats broadcast, both passes scan-parallel."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_winsorize_sql(SPARK))


def q_winsorize_oracle() -> str:
    return _winsorize_sql(DUCK)


QUERIES["winsorize"] = (q_winsorize, q_winsorize_oracle)


def _incremental_rollup_sql(d: str) -> str:
    """Incremental materialized-view maintenance: partition the corpus into
    BASE (first half of time) and DELTA (rest), roll each up independently,
    MERGE the partials, and emit the merged stats next to a direct full
    recompute — count/sum by addition, min/max by min/max, HLL distinct
    registers by register-max.  Every pair of columns must agree, and the
    oracle value-gates that equality.

    This is the algebra that lets a 100 TB pipeline ingest a day at a time
    and never rescan history: all the engine's sketches (HLL/CMS/Bloom/
    histogram) were built as mergeable ROW tables precisely so this merge is
    a groupBy, not a recompute."""
    from ..functions import sketch

    reg = sketch.hll_register("user_id", d)
    rho = sketch.hll_rho("user_id", d)
    yq = "cast(floor(value * 100.0e0 + 0.5e0) as bigint)"
    term = (
        "shiftleft(cast(1 as bigint), 53 - m)" if d == SPARK
        else "(cast(1 as bigint) << (53 - m))"
    )
    m_regs = sketch.M_REGISTERS
    numer = sketch.ALPHA_256 * m_regs * m_regs * float(2**53)
    est = f"round({numer!r} / cast(s + ({m_regs} - nh) * cast({2**53} as bigint) as double), 6)"
    cut = "timestamp '2024-01-04 00:00:00'" if d == DUCK else "timestamp_ntz'2024-01-04 00:00:00'"

    def rollup(pred: str, tag: str) -> str:
        return f"""
        {tag}_stats as (
            select event_type, cast(count(*) as bigint) as n, sum({yq}) as sm,
                   min({yq}) as mn, max({yq}) as mx
            from events where {pred} group by event_type
        ),
        {tag}_regs as (
            select event_type, {reg} as j, max({rho}) as m
            from events where {pred} group by event_type, {reg}
        )"""

    return f"""
        with {rollup(f'ts < {cut}', 'base')},
        {rollup(f'ts >= {cut}', 'delta')},
        merged_stats as (
            select event_type, sum(n) as n, sum(sm) as sm, min(mn) as mn, max(mx) as mx
            from (select * from base_stats union all select * from delta_stats) u
            group by event_type
        ),
        merged_regs as (
            select event_type, j, max(m) as m
            from (select * from base_regs union all select * from delta_regs) u
            group by event_type, j
        ),
        merged_hll as (
            select event_type, sum({term}) as s, cast(count(*) as bigint) as nh
            from merged_regs group by event_type
        ),
        full_stats as (
            select event_type, cast(count(*) as bigint) as n, sum({yq}) as sm,
                   min({yq}) as mn, max({yq}) as mx
            from events group by event_type
        ),
        full_regs as (
            select event_type, {reg} as j, max({rho}) as m
            from events group by event_type, {reg}
        ),
        full_hll as (
            select event_type, sum({term}) as s, cast(count(*) as bigint) as nh
            from full_regs group by event_type
        )
        select m.event_type,
               cast(m.n as bigint) as n_merged, cast(f.n as bigint) as n_full,
               cast(m.sm as bigint) as sum_merged, cast(f.sm as bigint) as sum_full,
               cast(m.mn as bigint) as min_merged, cast(f.mx as bigint) as max_full,
               (select {est} from merged_hll h where h.event_type = m.event_type) as hll_merged,
               (select {est} from full_hll h where h.event_type = m.event_type) as hll_full
        from merged_stats m join full_stats f on m.event_type = f.event_type"""


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base+delta partial-rollup merge vs direct full recompute — the
    mergeable-aggregate algebra, value-gated."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_incremental_rollup_sql(SPARK))


def q_incremental_rollup_oracle() -> str:
    return _incremental_rollup_sql(DUCK)


QUERIES["incremental_rollup"] = (q_incremental_rollup, q_incremental_rollup_oracle)


def q_streaming_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user OLS trend via applyInPandasWithState: exact
    integer moment state (order-free by algebra), replayed availableNow.
    ORACLE-GATED — the rare custom stateful op whose final state is provably
    arrival-independent, so DuckDB re-derives it exactly."""
    import tempfile

    from ..streaming import stateful
    from .. import schemas  # noqa: F401  (events schema defined inline below)

    register_geometry_views(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_trend_")
    spark.table("events").repartition(6).write.mode("overwrite").parquet(f"{tmp}/src")
    ev_schema = spark.table("events").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/src")
    )
    epoch0 = "timestamp_ntz'2024-01-01 00:00:00'"
    xy = stream.selectExpr(
        "user_id",
        f"cast(timestampdiff(SECOND, {epoch0}, ts) as bigint) as x",
        "cast(floor(value * 100.0e0 + 0.5e0) as bigint) as y",
    )
    stateful.run_stateful_to_memory(
        spark, stateful.stateful_trend(xy), name="q_trend_state"
    )
    w = Window.partitionBy("user_id")
    final = (
        spark.table("q_trend_state")
        .withColumn("mx", F.max("n").over(w))
        .where("n = mx")
        .dropDuplicates(["user_id"])
    )
    denom = "(n * sxx - sx * sx)"
    slope = f"(cast(n * sxy - sx * sy as double) / cast({denom} as double))"
    intercept = f"((cast(sy as double) - {slope} * cast(sx as double)) / cast(n as double) / 100.0e0)"
    return final.selectExpr(
        "user_id",
        "cast(n as bigint) as n",
        f"case when n >= 2 and {denom} <> 0 then round({slope} / 100.0e0, 9) end as slope",
        f"case when n >= 2 and {denom} <> 0 then round({intercept}, 9) end as intercept",
    )


def q_streaming_trend_oracle() -> str:
    denom = "(n * sxx - sx * sx)"
    slope = f"(cast(n * sxy - sx * sy as double) / cast({denom} as double))"
    intercept = f"((cast(sy as double) - {slope} * cast(sx as double)) / cast(n as double) / 100.0e0)"
    return f"""
        with xy as (
            select user_id,
                   cast(epoch_us(ts) // 1000000 - epoch_us(timestamp '2024-01-01 00:00:00') // 1000000 as bigint) as x,
                   cast(floor(value * 100.0e0 + 0.5e0) as bigint) as y
            from events
        ),
        agg as (
            select user_id, cast(count(*) as bigint) as n,
                   sum(x) as sx, sum(y) as sy, sum(x*y) as sxy, sum(x*x) as sxx
            from xy group by user_id
        )
        select user_id, n,
               case when n >= 2 and {denom} <> 0 then round({slope} / 100.0e0, 9) end as slope,
               case when n >= 2 and {denom} <> 0 then round({intercept}, 9) end as intercept
        from agg"""


QUERIES["streaming_trend"] = (q_streaming_trend, q_streaming_trend_oracle)


def q_corridor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corridor join: every (point, polyline segment) pair within 2 km —
    all refined pairs, not just the snap argmin."""
    from ..operators import distjoin

    register_geometry_views(spark, sf_dir)
    return distjoin.corridor_join(
        spark.table("geo_points"), spark.table("geo_polys"), radius_m=2000.0, res=14
    )


def q_corridor_join_oracle() -> str:
    from ..operators import distjoin

    dist = distjoin.seg_dist_m("p.lat", "p.lon", "s.say", "s.sax", "s.sby", "s.sbx", DUCK)
    return f"""{duck_geometry_ctes()},
        segs as (
            select zone_id, t.i as seg_idx,
                   pos_list[2*t.i - 1] as say, pos_list[2*t.i] as sax,
                   pos_list[2*t.i + 1] as sby, pos_list[2*t.i + 2] as sbx
            from geo_polys, unnest(generate_series(1, len(pos_list) // 2 - 1)) t(i)
        )
        select p.point_id, s.zone_id, s.seg_idx, round({dist}, 6) as dist_m
        from geo_points p cross join segs s
        where {dist} <= 2000.0e0"""


QUERIES["corridor_join"] = (q_corridor_join, q_corridor_join_oracle)


def _bpe_pairs_sql(d: str, top_n: int = 50) -> str:
    """First BPE merge step (tokenizer training prep): frequency of adjacent
    CHARACTER pairs inside words, weighted by word frequency — the statistic
    the merge rule argmaxes over.

    Shape: corpus explodes to tokens once, collapses to the VOCABULARY
    (distinct word → freq, map-side combined); pair enumeration then runs
    over the vocab (≪ corpus — the same trick as top_terms), one explode of
    len-1 positions per word; global top-n via ORDER BY + LIMIT ⇒
    TakeOrderedAndProject (per-partition top-n + driver merge), never a full
    sort.  Deterministic tiebreak (count desc, pair asc)."""
    toks = tx.tokens("text", d)
    if d == SPARK:
        tok_rows = f"select explode({toks}) as w from documents"
        pair_rows = (
            "select substring(w, i, 2) as pair, freq from vocab "
            "lateral view explode(sequence(1, length(w) - 1)) t as i "
            "where length(w) >= 2"
        )
    else:
        tok_rows = f"select unnest({toks}) as w from documents"
        pair_rows = (
            "select substring(w, t.i, 2) as pair, freq from vocab "
            "cross join unnest(generate_series(1, length(w) - 1)) t(i) "
            "where length(w) >= 2"
        )
    return f"""
        with vocab as (
            select w, cast(count(*) as bigint) as freq
            from ({tok_rows}) tk group by w
        ),
        pairs as ({pair_rows})
        select pair, cast(sum(freq) as bigint) as pair_count
        from pairs group by pair
        order by pair_count desc, pair asc
        limit {top_n}"""


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character pairs (BPE merge candidates), vocab-level
    counting, global top-k via TakeOrderedAndProject."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_bpe_pairs_sql(SPARK))


def q_bpe_pairs_oracle() -> str:
    return _bpe_pairs_sql(DUCK)


QUERIES["bpe_pairs"] = (q_bpe_pairs, q_bpe_pairs_oracle)


def _cdc_log_sql(d: str) -> str:
    """Deterministic CDC log synthesized from orders: each key emits 1-3
    versions (seq), the last being a DELETE for every 7th key; value and
    timestamp derive from (key, seq)."""
    n_versions = "(1 + o_orderkey % 3)"
    if d == SPARK:
        seq_rows = f"lateral view explode(sequence(1, {n_versions})) t as seq"
        dcol = "date_add(o_orderdate, cast(seq as int))"
    else:
        seq_rows = f"cross join unnest(generate_series(1, {n_versions})) t(seq)"
        dcol = "o_orderdate + to_days(cast(seq as int))"
    return f"""
        select o_orderkey as k, cast(seq as bigint) as seq,
               case when seq = {n_versions} and o_orderkey % 7 = 0 then 'D'
                    when seq = 1 then 'I' else 'U' end as op,
               round(o_totalprice + seq * 0.25e0, 2) as val,
               {dcol} as valid_from
        from orders {seq_rows}"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log → final table state: latest version per key wins, deletes
    drop the key — ONE partial-aggregated struct-max per key (no window
    sort of the log)."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(f"""
        with log as ({_cdc_log_sql(SPARK)}),
        latest as (
            select k, max(struct(seq, op, val)) as m
            from log group by k
        )
        select k, m.seq as seq, m.val as val
        from latest where m.op <> 'D'""")


def q_cdc_apply_oracle() -> str:
    return f"""
        with log as ({_cdc_log_sql(DUCK)}),
        latest as (
            select k, max(struct_pack(seq := seq, op := op, val := val)) as m
            from log group by k
        )
        select k, (m).seq as seq, (m).val as val
        from latest where (m).op <> 'D'"""


QUERIES["cdc_apply"] = (q_cdc_apply, q_cdc_apply_oracle)


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from the CDC log: one
    validity interval per version (valid_from, valid_to = next version's
    start or null, is_current), one window on the key."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(f"""
        with log as ({_cdc_log_sql(SPARK)})
        select k, seq, op, val,
               cast(valid_from as string) as valid_from,
               cast(lead(valid_from) over (partition by k order by seq) as string) as valid_to,
               (lead(valid_from) over (partition by k order by seq) is null and op <> 'D') as is_current
        from log""")


def q_scd2_oracle() -> str:
    return f"""
        with log as ({_cdc_log_sql(DUCK)})
        select k, seq, op, val,
               cast(cast(valid_from as date) as varchar) as valid_from,
               cast(cast(lead(valid_from) over (partition by k order by seq) as date) as varchar) as valid_to,
               (lead(valid_from) over (partition by k order by seq) is null and op <> 'D') as is_current
        from log"""


QUERIES["scd2"] = (q_scd2, q_scd2_oracle)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the deterministic link graph: ordered-
    vertex wedge join + closure semi-join (each triangle counted once)."""
    from ..operators import graph

    register_geometry_views(spark, sf_dir)
    return spark.sql(graph.triangles_sql(SPARK))


def q_triangles_oracle() -> str:
    from ..operators import graph

    return graph.triangles_sql(DUCK)


QUERIES["triangles"] = (q_triangles, q_triangles_oracle)


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events stream joined per-micro-batch to
    a broadcast static dimension (customer→nation), availableNow replay.
    ORACLE-GATED: enrichment is stateless, so the final set is
    arrival-independent — the batch join re-derives it exactly."""
    import tempfile

    register_geometry_views(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graft_enrich_")
    spark.table("events").repartition(6).write.mode("overwrite").parquet(f"{tmp}/src")
    ev_schema = spark.table("events").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/src")
    )
    dim = F.broadcast(
        spark.table("customer")
        .join(spark.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .selectExpr("c_custkey", "n_name as nation")
    )
    enriched = stream.join(dim, stream["user_id"] == dim["c_custkey"], "left").selectExpr(
        "event_id", "user_id", "event_type", "coalesce(nation, 'UNKNOWN') as nation"
    )
    q = (
        enriched.writeStream.format("memory").queryName("q_enrich")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table("q_enrich")


def q_stream_enrich_oracle() -> str:
    return """
        select e.event_id, e.user_id, e.event_type,
               coalesce(n.n_name, 'UNKNOWN') as nation
        from events e
        left join customer c on e.user_id = c.c_custkey
        left join nation n on c.c_nationkey = n.n_nationkey"""


QUERIES["stream_enrich"] = (q_stream_enrich, q_stream_enrich_oracle)


def _eqfreq_bins_sql(d: str, k: int = 8) -> str:
    """Equal-frequency discretization (quantile binning) per event_type:
    bucket = floor((rank-1)·k / n) over (value, event_id) order — an
    unambiguous total order and an explicit floor (Spark casts truncate,
    DuckDB casts round — floor() is the portable spelling), so bucket
    boundaries are deterministic even with duplicate values.  The feature-bucketization
    primitive (monotone-binned features for GBDTs etc.)."""
    return f"""
        with ranked as (
            select event_id, event_type, value,
                   row_number() over (partition by event_type
                                      order by value, event_id) as rn,
                   count(*) over (partition by event_type) as n
            from events
        )
        select event_id, event_type, value,
               cast(floor((rn - 1) * {k} / n) as bigint) as bucket
        from ranked"""


def q_eqfreq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency value binning per event_type (k=8), deterministic
    total order."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_eqfreq_bins_sql(SPARK))


def q_eqfreq_bins_oracle() -> str:
    return _eqfreq_bins_sql(DUCK)


QUERIES["eqfreq_bins"] = (q_eqfreq_bins, q_eqfreq_bins_oracle)


def _cohort_sql(d: str) -> str:
    """Weekly cohort retention: users grouped by first-activity week, counted
    per subsequent activity week — the product-analytics retention matrix.
    Integer week arithmetic (epoch-day div 7) keeps everything exact."""
    if d == SPARK:
        wk = "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as bigint)"
    else:
        wk = "cast(date_diff('day', date '1970-01-01', cast(ts as date)) // 7 as bigint)"
    return f"""
        with w as (select user_id, {wk} as week from events),
        first_w as (select user_id, min(week) as cohort from w group by user_id),
        activity as (select distinct w.user_id, f.cohort, w.week - f.cohort as offset_w
                     from w join first_w f on w.user_id = f.user_id)
        select cohort, offset_w, cast(count(*) as bigint) as n_users
        from activity group by cohort, offset_w"""


def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (cohort week × offset week × users)."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_cohort_sql(SPARK))


def q_cohort_oracle() -> str:
    return _cohort_sql(DUCK)


QUERIES["cohort"] = (q_cohort, q_cohort_oracle)


def _transitions_sql(d: str) -> str:
    """Event-type transition counts (first-order Markov statistics): for
    each user's ts-ordered event stream, count (prev_type → type) bigrams.
    Deterministic order: (ts, event_id) is a total order.  One window on the
    user key + one map-side-combined count."""
    return """
        with seq as (
            select user_id, event_type,
                   lag(event_type) over (partition by user_id
                                         order by ts, event_id) as prev_type
            from events
        )
        select prev_type, event_type as next_type,
               cast(count(*) as bigint) as n
        from seq where prev_type is not null
        group by prev_type, event_type"""


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per the user timeline."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_transitions_sql(SPARK))


def q_transitions_oracle() -> str:
    return _transitions_sql(DUCK)


QUERIES["transitions"] = (q_transitions, q_transitions_oracle)


# ---------------------------------------------------------------------------
# fuzzy record linkage (blocked edit-distance join)
# ---------------------------------------------------------------------------
_FUZZY_MUL = 2654435761  # Knuth multiplicative constant — portable int arith


def _dirty_names_sql(d: str) -> str:
    """Deterministically corrupt each part name: delete the character at
    position 1 + (p_partkey·MUL mod len) — pure integer arithmetic and
    substr, identical in both engines."""
    k = f"(1 + ((p_partkey * {_FUZZY_MUL}) % length(p_name)))"
    return f"""
        select p_partkey as rec_id,
               concat(substr(p_name, 1, {k} - 1), substr(p_name, {k} + 1))
                   as dirty_name
        from part"""


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: corrupted part names matched back to the clean
    name dictionary under levenshtein<=2 — broadcast dictionary, length-band
    prefilter, bounded-DP distance, one map-side argmin (linkage.py)."""
    from ..operators import linkage

    register_geometry_views(spark, sf_dir)
    dirty = spark.sql(_dirty_names_sql(SPARK))
    clean = spark.table("part").select(F.col("p_name").alias("name"))
    return linkage.fuzzy_match(
        dirty, clean, dirty_key="rec_id", dirty_col="dirty_name",
        clean_col="name", max_dist=2,
    )


def q_fuzzy_match_oracle() -> str:
    return f"""
        with dirty as ({_dirty_names_sql(DUCK)}),
        clean as (select distinct p_name as name from part),
        cand as (
            select d.rec_id, d.dirty_name, c.name,
                   levenshtein(d.dirty_name, c.name) as dist
            from dirty d join clean c
              on abs(length(d.dirty_name) - length(c.name)) <= 2
        ),
        ranked as (
            select rec_id, dirty_name, name as match_name, dist,
                   row_number() over (partition by rec_id
                                      order by dist asc, name asc) as rn
            from cand where dist <= 2
        )
        select rec_id, dirty_name, match_name, dist from ranked where rn = 1"""


QUERIES["fuzzy_match"] = (q_fuzzy_match, q_fuzzy_match_oracle)


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier)
# ---------------------------------------------------------------------------
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts — minimal price, maximal size — via the
    bucketed two-phase plan (skyline.py): distinct-first, per-bucket window,
    cross-bucket prefix max.  Oracle is the O(n²) NOT EXISTS dominance
    definition; agreement proves the linear plan exact."""
    from ..operators import skyline

    register_geometry_views(spark, sf_dir)
    sky = skyline.skyline2d(
        spark.table("part"), "p_retailprice", "p_size", n_buckets=64
    )
    return sky.selectExpr(
        "x as price", "cast(y as int) as size", "n_rows as n_parts"
    )


def q_skyline_oracle() -> str:
    return """
        with pairs as (
            select p_retailprice as price, p_size as size,
                   count(*) as n_parts
            from part group by 1, 2
        )
        select price, size, n_parts from pairs p
        where not exists (
            select 1 from pairs q
            where q.price <= p.price and q.size >= p.size
              and (q.price < p.price or q.size > p.size))"""


QUERIES["skyline"] = (q_skyline, q_skyline_oracle)


# ---------------------------------------------------------------------------
# overlapping-interval dissolve
# ---------------------------------------------------------------------------
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-window consolidation: events become [t, t+dur] intervals in
    integer micros, merged per user when overlapping/touching — one shuffle,
    two frames over one per-key sort (temporal.interval_merge)."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    return temporal.interval_merge(spark.table("events"))


def q_interval_merge_oracle() -> str:
    from ..operators import temporal

    return temporal.interval_merge_oracle_sql()


QUERIES["interval_merge"] = (q_interval_merge, q_interval_merge_oracle)


# ---------------------------------------------------------------------------
# frequent itemset pairs (a-priori market basket)
# ---------------------------------------------------------------------------
def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs sharing >=3 orders, with lift
    — distinct-first, a-priori singleton prefilter before the pair join,
    broadcast supports (basket.py)."""
    from ..operators import basket

    register_geometry_views(spark, sf_dir)
    return basket.frequent_pairs(spark.table("lineitem"), min_support=3)


def q_frequent_pairs_oracle() -> str:
    from ..operators import basket

    return basket.frequent_pairs_oracle_sql(min_support=3)


QUERIES["frequent_pairs"] = (q_frequent_pairs, q_frequent_pairs_oracle)


# ---------------------------------------------------------------------------
# token distribution drift (chi-squared per source)
# ---------------------------------------------------------------------------
def _token_drift_sql(d: str) -> str:
    """Chi-squared drift of each source's token distribution against the
    pooled corpus — the training-data monitoring staple (did a crawl slice
    shift vocabulary?).  Expected counts e = row_total·col_total/grand are
    pure +,*,/ (IEEE-deterministic both engines); each (o−e)²/e term is
    quantized to integer 1e-9 units BEFORE the sum, so the per-source total
    is order-free under any partitioning.  Shape: one token-explode scan,
    three tiny aggregates (sources, vocabulary, grand total), a sources ×
    vocab grid join — the grid is dimension-sized (prune vocabulary to
    global top-K first when |vocab| is corpus-scale), never corpus-sized."""
    ex = (
        f"explode({tx.tokens('text', SPARK)})"
        if d == SPARK
        else f"unnest({tx.tokens('text', DUCK)})"
    )
    return f"""
        with tok as (select source, {ex} as w from documents),
        counts as (select source, w, count(*) as c from tok group by source, w),
        rt as (select source, sum(c) as st from counts group by source),
        ct as (select w, sum(c) as cw from counts group by w),
        g as (select sum(c) as gt from counts),
        grid as (
            select rt.source, ct.w, coalesce(c.c, 0) as o,
                   cast(rt.st as double) * cast(ct.cw as double)
                       / cast(g.gt as double) as e
            from rt cross join ct cross join g
            left join counts c on c.source = rt.source and c.w = ct.w
        ),
        terms as (
            select source,
                   cast(floor((cast(o as double) - e) * (cast(o as double) - e)
                        / e * 1.0e9 + 0.5e0) as bigint) as tq
            from grid
        )
        select source, cast(sum(tq) as bigint) as chi2_q9, count(*) as n_cells
        from terms group by source"""


def q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_token_drift_sql(SPARK))


def q_token_drift_oracle() -> str:
    return _token_drift_sql(DUCK)


QUERIES["token_drift"] = (q_token_drift, q_token_drift_oracle)


# ---------------------------------------------------------------------------
# K-round Bellman-Ford SSSP
# ---------------------------------------------------------------------------
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pregel-style synchronous SSSP: 4 relaxation rounds over the weighted
    link graph from a sparse source set — sparse frontier table, one join +
    one min-agg per round, exact integer labels (operators.graph.sssp)."""
    from ..operators import graph

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.sssp(spark, docs, n_rounds=4)


def q_sssp_oracle() -> str:
    from ..operators import graph

    return graph.sssp_oracle_sql(n_rounds=4)


QUERIES["sssp"] = (q_sssp, q_sssp_oracle)


# ---------------------------------------------------------------------------
# star-schema rollup (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
def _star_rollup_sql(d: str) -> str:
    """Revenue by region/nation through the full dimension chain
    lineitem→orders→customer→nation→region.  Per-row revenue
    l_extendedprice·(1−l_discount) is a deterministic IEEE product,
    quantized to int 1e-4 units BEFORE the sum so group totals are
    order-free integers.  Shape: two fact-sized hash joins (lineitem⨝orders,
    orders⨝customer — sort-merge + AQE at scale), then broadcast snowflake
    dims (nation, region); aggregation map-side combines on (region,
    nation)."""
    rev = (
        "cast(floor(l_extendedprice * (1.0e0 - l_discount) * 1.0e4 + 0.5e0)"
        " as bigint)"
    )
    return f"""
        select r_name as region, n_name as nation,
               count(*) as n_lines, cast(sum({rev}) as bigint) as revenue_q4
        from lineitem
        join orders   on l_orderkey  = o_orderkey
        join customer on o_custkey   = c_custkey
        join nation   on c_nationkey = n_nationkey
        join region   on n_regionkey = r_regionkey
        group by r_name, n_name"""


def q_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_star_rollup_sql(SPARK))


def q_star_rollup_oracle() -> str:
    return _star_rollup_sql(DUCK)


QUERIES["star_rollup"] = (q_star_rollup, q_star_rollup_oracle)


# ---------------------------------------------------------------------------
# distributed convex hull
# ---------------------------------------------------------------------------
def q_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group convex hull of the point corpus in integer micro-degrees —
    the two-phase plan (hull.py): per-x reduce, bucket-summary envelope
    prune, output-sensitive exact refine.  Oracle is the brute O(n³)
    spanning-chord characterization; integer cross products make the
    comparison bit-exact."""
    from ..operators import hull

    register_geometry_views(spark, sf_dir)
    pts = spark.table("geo_points").selectExpr(
        "cast(point_id % 8 as int) as grp",
        "cast(floor(lon * 1000000.0e0) as bigint) as ix",
        "cast(floor(lat * 1000000.0e0) as bigint) as iy",
    )
    return hull.convex_hull(pts, "ix", "iy", ["grp"], n_buckets=32).selectExpr(
        "grp", "x", "y", "on_upper", "on_lower"
    )


def q_hull_oracle() -> str:
    from ..operators import hull

    return hull.hull_oracle_sql(
        points_sql(DUCK),
        "floor(lon * 1000000.0e0)",
        "floor(lat * 1000000.0e0)",
        "cast(point_id % 8 as int)",
    )


QUERIES["hull"] = (q_hull, q_hull_oracle)


# ---------------------------------------------------------------------------
# Hilbert-curve layout key
# ---------------------------------------------------------------------------
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert clustering key at quad res 10 — zorder_key's
    locality-superior sibling (consecutive indices are always grid
    neighbors): res unrolled let-binding levels of pure integer SQL, bit
    identical across engines (sources.layout.hilbert_expr)."""
    from ..sources import layout

    register_geometry_views(spark, sf_dir)
    return spark.sql(
        f"select point_id, {layout.hilbert_expr('lat', 'lon', 10, SPARK)} as h "
        "from geo_points"
    )


def q_hilbert_key_oracle() -> str:
    from ..sources import layout

    return (
        f"{duck_geometry_ctes()} select point_id, "
        f"{layout.hilbert_expr('lat', 'lon', 10, DUCK)} as h from geo_points"
    )


QUERIES["hilbert_key"] = (q_hilbert_key, q_hilbert_key_oracle)


# ---------------------------------------------------------------------------
# rolling time-range window stats
# ---------------------------------------------------------------------------
def _rolling_stats_sql(d: str) -> str:
    """Trailing-1-hour per-user rolling stats at every event (RANGE frame on
    integer epoch micros): count, exact integer sum, min/max.  The RANGE
    frame is resolved per partition after one keyed sort — a single shuffle
    on user_id; values quantized to bigint 1e-6 units so the sliding-sum
    accumulation is order-free and bit-exact in both engines."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    return f"""
        select event_id, user_id, epoch_us,
               count(*) over w as n_1h,
               cast(sum(iv) over w as bigint) as sum_1h_q,
               min(iv) over w as min_1h_q,
               max(iv) over w as max_1h_q
        from (
            select event_id, user_id, {us} as epoch_us,
                   cast(floor(value * 1000000.0e0 + 0.5e0) as bigint) as iv
            from events
        ) e
        window w as (
            partition by user_id order by epoch_us
            range between 3600000000 preceding and current row
        )"""


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_rolling_stats_sql(SPARK))


def q_rolling_stats_oracle() -> str:
    return _rolling_stats_sql(DUCK)


QUERIES["rolling_stats"] = (q_rolling_stats, q_rolling_stats_oracle)


# ---------------------------------------------------------------------------
# Naive Bayes language classification
# ---------------------------------------------------------------------------
def q_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NB over char trigrams: train on the 80% split, classify
    the held-out 20%.  Integer-quantized log-probs make every score an exact
    fold and the argmax deterministic (operators/classify.py)."""
    from ..operators import classify

    register_geometry_views(spark, sf_dir)
    return spark.sql(classify.nb_langid_sql(SPARK))


def q_nb_langid_oracle() -> str:
    from ..operators import classify

    return classify.nb_langid_sql(DUCK)


QUERIES["nb_langid"] = (q_nb_langid, q_nb_langid_oracle)


# ---------------------------------------------------------------------------
# multivariate ridge regression via exact normal equations
# ---------------------------------------------------------------------------
def _ridge_sql() -> str:
    from ..operators import regression

    return regression.ridge_fit_sql(
        SPARK,  # text is dialect-shared
        "lineitem",
        "l_returnflag",
        [
            "l_quantity",
            "cast(floor(l_discount * 100.0e0 + 0.5e0) as bigint)",
            "cast(floor(l_tax * 100.0e0 + 0.5e0) as bigint)",
        ],
        "cast(floor(l_extendedprice * 100.0e0 + 0.5e0) as bigint)",
        lam=0,
    )


def q_ridge_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag linear model price_cents ~ quantity + discount + tax:
    exact integer moment matrix in ONE map-side-combined aggregate, Cramer
    solve generated as fixed-order IEEE arithmetic (operators/regression.py)
    — the d-feature generalization of trend_fit."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_ridge_sql())


def q_ridge_fit_oracle() -> str:
    return _ridge_sql()


QUERIES["ridge_fit"] = (q_ridge_fit, q_ridge_fit_oracle)


# ---------------------------------------------------------------------------
# sparse all-pairs cosine similarity join
# ---------------------------------------------------------------------------
def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All doc pairs with tf-cosine >= 4/5: norm prefix filter (rarest-first,
    integer (t/2)²-suffix bound) -> candidate equi-join on prefix terms ->
    exact integer verify (operators/simjoin.py).  The brute oracle proves
    the filter complete."""
    from ..operators import simjoin

    register_geometry_views(spark, sf_dir)
    return simjoin.cosine_pairs(
        spark.table("documents"), threshold_p=4, threshold_q=5
    ).selectExpr("doc_a", "doc_b", "dot", "round(cosine, 9) as cosine")


def q_cosine_pairs_oracle() -> str:
    from ..operators import simjoin

    base = simjoin.cosine_pairs_oracle_sql(4, 5)
    return f"select doc_a, doc_b, dot, round(cosine, 9) as cosine from ({base}) t"


QUERIES["cosine_pairs"] = (q_cosine_pairs, q_cosine_pairs_oracle)


# ---------------------------------------------------------------------------
# Getis-Ord Gi* hotspot detection
# ---------------------------------------------------------------------------
def q_hotspot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gi* hotspot z-score per occupied quad cell at res 11 — integer
    neighbourhood sums, one fixed IEEE op sequence (tiling.hotspot_gistar)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.hotspot_gistar(spark.table("geo_points"), res=11)


def q_hotspot_oracle() -> str:
    from ..operators import tiling

    return tiling.hotspot_gistar_oracle_sql(points_sql(DUCK), res=11)


QUERIES["hotspot"] = (q_hotspot, q_hotspot_oracle)


# ---------------------------------------------------------------------------
# Cross-document line dedup (RefinedWeb-style boilerplate removal)
# ---------------------------------------------------------------------------
def _linify(text_col: str, width: int, d: str) -> str:
    """Deterministic line-structured corpus derived from the flat testdata
    text: whitespace tokens grouped `width` per line, lines joined by \\n.
    Same expression in both dialects, so the derived corpus is identical."""
    from ..functions import text as tx

    toks = tx.ws_tokens(text_col, d)
    if d == SPARK:
        n_lines = f"greatest(1, cast(ceil(size({toks}) / {width}.0e0) as int))"
        return (
            f"array_join(transform(sequence(1, {n_lines}), g -> "
            f"array_join(slice({toks}, (g - 1) * {width} + 1, {width}), ' ')), '\\n')"
        )
    n_lines = f"greatest(1, cast(ceil(len({toks}) / {width}.0) as int))"
    return (
        f"array_to_string(list_transform(generate_series(1, {n_lines}), g -> "
        f"array_to_string(({toks})[((g - 1) * {width} + 1):(g * {width})], ' ')), chr(10))"
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-line removal over the derived line corpus: any 4-token
    line seen in >= 3 distinct docs is stripped from every doc
    (textstats.line_dedup; hashes on the count shuffle, anti-join removal,
    order-carried reassembly)."""
    from ..operators import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "doc_id", f"{_linify('text', 4, SPARK)} as text"
    )
    return textstats.line_dedup(docs, min_docs=3)


def q_line_dedup_oracle() -> str:
    from ..operators import textstats

    lined = f"(select doc_id, {_linify('text', 4, DUCK)} as text from documents)"
    return textstats.line_dedup_oracle_sql(
        min_docs=3, table=lined, id_col="doc_id", text_col="text"
    )


QUERIES["line_dedup"] = (q_line_dedup, q_line_dedup_oracle)


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, span detection (Lee et al. 2022 shape): token
    runs covered by any 8-token window occurring >= 2 times corpus-wide;
    windows travel the count shuffle as 60-bit hashes, runs merged per doc
    via gaps-and-islands (dedup.dup_spans)."""
    from ..operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dup_spans(docs, min_len=8, min_count=2)


def q_dup_spans_oracle() -> str:
    from ..operators import dedup

    return dedup.dup_spans_sql(DUCK, "documents", min_len=8, min_count=2)


QUERIES["dup_spans"] = (q_dup_spans, q_dup_spans_oracle)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document sequence packing: the corpus as one deterministic
    token stream cut at 512-token boundaries; hierarchical prefix sum
    (bucket totals take the only global window), scan-parallel fragment
    explode (chunking.pack_sequences)."""
    from ..operators import chunking

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunking.pack_sequences(docs, capacity=512, bucket=64)


def q_pack_sequences_oracle() -> str:
    from ..operators import chunking

    return chunking.pack_sequences_sql(DUCK, "documents", capacity=512, bucket=64)


QUERIES["pack_sequences"] = (q_pack_sequences, q_pack_sequences_oracle)


def q_encounters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-time co-location join: user pairs within 100 m AND 30 min,
    pruned by (quad cell ring × time-bucket) equi join before exact
    haversine/Δt verify (trajectory.encounters)."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.encounters(spark, ev)


def q_encounters_oracle() -> str:
    from ..operators import trajectory

    return trajectory.encounters_sql(DUCK, "events")


QUERIES["encounters"] = (q_encounters, q_encounters_oracle)


def shrunk_polys_sql(d: str, s: float = 0.3) -> str:
    """geo_polys scaled by ``s`` about each ring's centroid — thins the
    overlap graph so dissolve yields a non-trivial component structure
    (full-size geo_polys are dense enough to form one giant component).
    Identical expression text in both dialects."""
    clat = geo.poly_centroid_lat("pos_list", d)
    clon = geo.poly_centroid_lon("pos_list", d)
    idx = seq("1", "size(pos_list)" if d == SPARK else "len(pos_list)", d)
    el = "element_at(pos_list, cast(i as int))" if d == SPARK else "pos_list[i]"
    body = (
        f"case when i % 2 = 1 then clat + {flit(s)} * (({el}) - clat) "
        f"else clon + {flit(s)} * (({el}) - clon) end"
    )
    shrink = transform_(idx, "i", body, d)
    return (
        f"select zone_id, {shrink} as pos_list from "
        f"(select zone_id, pos_list, {clat} as clat, {clon} as clon from geo_polys) c"
    )


def q_dissolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon dissolve: overlap join -> alternating-star connected
    components -> per-component envelope/area rollup (overlap.dissolve);
    the oracle closes reachability with an INDEPENDENT recursive CTE.
    Runs over centroid-shrunk polys so components are non-trivial."""
    from ..operators import overlap

    register_geometry_views(spark, sf_dir)
    # materialize the shrunk rings (poly-table-sized, tiny): inlined, the
    # centroid-fold transform would compose into the cover/overlap codegen
    # on every reference — the same blowup the oracle avoids with its
    # MATERIALIZED CTE
    shrunk = spark.sql(shrunk_polys_sql(SPARK)).localCheckpoint(eager=True)
    return overlap.dissolve(shrunk, res=12)


def q_dissolve_oracle() -> str:
    from ..operators import overlap

    ctes = duck_geometry_ctes().replace("with ", "with recursive ", 1)
    # MATERIALIZED: without it DuckDB inlines the shrink transform into the
    # O(n²) overlap predicate and re-evaluates the centroid fold per pair
    return (
        f"{ctes}, geo_polys_shrunk as materialized ({shrunk_polys_sql(DUCK)}), "
        f"{overlap.dissolve_oracle_sql('geo_polys_shrunk')}"
    )


QUERIES["dissolve"] = (q_dissolve, q_dissolve_oracle)


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption: one hash-placed 3-token mask per full
    24-token block, sentinel rewrite as a zero-shuffle HOF projection
    (chunking.span_corruption)."""
    from ..operators import chunking

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunking.span_corruption(docs, block=24, span_len=3)


def q_span_corruption_oracle() -> str:
    from ..operators import chunking

    return chunking.span_corruption_sql(DUCK, "documents", block=24, span_len=3)


QUERIES["span_corruption"] = (q_span_corruption, q_span_corruption_oracle)


def q_speed_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS spike filter: a fix is an outlier iff every available adjacent
    leg implies speed > 40 m/s; teleport-injecting fixture
    (trajectory.speed_filter)."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.speed_filter(spark, ev)


def q_speed_filter_oracle() -> str:
    from ..operators import trajectory

    return trajectory.speed_filter_sql(DUCK, "events")


QUERIES["speed_filter"] = (q_speed_filter, q_speed_filter_oracle)


def gf_fixes_sql(d: str) -> str:
    """Deterministic geofence fixes: one uniform hash-placed point per event
    (zone coverage density is SF-constant by the polys fixture design, so
    fixes flip in/out of zones constantly).  Identical text both dialects."""
    from ..operators.trajectory import _ep

    plat = prand(concat_str(["'gf:lat:'", "event_id"], d), d)
    plon = prand(concat_str(["'gf:lon:'", "event_id"], d), d)
    ep = _ep(d)
    return (
        f"select user_id, event_id, {ep('ts')} as eps, "
        f"{flit(LAT_LO)} + {plat} * {flit(DLAT)} as lat, "
        f"{flit(LON_LO)} + {plon} * {flit(DLON)} as lon "
        f"from events"
    )


def q_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence enter/exit/switch events: PIP zone binding (classified
    cell-cover join at a res where cells are zone-sized — res 8 measured
    219 s at sf0.1 from country-cell fan-out, res 14 measures 9 s, same
    rows) + per-user lag-window change detection (trajectory.
    geofence_events); the oracle binds zones with a brute cross-join
    ray-cast — an independent spatial plan."""
    from ..operators import trajectory

    register_geometry_views(spark, sf_dir)
    fixes = spark.sql(gf_fixes_sql(SPARK))
    return trajectory.geofence_events(fixes, spark.table("geo_polys"), res=14)


def q_geofence_oracle() -> str:
    from ..operators import trajectory

    return (
        f"{duck_geometry_ctes()}, gf_fixes as ({gf_fixes_sql(DUCK)}), "
        f"{trajectory.geofence_events_oracle_sql('gf_fixes', 'geo_polys')}"
    )


QUERIES["geofence"] = (q_geofence, q_geofence_oracle)


# ---------------------------------------------------------------------------
# HMM (Viterbi) map-matching
# ---------------------------------------------------------------------------
_MM_STEPS = 6
_MM_RADIUS = 600.0
_MM_PENALTY = 150_000  # 150 m switch penalty in mm


def traj_sql(d: str) -> str:
    """Deterministic GPS tracks: one 6-step trajectory per polygon, each
    fix = polygon vertex j jittered by a hash-derived offset (≈ ±250 m) —
    tracks genuinely follow a polyline, so stay/switch transitions are both
    exercised.  Identical expression text in both dialects."""
    eps = flit(0.0045)
    jla = _pr(["'mm:lat:'", "zone_id", "':'", "j"], d)
    jlo = _pr(["'mm:lon:'", "zone_id", "':'", "j"], d)
    if d == SPARK:
        # Spark [] subscripts are 0-based; element_at is the 1-based form
        la = f"element_at(pos_list, cast(2*j + 1 as int)) + ({jla} - 0.5e0) * {eps}"
        lo = f"element_at(pos_list, cast(2*j + 2 as int)) + ({jlo} - 0.5e0) * {eps}"
        return (
            f"select zone_id as traj_id, j as step, {la} as lat, {lo} as lon "
            f"from (select zone_id, pos_list, "
            f"explode(sequence(0, {_MM_STEPS - 1})) as j from geo_polys)"
        )
    la = f"pos_list[2*t.j + 1] + ({jla} - 0.5e0) * {eps}"
    lo = f"pos_list[2*t.j + 2] + ({jlo} - 0.5e0) * {eps}"
    return (
        f"select zone_id as traj_id, t.j as step, {la} as lat, {lo} as lon "
        f"from geo_polys, unnest(generate_series(0, {_MM_STEPS - 1})) t(j)"
    )


def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi map-matching: 6-fix tracks bound to the cost-optimal segment
    path (integer mm emissions + flat switch penalty, operators/mapmatch.py);
    greedy nearest-segment snap would zigzag, the DP stays put."""
    from ..operators import mapmatch

    register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {traj_sql(SPARK)}")
    return mapmatch.map_match(
        spark.table("geo_traj"),
        spark.table("geo_polys"),
        radius_m=_MM_RADIUS,
        switch_penalty_mm=_MM_PENALTY,
        res=13,
    )


def q_map_match_oracle() -> str:
    from ..operators import mapmatch

    body = mapmatch.map_match_oracle_sql(
        points_cte="geo_traj",
        lines_cte="geo_polys",
        radius_m=_MM_RADIUS,
        k_unroll=_MM_STEPS - 1,
        switch_penalty_mm=_MM_PENALTY,
    )
    return f"{duck_geometry_ctes()}, geo_traj as ({traj_sql(DUCK)}), {body}"


QUERIES["map_match"] = (q_map_match, q_map_match_oracle)


# ---------------------------------------------------------------------------
# Local Moran's I (LISA) cluster/outlier map
# ---------------------------------------------------------------------------
def q_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anselin LISA per occupied res-11 cell: integer numerators, one double
    division, sign-exact HH/LL/HL/LH quadrants (tiling.moran_local)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.moran_local(spark.table("geo_points"), res=11)


def q_moran_oracle() -> str:
    from ..operators import tiling

    return tiling.moran_local_oracle_sql(points_sql(DUCK), res=11)


QUERIES["moran"] = (q_moran, q_moran_oracle)


# ---------------------------------------------------------------------------
# Mann-Kendall per-cell trend (emerging-hotspot primitive)
# ---------------------------------------------------------------------------
_MK_T = 8


def _mk_points_sql(d: str) -> str:
    """geo_points with a hash-derived time bucket 0..T-1 (deterministic
    space-time cube; identical expression both dialects)."""
    pr = _pr(["'mk:b:'", "point_id"], d)
    return (
        f"select point_id, lat, lon, cast(floor({pr} * {_MK_T}) as int) as bucket "
        f"from geo_points"
    )


def q_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend z per occupied res-11 cell over an 8-bucket
    space-time cube: integer S + tie-adjusted variance, densified zeros
    (tiling.mk_trend)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    pts = spark.sql(_mk_points_sql(SPARK))
    return tiling.mk_trend(pts, n_buckets=_MK_T, res=11)


def q_mk_trend_oracle() -> str:
    from ..operators import tiling

    inner = tiling.mk_trend_oracle_sql(
        f"select * from ({_mk_points_sql(DUCK)}) _p", n_buckets=_MK_T, res=11
    )
    return f"{duck_geometry_ctes()}, __res as ({inner}) select * from __res"


QUERIES["mk_trend"] = (q_mk_trend, q_mk_trend_oracle)


# ---------------------------------------------------------------------------
# DSIR importance weights (target-domain data selection)
# ---------------------------------------------------------------------------
def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance ratios toward the lang='en' slice: hashed
    unigram+bigram models, quantized log-probs, exact integer per-doc fold
    (sampling.dsir_weights)."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.dsir_weights(docs, target_pred="lang = 'en'", n_buckets=256)


def q_dsir_oracle() -> str:
    from ..operators import sampling

    return sampling.dsir_weights_oracle_sql(target_pred="lang = 'en'", n_buckets=256)


QUERIES["dsir"] = (q_dsir, q_dsir_oracle)


# ---------------------------------------------------------------------------
# n-gram LM perplexity scoring (CCNet-style quality filter)
# ---------------------------------------------------------------------------
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram LM trained on the 80% split scores the held-out 20%:
    quantized log-probs, exact integer folds (classify.ngram_lm_sql)."""
    from ..operators import classify

    register_geometry_views(spark, sf_dir)
    return spark.sql(classify.ngram_lm_sql(SPARK))


def q_lm_score_oracle() -> str:
    from ..operators import classify

    return classify.ngram_lm_sql(DUCK)


QUERIES["lm_score"] = (q_lm_score, q_lm_score_oracle)


# ---------------------------------------------------------------------------
# Ripley's K point-pattern statistic
# ---------------------------------------------------------------------------
_RIPLEY_RADII = [300.0, 600.0, 1200.0, 2400.0]


def q_ripley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley K/L at four radii over geo_points: one exact radius_join at
    r_max + one 1-row aggregate; integer pair counts (tiling.ripley_k)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.ripley_k(spark.table("geo_points"), _RIPLEY_RADII, res=13)


def q_ripley_oracle() -> str:
    from ..operators import tiling

    return (
        f"{duck_geometry_ctes()}, __r as ("
        + tiling.ripley_k_oracle_sql("select * from geo_points", _RIPLEY_RADII)
        + ") select * from __r"
    )


QUERIES["ripley_k"] = (q_ripley, q_ripley_oracle)


# ---------------------------------------------------------------------------
# TPC-H classics: Q1 pricing summary, Q3 shipping priority, Q18 big orders
# ---------------------------------------------------------------------------
def _tpch_q1_sql(d: str) -> str:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary over
    lineitems shipped before the cutoff.  Every per-row money/qty term is
    quantized to int 1e-4 units BEFORE its sum (order-free bigint folds);
    the averages are single double divisions at the end."""
    q4 = lambda x: f"cast(floor(({x}) * 1.0e4 + 0.5e0) as bigint)"  # noqa: E731
    disc = "l_extendedprice * (1.0e0 - l_discount)"
    charge = f"({disc}) * (1.0e0 + l_tax)"
    return f"""
        select l_returnflag, l_linestatus,
               count(*) as count_order,
               cast(sum({q4('l_quantity')}) as bigint) as sum_qty_q4,
               cast(sum({q4('l_extendedprice')}) as bigint) as sum_base_q4,
               cast(sum({q4(disc)}) as bigint) as sum_disc_q4,
               cast(sum({q4(charge)}) as bigint) as sum_charge_q4,
               round(cast(sum({q4('l_quantity')}) as double)
                     / (cast(count(*) as double) * 1.0e4), 9) as avg_qty,
               round(cast(sum({q4('l_extendedprice')}) as double)
                     / (cast(count(*) as double) * 1.0e4), 9) as avg_price
        from lineitem
        where l_shipdate <= timestamp '2000-06-01 00:00:00'
        group by l_returnflag, l_linestatus"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fact-scan aggregate with map-side combine; the shipdate filter is
    pushed to the parquet scan."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q1_sql(SPARK))


def q_tpch_q1_oracle() -> str:
    return _tpch_q1_sql(DUCK)


QUERIES["tpch_q1"] = (q_tpch_q1, q_tpch_q1_oracle)


def _tpch_q3_sql(d: str) -> str:
    """TPC-H Q3 shape: top-10 open orders by pending revenue — orders placed
    before the cutoff with lineitems shipping after it.  Revenue quantized
    per row; the global top-10 is a TakeOrderedAndProject on the integer
    (revenue, orderkey) pair — fully deterministic."""
    rev = ("cast(floor(l_extendedprice * (1.0e0 - l_discount) * 1.0e4 + 0.5e0)"
           " as bigint)")
    od = ("date_format(o_orderdate, 'yyyy-MM-dd')" if d == SPARK
          else "strftime(o_orderdate, '%Y-%m-%d')")
    return f"""
        select o_orderkey, {od} as orderdate,
               o_orderpriority, cast(sum({rev}) as bigint) as revenue_q4
        from orders join lineitem on l_orderkey = o_orderkey
        where o_orderdate < timestamp '1998-06-01 00:00:00'
          and l_shipdate  > timestamp '1998-06-01 00:00:00'
        group by o_orderkey, {od}, o_orderpriority
        order by revenue_q4 desc, o_orderkey
        limit 10"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q3_sql(SPARK))


def q_tpch_q3_oracle() -> str:
    return _tpch_q3_sql(DUCK)


QUERIES["tpch_q3"] = (q_tpch_q3, q_tpch_q3_oracle)


def _tpch_q18_sql(d: str) -> str:
    """TPC-H Q18 shape: large-volume orders — orders whose total quantity
    exceeds the threshold, with their customer.  The HAVING prunes on the
    pre-joined fact aggregate (semi-join shape: aggregate lineitem FIRST,
    then join the survivors to orders/customer — the fact table crosses the
    join boundary once, at order granularity)."""
    qq = "cast(floor(l_quantity * 1.0e4 + 0.5e0) as bigint)"
    od = ("date_format(o_orderdate, 'yyyy-MM-dd')" if d == SPARK
          else "strftime(o_orderdate, '%Y-%m-%d')")
    return f"""
        with big as (
            select l_orderkey, cast(sum({qq}) as bigint) as total_qty_q4
            from lineitem group by l_orderkey
            having sum({qq}) > 1500000
        )
        select c_custkey, c_name, o_orderkey,
               {od} as orderdate, total_qty_q4
        from big
        join orders on o_orderkey = l_orderkey
        join customer on c_custkey = o_custkey"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q18_sql(SPARK))


def q_tpch_q18_oracle() -> str:
    return _tpch_q18_sql(DUCK)


QUERIES["tpch_q18"] = (q_tpch_q18, q_tpch_q18_oracle)


# ---------------------------------------------------------------------------
# Trajectory similarity join (Hausdorff)
# ---------------------------------------------------------------------------
_HAUS_R = 8000.0


def q_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All track pairs within 8 km symmetric Hausdorff distance over the
    geo_traj fixture: padded-bbox cover prefilter + exact HOF refine
    (operators/trajsim.py)."""
    from ..operators import trajsim

    register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {traj_sql(SPARK)}")
    return trajsim.hausdorff_join(spark.table("geo_traj"), radius_m=_HAUS_R, res=12)


def q_hausdorff_oracle() -> str:
    from ..operators import trajsim

    body = trajsim.hausdorff_join_oracle_sql(
        f"select * from ({traj_sql(DUCK)}) _t", radius_m=_HAUS_R
    )
    return f"{duck_geometry_ctes()}, __h as ({body}) select * from __h"


QUERIES["hausdorff_join"] = (q_hausdorff, q_hausdorff_oracle)


_DTW_C = 30000.0  # total alignment cost budget (m)


def q_dtw_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW trajectory-similarity join over the geo_traj fixture: padded
    bbox-cover candidates (complete: DTW >= d(A1,B1)) + mm-integer
    anti-diagonal-unrolled DP (trajsim.dtw_join)."""
    from ..operators import trajsim

    register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {traj_sql(SPARK)}")
    return trajsim.dtw_join(
        spark.table("geo_traj"), max_cost_m=_DTW_C, n_steps=_MM_STEPS, res=12
    )


def q_dtw_join_oracle() -> str:
    from ..operators import trajsim

    body = trajsim.dtw_join_oracle_sql(
        f"select * from ({traj_sql(DUCK)}) _t", max_cost_m=_DTW_C, n_steps=_MM_STEPS
    )
    return f"{duck_geometry_ctes()}, __d as ({body}) select * from __d"


QUERIES["dtw_join"] = (q_dtw_join, q_dtw_join_oracle)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer trained AND applied in one plan: 6 unrolled merge
    rounds over the vocabulary (argmax pair as a scalar subquery, literal
    wrapped-symbol replace), output = post-merge subword vocabulary
    (textstats.bpe_encode)."""
    from ..operators import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.bpe_encode(docs, k_merges=6, top_n=100)


def q_bpe_encode_oracle() -> str:
    from ..operators import textstats

    return textstats.bpe_encode_sql(DUCK, "documents", k_merges=6, top_n=100)


QUERIES["bpe_encode"] = (q_bpe_encode, q_bpe_encode_oracle)


def q_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Weiszfeld geometric median, 5 unrolled rounds over the fix
    arrays in one shuffle; trig-free metric keeps every float op identical
    across engines (trajectory.geometric_median)."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.geometric_median(spark, ev, k_iters=5)


def q_geometric_median_oracle() -> str:
    from ..operators import trajectory

    return trajectory.geometric_median_sql(DUCK, "events", k_iters=5)


QUERIES["geometric_median"] = (q_geometric_median, q_geometric_median_oracle)


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval track resampling: per-user linear interpolation at
    6-hour grid ticks, pure-integer grid arithmetic + one fused float
    interpolation per tick (trajectory.resample_track)."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.resample_track(spark, ev, step_s=21600)


def q_resample_oracle() -> str:
    from ..operators import trajectory

    return trajectory.resample_track_sql(DUCK, "events", step_s=21600)


QUERIES["resample"] = (q_resample, q_resample_oracle)


def q_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution tile pyramid (res 9..13) in one ROLLUP shuffle:
    finest cell quantized once, parents by integer truncation, integer
    hash weights so every level's sums are exact (tiling.tile_pyramid)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.tile_pyramid(spark.table("geo_points"), res_hi=13, res_lo=9)


def q_pyramid_oracle() -> str:
    from ..operators import tiling

    return (
        f"{duck_geometry_ctes()}, "
        f"{tiling.tile_pyramid_oracle_sql('geo_points', res_hi=13, res_lo=9)}"
    )


QUERIES["pyramid"] = (q_pyramid, q_pyramid_oracle)


# ---------------------------------------------------------------------------
# Lexical diversity + geodesic zone stats
# ---------------------------------------------------------------------------
def q_lexdiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token entropy / TTR / hapax fraction per doc — quantized-ln integer
    folds (textstats.lexical_diversity)."""
    from ..operators import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.lexical_diversity(docs)


def q_lexdiv_oracle() -> str:
    from ..operators import textstats

    return textstats.lexical_diversity_oracle_sql()


QUERIES["lexdiv"] = (q_lexdiv, q_lexdiv_oracle)


def q_zone_stats_sph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic (spherical-excess) zone area + haversine perimeter — the
    real-units sibling of zone_stats' planar deg² metrics."""
    register_geometry_views(spark, sf_dir)
    return spark.table("geo_polys").selectExpr(
        "zone_id",
        f"round({geo.poly_area_sph_m2('pos_list', SPARK)}, 3) as area_m2",
        f"round({geo.poly_perimeter_m('pos_list', SPARK)}, 3) as perimeter_m",
    )


def q_zone_stats_sph_oracle() -> str:
    return f"""{duck_geometry_ctes()}
        select zone_id,
               round({geo.poly_area_sph_m2('pos_list', DUCK)}, 3) as area_m2,
               round({geo.poly_perimeter_m('pos_list', DUCK)}, 3) as perimeter_m
        from geo_polys"""


QUERIES["zone_stats_sph"] = (q_zone_stats_sph, q_zone_stats_sph_oracle)


# ---------------------------------------------------------------------------
# Ring validity audit + repair
# ---------------------------------------------------------------------------
def corrupt_polys_sql(d: str) -> str:
    """Deterministically corrupted geo_polys: zone_id % 3 == 0 → ring
    reversed (cw); % 3 == 1 → closure dropped (open); % 3 == 2 → second
    vertex duplicated (zero-length edge).  Identical expression text in both
    dialects, so both engines audit/repair the same broken rings."""
    if d == SPARK:
        n = "(size(pos_list) div 2)"
        rev = (
            f"flatten(transform(sequence({n}, 1, -1), i -> "
            "array(element_at(pos_list, cast(2*i - 1 as int)), "
            "element_at(pos_list, cast(2*i as int)))))"
        )
        open_ = "slice(pos_list, 1, size(pos_list) - 2)"
        dup = ("concat(slice(pos_list, 1, 4), slice(pos_list, 3, 2), "
               "slice(pos_list, 5, size(pos_list) - 4))")
    else:
        n = "(len(pos_list) // 2)"
        rev = (
            f"flatten(list_transform(generate_series({n}, 1, -1), i -> "
            "[pos_list[2*i - 1], pos_list[2*i]]))"
        )
        open_ = "pos_list[1:len(pos_list) - 2]"
        dup = ("list_concat(list_concat(pos_list[1:4], pos_list[3:4]), "
               "pos_list[5:len(pos_list)])")
    return (
        f"select zone_id, case when zone_id % 3 = 0 then {rev} "
        f"when zone_id % 3 = 1 then {open_} "
        f"else {dup} end as pos_list from geo_polys"
    )


def q_ring_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity audit over the corrupted fixture: closure, dup vertices,
    orientation, proper self-crossings (operators/validity.py)."""
    from ..operators import validity

    register_geometry_views(spark, sf_dir)
    cor = spark.sql(corrupt_polys_sql(SPARK))
    return validity.ring_validity(cor)


def q_ring_validity_oracle() -> str:
    from ..operators import validity

    return (
        f"{duck_geometry_ctes()}, __v as ("
        + validity.ring_validity_oracle_sql(corrupt_polys_sql(DUCK))
        + ") select * from __v"
    )


QUERIES["ring_validity"] = (q_ring_validity, q_ring_validity_oracle)


def q_ring_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repair the corrupted rings (dedup → close → CCW-normalize); ring
    emitted as a comma-joined string for the value-hash gate."""
    from ..operators import validity

    register_geometry_views(spark, sf_dir)
    cor = spark.sql(corrupt_polys_sql(SPARK))
    return validity.repair_rings(cor).selectExpr(
        "zone_id", "array_join(pos_list, ',') as ring_str"
    )


def q_ring_repair_oracle() -> str:
    from ..operators import validity

    return (
        f"{duck_geometry_ctes()}, __r as ("
        + validity.repair_rings_oracle_sql(corrupt_polys_sql(DUCK))
        + ") select * from __r"
    )


QUERIES["ring_repair"] = (q_ring_repair, q_ring_repair_oracle)


# ---------------------------------------------------------------------------
# OD flow matrix + deterministic corpus shuffle
# ---------------------------------------------------------------------------
def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin→destination trip flows at res 10 with k=2 anonymity
    suppression over the geo_traj tracks (trajectory.od_matrix_sql)."""
    from ..operators import trajectory

    register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {traj_sql(SPARK)}")
    return spark.sql(trajectory.od_matrix_sql(SPARK, res=10, k_anon=2))


def q_od_matrix_oracle() -> str:
    from ..operators import trajectory

    body = trajectory.od_matrix_sql(DUCK, res=10, k_anon=2, traj_table="geo_traj")
    return (
        f"{duck_geometry_ctes()}, geo_traj as ({traj_sql(DUCK)}), "
        f"__od as ({body}) select * from __od"
    )


QUERIES["od_matrix"] = (q_od_matrix, q_od_matrix_oracle)


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order permutation: hash buckets +
    within-bucket ranks + broadcast prefix-sum offsets — never a global
    sort (sampling.corpus_shuffle)."""
    from ..operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sampling.corpus_shuffle(docs, n_buckets=64)


def q_corpus_shuffle_oracle() -> str:
    from ..operators import sampling

    return sampling.corpus_shuffle_oracle_sql(n_buckets=64)


QUERIES["corpus_shuffle"] = (q_corpus_shuffle, q_corpus_shuffle_oracle)


def q_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup: 16-bit perceptual hash (sign bits of the decode
    stub's feature vector, integer-exact on the sha256 hex) + 4-band LSH
    candidate join + exact hamming verify (media.media_neardup_pairs).  The
    oracle is an INDEPENDENT brute all-pairs plan — agreement proves the
    banded candidate generator complete, upgrading the media feature path
    from rows-only to value-gated."""
    from ..operators import media
    from .convert_queries import FIXTURE_CORPUS

    corpus = spark.read.parquet(FIXTURE_CORPUS)
    return media.media_neardup_pairs(corpus, max_hamming=3)


def q_media_phash_pairs_oracle() -> str:
    from ..operators import media
    from .convert_queries import FIXTURE_CORPUS

    phash = media.phash_from_digest_sql("h", DUCK)
    return f"""
        with m as (
            select distinct span.media_ref as media_ref
            from (select unnest(spans) as span
                  from read_parquet('{FIXTURE_CORPUS}')) t
            where span.kind = 'media'
        ),
        ph as (
            select media_ref, {phash} as phash
            from (select media_ref, {media.phash_digest_sql('media_ref', DUCK)} as h from m)
        )
        select a.media_ref as ref_a, b.media_ref as ref_b,
               cast(bit_count(xor(a.phash, b.phash)) as int) as hamming
        from ph a join ph b on a.media_ref < b.media_ref
        where bit_count(xor(a.phash, b.phash)) <= 3
    """


QUERIES["media_phash_pairs"] = (q_media_phash_pairs, q_media_phash_pairs_oracle)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning over the embeddings table: k-means buckets
    (the oracle-gated fixed-point operator) + integer-exact within-cluster
    cosine keep-first rule (dedup.semdedup)."""
    from ..operators import dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return dedup.semdedup(emb, k=8, iters=3, p=1, q=4)


def q_semdedup_oracle() -> str:
    from ..operators import dedup

    return dedup.semdedup_oracle_sql(k=8, iters=3, p=1, q=4, dim=64)


QUERIES["semdedup"] = (q_semdedup, q_semdedup_oracle)


def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: per-subspace k-means codebooks (4x16), ADC top-10
    for the 4 smallest-id queries via driver-inlined integer distance
    tables — the corpus scan is a shuffle-free projection over the code
    columns (similarity.topk_pq_adc)."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.topk_pq_adc(emb, m=4, k=16, iters=2, dim=64)


def q_pq_adc_oracle() -> str:
    from ..operators import similarity

    return similarity.topk_pq_adc_oracle_sql(m=4, k=16, iters=2, dim=64)


QUERIES["pq_adc"] = (q_pq_adc, q_pq_adc_oracle)


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (T=2, target 50%): the
    multilingual-rebalancing sampling rule, deterministic by id hash
    (sampling.temperature_mix; rates via sqrt so both engines round
    identically)."""
    from ..operators import sampling

    register_geometry_views(spark, sf_dir)
    return sampling.temperature_mix(spark, temperature=2.0, target_frac=0.5)


def q_temperature_mix_oracle() -> str:
    from ..operators import sampling

    return sampling._temp_mix_sql(DUCK, 2.0, 0.5)


QUERIES["temperature_mix"] = (q_temperature_mix, q_temperature_mix_oracle)


def q_cell_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cellToBoundary for the occupied res-8 hex and quad cells of
    geo_points: 6 (hex) / 4 (quad) exploded vertices per distinct cell, CCW.
    The ring array is staged as a column before the explode so the boundary
    expression evaluates once per cell, not once per vertex."""
    register_geometry_views(spark, sf_dir)
    out = []
    for scheme, nv, bfn, cfn in (
        ("hex", 6, geo.hex_boundary, geo.hex_cell),
        ("quad", 4, geo.quad_boundary, geo.quad_cell),
    ):
        cells = spark.table("geo_points").selectExpr(
            f"{cfn('lat', 'lon', 8, SPARK)} as cell"
        ).distinct()
        staged = cells.selectExpr("cell", f"{bfn('cell', 8, SPARK)} as b")
        out.append(
            staged.selectExpr(
                f"'{scheme}' as scheme",
                "cell",
                f"explode(sequence(1, {nv})) as v_idx",
                "b",
            ).selectExpr(
                "scheme", "cell", "v_idx",
                "element_at(b, 2 * v_idx - 1) as vlat",
                "element_at(b, 2 * v_idx) as vlon",
            )
        )
    return out[0].unionByName(out[1])


def q_cell_boundary_oracle() -> str:
    parts = []
    for scheme, nv, bfn, cfn in (
        ("hex", 6, geo.hex_boundary, geo.hex_cell),
        ("quad", 4, geo.quad_boundary, geo.quad_cell),
    ):
        parts.append(f"""
            select '{scheme}' as scheme, cell, t.v as v_idx,
                   b[2 * t.v - 1] as vlat, b[2 * t.v] as vlon
            from (
                select cell, {bfn('cell', 8, DUCK)} as b
                from (select distinct {cfn('lat', 'lon', 8, DUCK)} as cell
                      from geo_points)
            ) cross join unnest(generate_series(1, {nv})) t(v)
        """)
    return f"{duck_geometry_ctes()} " + " union all ".join(parts)


QUERIES["cell_boundary"] = (q_cell_boundary, q_cell_boundary_oracle)


def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 + dense cosine top-50 fused by
    reciprocal-rank (retrieval.rrf_hybrid) — integer ranks, fixed IEEE
    fusion sequence, exact cross-engine."""
    from ..operators import retrieval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return retrieval.rrf_hybrid(docs, emb, _BM25_TERMS, query_vec_id=0)


def q_rrf_hybrid_oracle() -> str:
    from ..operators import retrieval

    return retrieval.rrf_hybrid_oracle_sql(_BM25_TERMS, query_vec_id=0)


QUERIES["rrf_hybrid"] = (q_rrf_hybrid, q_rrf_hybrid_oracle)


def q_flow_rose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell 8-sector direction rose over the geo_traj tracks: trig-free
    tan(22.5°)-comparison octants, integer-mm leg lengths
    (trajectory.flow_rose)."""
    from ..operators import trajectory

    register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {traj_sql(SPARK)}")
    return trajectory.flow_rose(spark, res=9)


def q_flow_rose_oracle() -> str:
    from ..operators import trajectory

    body = trajectory.flow_rose_sql(DUCK, res=9, traj_table="geo_traj")
    return (
        f"{duck_geometry_ctes()}, geo_traj as ({traj_sql(DUCK)}), "
        f"__fr as ({body}) select * from __fr"
    )


QUERIES["flow_rose"] = (q_flow_rose, q_flow_rose_oracle)


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profiler over events: nulls / exact distincts /
    numeric extremes / string content-hash extremes (curation.profile)."""
    from ..operators import curation

    register_geometry_views(spark, sf_dir)
    return curation.profile(
        spark, "events",
        numeric_cols=["event_id", "user_id", "value"],
        string_cols=["event_type", "props"],
    )


def q_profile_oracle() -> str:
    from ..operators import curation

    return curation.profile_sql(
        DUCK, "events",
        numeric_cols=["event_id", "user_id", "value"],
        string_cols=["event_type", "props"],
    )


QUERIES["profile"] = (q_profile, q_profile_oracle)


def q_tile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MVT-style vector-tile cut: zone rings Sutherland-Hodgman-clipped to
    every tile of their refined res-7 quad cover, quantized to the 256-unit
    tile-local grid (operators/vectortile.py)."""
    from ..operators import vectortile

    register_geometry_views(spark, sf_dir)
    return vectortile.tile_cut(spark.table("geo_polys"), res=7, extent=256)


def q_tile_cut_oracle() -> str:
    from ..operators import vectortile

    body = vectortile.tile_cut_sql(DUCK, res=7, extent=256, cover_table="__tcc")
    return (
        f"{duck_geometry_ctes()}, __tcc as ({vectortile.duck_cover_cte(res=7)}), "
        f"__out as ({body}) select * from __out"
    )


QUERIES["tile_cut"] = (q_tile_cut, q_tile_cut_oracle)


def q_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares iso-density contour segments at 3 points/cell over
    the res-12 grid (tiling.contour): scatter-to-blocks + table-driven case
    emission, saddles fixed deterministically."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.contour(spark, res=12, threshold=3)


def q_contour_oracle() -> str:
    from ..operators import tiling

    body = tiling.contour_sql(DUCK, res=12, threshold=3)
    return f"{duck_geometry_ctes()}, __ct as ({body}) select * from __ct"


QUERIES["contour"] = (q_contour, q_contour_oracle)


def q_headways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-frequency headways per (event_type, hour): integer-micros
    gaps via one keyed lag window (temporal.headways)."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    return temporal.headways(spark)


def q_headways_oracle() -> str:
    from ..operators import temporal

    return temporal.headway_sql(DUCK)


QUERIES["headways"] = (q_headways, q_headways_oracle)


def q_gravity_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity-model OD fit: 2 IPF rounds over the origin×destination
    support, integer-nano state, impedance 1/(1+dist²)
    (trajectory.gravity_ipf)."""
    from ..operators import trajectory

    register_geometry_views(spark, sf_dir)
    spark.sql(f"create or replace temp view geo_traj as {traj_sql(SPARK)}")
    return trajectory.gravity_ipf(spark, res=10, rounds=2)


def q_gravity_ipf_oracle() -> str:
    from ..operators import trajectory

    body = trajectory.gravity_ipf_sql(DUCK, res=10, rounds=2, traj_table="geo_traj")
    return (
        f"{duck_geometry_ctes()}, geo_traj as ({traj_sql(DUCK)}), "
        f"__g as ({body}) select * from __g"
    )


QUERIES["gravity_ipf"] = (q_gravity_ipf, q_gravity_ipf_oracle)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation, itself oracle-gated: recall@5 of the IVF
    index vs the exact brute-force top-5, per query — the measurement a
    100 TB similarity deployment runs before trusting its index (both
    rankings are deterministic, so the metric is bit-exact)."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id % 50 = 0")
    brute = similarity.topk_cosine_brute(queries, emb, k=5).select("query_id", "vec_id")
    ivf = (
        similarity.topk_cosine_ivf(queries, emb, k=5, n_centroids=16, n_probe=4)
        .select("query_id", F.col("vec_id").alias("ivf_vec"))
    )
    joined = brute.join(
        ivf,
        (brute["query_id"] == ivf["query_id"]) & (brute["vec_id"] == ivf["ivf_vec"]),
        "left",
    ).select(brute["query_id"], brute["vec_id"], ivf["ivf_vec"])
    return joined.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_brute"),
        F.count("ivf_vec").cast("long").alias("n_hit"),
        (F.count("ivf_vec").cast("double") / F.count("*").cast("double")).alias("recall"),
    )


def q_ann_recall_oracle() -> str:
    return f"""
        with b as ({q_embed_topk_oracle()}),
        v as ({q_embed_topk_ivf_oracle()})
        select b.query_id as query_id,
               cast(count(*) as bigint) as n_brute,
               cast(count(v.vec_id) as bigint) as n_hit,
               (cast(count(v.vec_id) as double) / cast(count(*) as double)) as recall
        from b left join v on b.query_id = v.query_id and b.vec_id = v.vec_id
        group by b.query_id
    """


QUERIES["ann_recall"] = (q_ann_recall, q_ann_recall_oracle)


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-quality evaluation, itself oracle-gated: recall of the
    MinHash-LSH pair finder against the EXACT PPJoin pair set at the same
    threshold, measured over the lang-blocked universe the exact operator
    covers (the LSH side also surfaces cross-lang pairs; they are outside
    the measured universe and reported in n_lsh_total).  Both pair sets are
    deterministic, so the metric is bit-exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lsh = dedup.minhash_lsh_pairs(docs, n_perm=16, bands=4, jaccard_threshold=0.4)
    ex = dedup.ngram_jaccard_pairs(docs, n_shingle=3, threshold=0.4, prefilter_key="lang")
    lsh_pairs = lsh.select("doc_a", "doc_b", F.lit(1).alias("hit"))
    joined = ex.select("doc_a", "doc_b").join(lsh_pairs, ["doc_a", "doc_b"], "left")
    out = joined.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.count("hit").cast("long").alias("n_hit"),
        (F.count("hit").cast("double") / F.count("*").cast("double")).alias("recall"),
    ).crossJoin(lsh.groupBy().agg(F.count("*").cast("long").alias("n_lsh_total")))
    out._graft_cached = tuple(getattr(lsh, "_graft_cached", ())) + tuple(
        getattr(ex, "_graft_cached", ())
    )
    return out


def q_lsh_recall_oracle() -> str:
    return f"""
        with ex as ({q_ngram_jaccard_oracle()}),
        lsh as ({q_minhash_pairs_oracle()})
        select cast(count(*) as bigint) as n_exact,
               cast(count(lsh.doc_a) as bigint) as n_hit,
               (cast(count(lsh.doc_a) as double) / cast(count(*) as double)) as recall,
               (select cast(count(*) as bigint) from lsh) as n_lsh_total
        from ex left join lsh on ex.doc_a = lsh.doc_a and ex.doc_b = lsh.doc_b
    """


QUERIES["lsh_recall"] = (q_lsh_recall, q_lsh_recall_oracle)


def q_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent HRW shard assignment of the corpus to 5 shards
    (sampling.rendezvous_assign) — zero-shuffle projection."""
    from ..operators import sampling

    register_geometry_views(spark, sf_dir)
    return sampling.rendezvous_assign(spark, [f"shard-{i}" for i in range(5)])


def q_rendezvous_oracle() -> str:
    from ..operators import sampling

    return sampling.rendezvous_sql(DUCK, [f"shard-{i}" for i in range(5)])


QUERIES["rendezvous"] = (q_rendezvous, q_rendezvous_oracle)


def q_service_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isochrone cells: exact min-mm distance from the seed cells through
    4 relaxation rounds over the occupied res-12 grid
    (tiling.service_area)."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.service_area(spark, res=12, n_rounds=4, seed_mod=9)


def q_service_area_oracle() -> str:
    from ..operators import tiling

    body = tiling.service_area_oracle_sql(res=12, n_rounds=4, seed_mod=9)
    return f"{duck_geometry_ctes()}, __sa as ({body}) select * from __sa"


QUERIES["service_area"] = (q_service_area, q_service_area_oracle)


def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index quality, itself oracle-gated: recall@10 of the ADC ranking
    against the exact cosine top-10 for the same 4 queries — quantifies
    what the m·log2(k)-bit compression costs, bit-exactly (both rankings
    deterministic)."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(4)
    brute = (
        similarity.topk_cosine_brute(queries, emb, k=10)
        .select(F.col("query_id").alias("qid"), "vec_id")
    )
    # PQ ranks over the full corpus (the query itself lands at/near rank 1);
    # take 11 and drop self so both lists offer 10 non-self candidates
    pq = (
        similarity.topk_pq_adc(emb, m=4, k=16, iters=2, dim=64, n_queries=4, topk=11)
        .where(F.col("vid") != F.col("qid"))
        .select("qid", F.col("vid").alias("pq_vec"))
    )
    joined = brute.join(
        pq, (brute["qid"] == pq["qid"]) & (brute["vec_id"] == pq["pq_vec"]), "left"
    ).select(brute["qid"], brute["vec_id"], pq["pq_vec"])
    return joined.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_brute"),
        F.count("pq_vec").cast("long").alias("n_hit"),
        (F.count("pq_vec").cast("double") / F.count("*").cast("double")).alias("recall"),
    )


def q_pq_recall_oracle() -> str:
    from ..operators import dedup as _dd, similarity

    cos = _dd.cosine_expr("q.embedding", "c.embedding", DUCK)
    pq = similarity.topk_pq_adc_oracle_sql(m=4, k=16, iters=2, dim=64, n_queries=4, topk=11)
    return f"""
        with qs as (select vec_id, embedding from embeddings order by vec_id limit 4),
        brute as (
            select qid, vec_id from (
                select q.vec_id as qid, c.vec_id as vec_id,
                       row_number() over (partition by q.vec_id
                           order by round({cos}, 6) desc, c.vec_id asc) as rn
                from qs q cross join embeddings c
                where c.vec_id <> q.vec_id
            ) where rn <= 10
        ),
        pq0 as ({pq}),
        pq as (select qid, vid from pq0 where vid <> qid)
        select brute.qid as qid,
               cast(count(*) as bigint) as n_brute,
               cast(count(pq.vid) as bigint) as n_hit,
               (cast(count(pq.vid) as double) / cast(count(*) as double)) as recall
        from brute left join pq on brute.qid = pq.qid and brute.vec_id = pq.vid
        group by brute.qid
    """


QUERIES["pq_recall"] = (q_pq_recall, q_pq_recall_oracle)


def q_zone_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone dwell analytics: stay-point centroids bound to zones (the
    cell-pruned PIP operator), dwell summed per zone in exact integer
    micros — 'how long do users actually spend inside each fare zone', the
    composition a transit analyst runs on top of stop/move segmentation.
    A stay inside overlapping zones counts toward each (PIP semantics)."""
    from ..operators import pip, trajectory

    register_geometry_views(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stays = trajectory.stay_points(spark, ev).selectExpr(
        "user_id * 100000 + stop_seq as point_id",
        "clat as lat", "clon as lon",
        "cast(round(duration_s * 1000000.0e0) as bigint) as dwell_us",
    )
    bound = pip.bind_points_to_polygons(
        stays.select("point_id", "lat", "lon"),
        spark.table("geo_polys"), res=12, scheme="quad",
    )
    return (
        bound.join(stays.select("point_id", "dwell_us"), "point_id")
        .groupBy("zone_id")
        .agg(
            F.count("*").cast("long").alias("n_stays"),
            F.sum("dwell_us").cast("long").alias("dwell_us"),
        )
    )


def q_zone_dwell_oracle() -> str:
    from ..operators import trajectory

    stays = trajectory.stay_points_sql(DUCK, "events")
    pred = geo.point_in_polygon("s.lat", "s.lon", "z.pos_list", DUCK)
    return f"""
        {duck_geometry_ctes()},
        stays as (
            select user_id * 100000 + stop_seq as point_id,
                   clat as lat, clon as lon,
                   cast(round(duration_s * 1000000.0e0) as bigint) as dwell_us
            from ({stays}) st
        )
        select z.zone_id as zone_id,
               cast(count(*) as bigint) as n_stays,
               cast(sum(s.dwell_us) as bigint) as dwell_us
        from stays s cross join geo_polys z
        where {pred}
        group by z.zone_id
    """


QUERIES["zone_dwell"] = (q_zone_dwell, q_zone_dwell_oracle)


def _tpch_q4_sql(d: str) -> str:
    """TPC-H Q4 shape (priority counts over a semi-join): orders in a
    quarter with AT LEAST ONE late-shipping lineitem (exists → left-semi),
    counted by priority.  The testdata lineitem carries no commitdate, so
    'late' = shipped more than 60 days after order date — same plan shape
    (date-windowed fact scan, semi-join on the key, tiny group-by), pure
    integer output."""
    lag = (
        "l_shipdate > o_orderdate + interval 60 days" if d == SPARK
        else "l_shipdate > o_orderdate + interval 60 day"
    )
    return f"""
        select o_orderpriority, cast(count(*) as bigint) as order_count
        from orders
        where o_orderdate >= timestamp '1998-01-01 00:00:00'
          and o_orderdate <  timestamp '1998-07-01 00:00:00'
          and exists (
            select 1 from lineitem
            where l_orderkey = o_orderkey and {lag}
          )
        group by o_orderpriority
    """


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelates to a left-semi join; the fact crosses
    the join once at order granularity."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q4_sql(SPARK))


def q_tpch_q4_oracle() -> str:
    return _tpch_q4_sql(DUCK)


QUERIES["tpch_q4"] = (q_tpch_q4, q_tpch_q4_oracle)


def _tpch_q12_sql(d: str) -> str:
    """TPC-H Q12 shape (conditional aggregation after a fact join): per
    l_returnflag (the testdata's stand-in for shipmode), count high- vs
    low-priority orders among lineitems shipping in a window — integer
    conditional sums, one join, one tiny group-by."""
    return f"""
        select l_returnflag,
               cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                        then 1 else 0 end) as bigint) as high_line_count,
               cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
                        then 1 else 0 end) as bigint) as low_line_count
        from lineitem join orders on l_orderkey = o_orderkey
        where l_shipdate >= timestamp '1998-01-01 00:00:00'
          and l_shipdate <  timestamp '1998-07-01 00:00:00'
        group by l_returnflag
    """


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: windowed fact scan (PushedFilters on l_shipdate) joined to
    orders, conditional integer sums."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q12_sql(SPARK))


def q_tpch_q12_oracle() -> str:
    return _tpch_q12_sql(DUCK)


QUERIES["tpch_q12"] = (q_tpch_q12, q_tpch_q12_oracle)


def _tpch_q7_sql(d: str) -> str:
    """TPC-H Q7 shape (volume shipping between nation pairs by year): the
    two-dimension-chain fact join — lineitem→orders→customer→nation crossed
    with lineitem→supplier→nation — revenue quantized per row to int 1e-4
    BEFORE the sum, grouped by (supp_nation, cust_nation, year)."""
    yr = (
        "year(l_shipdate)" if d == SPARK
        else "cast(date_part('year', l_shipdate) as bigint)"
    )
    rev = (
        "cast(floor(l_extendedprice * (1.0e0 - l_discount) * 1.0e4 + 0.5e0)"
        " as bigint)"
    )
    return f"""
        select n1.n_name as supp_nation, n2.n_name as cust_nation,
               cast({yr} as bigint) as l_year,
               count(*) as n_lines,
               cast(sum({rev}) as bigint) as revenue_q4
        from lineitem
        join supplier on s_suppkey   = l_suppkey
        join orders   on o_orderkey  = l_orderkey
        join customer on c_custkey   = o_custkey
        join nation n1 on n1.n_nationkey = s_nationkey
        join nation n2 on n2.n_nationkey = c_nationkey
        where n1.n_nationkey <> n2.n_nationkey
        group by n1.n_name, n2.n_name, {yr}"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: fact-sized hash joins to both dimension chains (broadcast
    snowflake dims), map-side-combined aggregate on the pair-year key."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q7_sql(SPARK))


def q_tpch_q7_oracle() -> str:
    return _tpch_q7_sql(DUCK)


QUERIES["tpch_q7"] = (q_tpch_q7, q_tpch_q7_oracle)


def _tpch_q10_sql(d: str) -> str:
    """TPC-H Q10 shape (returned-item revenue ranking): customers ranked by
    revenue lost to returns in a quarter — fact join + group by customer +
    deterministic global top-20 on the integer (revenue, custkey) pair."""
    rev = (
        "cast(floor(l_extendedprice * (1.0e0 - l_discount) * 1.0e4 + 0.5e0)"
        " as bigint)"
    )
    return f"""
        select c_custkey, c_name, n_name,
               count(*) as n_lines,
               cast(sum({rev}) as bigint) as revenue_q4
        from lineitem
        join orders   on o_orderkey  = l_orderkey
        join customer on c_custkey   = o_custkey
        join nation   on n_nationkey = c_nationkey
        where l_returnflag = 'R'
          and o_orderdate >= timestamp '1998-01-01 00:00:00'
          and o_orderdate <  timestamp '1998-07-01 00:00:00'
        group by c_custkey, c_name, n_name
        order by revenue_q4 desc, c_custkey asc
        limit 20"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: pushed returnflag+date filters, broadcast dims, top-20 via
    TakeOrderedAndProject on an integer key."""
    register_geometry_views(spark, sf_dir)
    return spark.sql(_tpch_q10_sql(SPARK))


def q_tpch_q10_oracle() -> str:
    return _tpch_q10_sql(DUCK)


QUERIES["tpch_q10"] = (q_tpch_q10, q_tpch_q10_oracle)


def q_turn_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading-change corners (>45°) per user track, trig-free integer test
    (operators.trajectory.turn_points_sql)."""
    from ..operators import trajectory

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trajectory.turn_points(spark, ev)


def q_turn_points_oracle() -> str:
    from ..operators import trajectory

    return trajectory.turn_points_sql(DUCK, "events")


QUERIES["turn_points"] = (q_turn_points, q_turn_points_oracle)


def _return_gaps_sql(d: str) -> str:
    """Inter-session return-time analytics: per user the number of
    sessions, returns (session → next session), and exact integer-micros
    min/max/total return gap — the churn/retention signal product teams
    track next to the session table.  Same break rule as events_sessionize;
    everything after the per-user sort is integer.

    Scale: the sessionize window + one dimension-sized session table window
    + a per-user aggregate — all on the same user key, one shuffle."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    return f"""
        with q as (
            select user_id, event_id, {us} as us from events
        ),
        flagged as (
            select user_id, us,
                   case when lag(us) over w is null
                             or us - lag(us) over w > 1800000000
                        then 1 else 0 end as brk
            from q
            window w as (partition by user_id order by us asc, event_id asc)
        ),
        sessioned as (
            select user_id, us,
                   cast(sum(brk) over (partition by user_id order by us asc
                                       rows between unbounded preceding
                                       and current row) as bigint) as sidx
            from flagged
        ),
        sess as (
            select user_id, sidx,
                   min(us) as s_us, max(us) as e_us
            from sessioned group by user_id, sidx
        ),
        gaps as (
            select user_id,
                   lead(s_us) over (partition by user_id order by sidx) - e_us
                       as gap_us
            from sess
        )
        select user_id,
               cast(count(*) as bigint) as n_sessions,
               cast(count(gap_us) as bigint) as n_returns,
               cast(min(gap_us) as bigint) as min_gap_us,
               cast(max(gap_us) as bigint) as max_gap_us,
               cast(coalesce(sum(gap_us), 0) as bigint) as total_gap_us
        from gaps group by user_id"""


def q_return_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_return_gaps_sql(SPARK))


def q_return_gaps_oracle() -> str:
    return _return_gaps_sql(DUCK)


QUERIES["return_gaps"] = (q_return_gaps, q_return_gaps_oracle)


def _quantile_rank_sql(d: str) -> str:
    """Per-group quantile-rank transform (the rank-gauss/quantile-uniform
    feature): qrank = (rn − 1)/(n − 1) with a fully deterministic order
    (value, event_id), quantized 1e-9 — the monotone feature map tabular
    models use to kill scale/outlier effects.

    Scale: one window + one count over the same group key — one shuffle."""
    return """
        with q as (
            select event_type, event_id,
                   cast(floor(value * 1.0e6 + 0.5e0) as bigint) as xq
            from events
        ),
        r as (
            select event_type, event_id, xq,
                   row_number() over (partition by event_type
                                      order by xq asc, event_id asc) as rn,
                   count(*) over (partition by event_type) as n
            from q
        )
        select event_type, event_id, xq,
               cast(floor(cast(rn - 1 as double) / cast(n - 1 as double)
                    * 1.0e9 + 0.5e0) as bigint) as qrank_q9
        from r where n > 1"""


def q_quantile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_quantile_rank_sql(SPARK))


def q_quantile_rank_oracle() -> str:
    return _quantile_rank_sql(DUCK)


QUERIES["quantile_rank"] = (q_quantile_rank, q_quantile_rank_oracle)


def _locate_along_sql(d: str) -> str:
    """Linear referencing INVERSE (NeTEx PointOnLink / dynamic segmentation):
    for each zone ring and fraction f ∈ {¼, ½, ¾}, the interpolated point
    at f·total_length along the ring — how schedules place stops at
    chainages.  Same integer-mm prefix table as linear_ref (order-free
    cumsum); the owning segment is the one whose [prefix, prefix+len)
    half-open interval contains the target (exact integer compare), the
    interpolation one fixed float sequence rounded 9.

    Scale: segments explode lines-sized; the per-(zone, f) segment pick is
    a keyed filter (no window over the corpus); everything joins on
    zone_id."""
    from ..operators.distjoin import seg_dist_m  # noqa: F401  (doc pointer)
    from ..functions.portable import haversine_m, round_half

    if d == SPARK:
        seg_src = (
            "select zone_id, i, "
            "element_at(pos_list, cast(2*i - 1 as int)) as sy1, "
            "element_at(pos_list, cast(2*i as int)) as sx1, "
            "element_at(pos_list, cast(2*i + 1 as int)) as sy2, "
            "element_at(pos_list, cast(2*i + 2 as int)) as sx2 "
            "from (select zone_id, pos_list, "
            "explode(sequence(1, size(pos_list) div 2 - 1)) as i from geo_polys)"
        )
        fracs = "select explode(array(0.25e0, 0.5e0, 0.75e0)) as f"
    else:
        seg_src = (
            "select zone_id, t.i as i, "
            "pos_list[2*t.i - 1] as sy1, pos_list[2*t.i] as sx1, "
            "pos_list[2*t.i + 1] as sy2, pos_list[2*t.i + 2] as sx2 "
            "from geo_polys, "
            "unnest(generate_series(1, len(pos_list) // 2 - 1)) t(i)"
        )
        fracs = "select unnest([0.25e0, 0.5e0, 0.75e0]) as f"
    seg_len = round_half(
        f"({haversine_m('sy1', 'sx1', 'sy2', 'sx2', d)}) * 1000.0e0", d
    )
    t = "(cast(g.target_mm - s.prefix_mm as double) / cast(s.seg_len_mm as double))"
    return f"""
        with segs as ({seg_src}),
        seg_tab as (
            select zone_id, i, sy1, sx1, sy2, sx2,
                   {seg_len} as seg_len_mm,
                   cast(coalesce(sum({seg_len}) over (
                       partition by zone_id order by i
                       rows between unbounded preceding and 1 preceding), 0)
                       as bigint) as prefix_mm
            from segs
        ),
        tot as (
            select zone_id, cast(sum(seg_len_mm) as bigint) as total_mm
            from seg_tab group by zone_id
        ),
        goals as (
            select tot.zone_id, fr.f,
                   cast(floor(fr.f * cast(tot.total_mm as double)) as bigint)
                       as target_mm
            from tot cross join ({fracs}) fr
        )
        select g.zone_id, g.f,
               g.target_mm,
               cast(s.i as bigint) as seg_idx,
               round(s.sy1 + {t} * (s.sy2 - s.sy1), 9) as lat,
               round(s.sx1 + {t} * (s.sx2 - s.sx1), 9) as lon
        from goals g
        join seg_tab s
          on s.zone_id = g.zone_id
         and s.prefix_mm <= g.target_mm
         and g.target_mm < s.prefix_mm + s.seg_len_mm"""


def q_locate_along(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_locate_along_sql(SPARK))


def q_locate_along_oracle() -> str:
    return f"{duck_geometry_ctes()}, x as ({_locate_along_sql(DUCK)}) select * from x"


QUERIES["locate_along"] = (q_locate_along, q_locate_along_oracle)


_G_RADII = [250.0, 500.0, 1000.0, 2000.0]


def q_g_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor distance distribution G(r) at four radii
    (operators.tiling.g_function) — Ripley's K's sibling separating
    aggregation from inhibition."""
    from ..operators import tiling

    register_geometry_views(spark, sf_dir)
    return tiling.g_function(spark.table("geo_points"), _G_RADII, res=13)


def q_g_function_oracle() -> str:
    from ..operators import tiling

    return (
        f"{duck_geometry_ctes()}, __g as ("
        + tiling.g_function_oracle_sql("select * from geo_points", _G_RADII)
        + ") select * from __g"
    )


QUERIES["g_function"] = (q_g_function, q_g_function_oracle)


def _benford_sql(d: str) -> str:
    """Benford's-law first-digit audit of the price column — the classic
    numeric-forensics screen.  The first significant digit comes from the
    INTEGER cent representation's decimal string (integers format
    identically in both engines — no log10/pow float path), expected
    probabilities log10(1+1/k) ride as 9 literals, and each digit's chi²
    term is quantized to bigint 1e-9 so the audit is bit-exact.

    Scale: one scan, one 9-key map-side-combined groupBy."""
    import math as _m

    probs = {k: _m.log10(1.0 + 1.0 / k) for k in range(1, 10)}
    pcase = " ".join(
        f"when d = '{k}' then {probs[k]!r}e0" for k in range(1, 10)
    )
    chi = (
        "cast(floor((cast(obs as double) - exp_n) * (cast(obs as double) - exp_n)"
        " / exp_n * 1.0e9 + 0.5e0) as bigint)"
    )
    return f"""
        with q as (
            select substring(cast(cast(floor(l_extendedprice * 100.0e0 + 0.5e0)
                   as bigint) as {'string' if d == SPARK else 'varchar'}), 1, 1) as d
            from lineitem where l_extendedprice > 0.01e0
        ),
        c as (select d, count(*) as obs from q group by d),
        n as (select sum(obs) as n from c),
        staged as (
            select c.d as first_digit, cast(c.obs as bigint) as obs,
                   (case {pcase} end) * cast(n.n as double) as exp_n
            from c cross join n
        )
        select first_digit, obs,
               round(exp_n, 6) as expected,
               {chi} as chi2_term_q9
        from staged"""


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_benford_sql(SPARK))


def q_benford_oracle() -> str:
    return _benford_sql(DUCK)


QUERIES["benford"] = (q_benford, q_benford_oracle)


def _sn_blocking_sql(d: str, w: int = 3) -> str:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the OTHER
    classic entity-resolution candidate generator next to the engine's
    LSH/bucket blocking: sort the corpus by a normalized key and pair each
    record with its ``w`` successors.  Candidate count is exactly n·w-ish,
    independent of key-collision skew — the property that makes it the
    fallback when bucket keys are degenerate.

    The global sort is inherent to the method (ONE range-partitioned sort
    at scale; documented cost); pairs come from an offsets explode +
    integer equi-join on the rank — no range join, no window over pairs."""
    key = (
        "substring(regexp_replace(lower(text), '[^a-z]', ''), 1, 12)"
        if d == SPARK
        else "substring(regexp_replace(lower(text), '[^a-z]', '', 'g'), 1, 12)"
    )
    offs = (
        f"explode(sequence(1, {w}))" if d == SPARK
        else f"unnest(generate_series(1, {w}))"
    )
    return f"""
        with k as (
            select doc_id, {key} as blk_key from documents
        ),
        r as (
            select doc_id, blk_key,
                   cast(row_number() over (order by blk_key asc, doc_id asc)
                        as bigint) as rn
            from k
        ),
        offs as (select rn, doc_id, blk_key, {offs} as o from r)
        select a.doc_id as doc_a, b.doc_id as doc_b,
               cast(a.o as int) as window_dist,
               (a.blk_key = b.blk_key) as same_key
        from offs a join r b on b.rn = a.rn + a.o"""


def q_sn_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_sn_blocking_sql(SPARK))


def q_sn_blocking_oracle() -> str:
    return _sn_blocking_sql(DUCK)


QUERIES["sn_blocking"] = (q_sn_blocking, q_sn_blocking_oracle)


def _haar_energy_sql(d: str) -> str:
    """3-level Haar wavelet energy of each user's activity series — the
    multi-resolution signal feature (burstiness at 1/2/4-slot scales):
    the user's time span splits into 8 equal slots, slot sums are exact
    1e-3-quantized integers (one groupBy with 8 conditional sums — no
    dense-fill join), and the Haar transform unrolls as pure integer
    arithmetic: level-1/2/3 detail energies are sums of squared
    differences.  |slot sum| ≤ ~1e7 ⇒ d² ≤ ~4e14, safely inside int64.

    Scale: ONE user-keyed window (span) + ONE groupBy — two passes over
    the same shuffle key."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    idiv = "div" if d == SPARK else "//"
    slot = f"least(7, ((us - min_us) * 8) {idiv} (max_us - min_us + 1))"
    s = ", ".join(
        f"cast(coalesce(sum(case when slot = {k} then vq end), 0) as bigint) as s{k}"
        for k in range(8)
    )
    # Haar: a1_i = s2i + s2i+1, d1_i = s2i - s2i+1; levels chain on sums
    d1 = ["(s0 - s1)", "(s2 - s3)", "(s4 - s5)", "(s6 - s7)"]
    a1 = ["(s0 + s1)", "(s2 + s3)", "(s4 + s5)", "(s6 + s7)"]
    d2 = [f"({a1[0]} - {a1[1]})", f"({a1[2]} - {a1[3]})"]
    a2 = [f"({a1[0]} + {a1[1]})", f"({a1[2]} + {a1[3]})"]
    d3 = [f"({a2[0]} - {a2[1]})"]
    e = lambda ds: " + ".join(f"{x} * {x}" for x in ds)  # noqa: E731
    return f"""
        with q as (
            select user_id, {us} as us,
                   cast(floor(value * 1.0e3 + 0.5e0) as bigint) as vq
            from events
        ),
        spans as (
            select user_id, us, vq,
                   min(us) over (partition by user_id) as min_us,
                   max(us) over (partition by user_id) as max_us
            from q
        ),
        slotted as (
            select user_id, vq, cast({slot} as int) as slot from spans
        ),
        sums as (
            select user_id, {s} from slotted group by user_id
        )
        select user_id,
               cast({e(d1)} as bigint) as energy_l1,
               cast({e(d2)} as bigint) as energy_l2,
               cast({e(d3)} as bigint) as energy_l3,
               cast((s0+s1+s2+s3+s4+s5+s6+s7) as bigint) as total_q3
        from sums"""


def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_haar_energy_sql(SPARK))


def q_haar_energy_oracle() -> str:
    return _haar_energy_sql(DUCK)


QUERIES["haar_energy"] = (q_haar_energy, q_haar_energy_oracle)


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity terms of the LPA partition — integer numerators,
    global Q one division away (operators.graph.modularity_sql)."""
    from ..operators import graph

    register_geometry_views(spark, sf_dir)
    return spark.sql(graph.modularity_sql(SPARK))


def q_modularity_oracle() -> str:
    from ..operators import graph

    return graph.modularity_sql(DUCK)


QUERIES["modularity"] = (q_modularity, q_modularity_oracle)


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set-containment pairs >= 9/10 — the near-superset dedup
    rule symmetric Jaccard misses (operators.simjoin.containment_pairs)."""
    from ..operators import simjoin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # caches attached via _attach_cached; the harness releases them post-collect
    return simjoin.containment_pairs(docs, threshold_p=9, threshold_q=10)


def q_containment_oracle() -> str:
    from ..operators import simjoin

    return simjoin.containment_pairs_oracle_sql(threshold_p=9, threshold_q=10)


QUERIES["containment"] = (q_containment, q_containment_oracle)


def q_cosine_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cosine_pairs in its documented STANDALONE scale posture: the max_df
    guardrail ON (df > 100 terms — the stopword/boilerplate head that
    drives the Θ(Σ df²) fan-out — dropped before the postings self-join).
    Exact over the capped vocabulary; oracle applies the same cap.  The
    uncapped exact row stays in the registry as the LSH-shard verifier
    (SCALE.md posture); the bench times this row."""
    from ..operators import simjoin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simjoin.cosine_pairs(docs, threshold_p=1, threshold_q=2, max_df=100)


def q_cosine_pairs_capped_oracle() -> str:
    from ..operators import simjoin

    return simjoin.cosine_pairs_oracle_sql(threshold_p=1, threshold_q=2, max_df=100)


QUERIES["cosine_pairs_capped"] = (q_cosine_pairs_capped, q_cosine_pairs_capped_oracle)


def q_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """containment_pairs with the max_df guardrail ON (standalone scale
    posture; see q_cosine_pairs_capped)."""
    from ..operators import simjoin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simjoin.containment_pairs(docs, threshold_p=9, threshold_q=10, max_df=100)


def q_containment_capped_oracle() -> str:
    from ..operators import simjoin

    return simjoin.containment_pairs_oracle_sql(threshold_p=9, threshold_q=10, max_df=100)


QUERIES["containment_capped"] = (q_containment_capped, q_containment_capped_oracle)


def q_streaming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window (2h window / 1h slide) value histogram over a replayed
    event stream — every event lands in TWO overlapping windows; complete
    mode + availableNow makes the emitted set arrival-order-independent, so
    a batch hopping re-derivation is an exact oracle.  Timestamps compare
    as fractional epoch seconds (the streaming_sessions convention)."""
    import tempfile

    from ..streaming import stream as st

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = tempfile.mkdtemp(prefix="graft_shist_")
    ev.repartition(5).write.mode("overwrite").parquet(f"{tmp}/src")
    stream_df = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{tmp}/src")
    )
    hist = st.streaming_hopping_hist(stream_df)
    q = (
        hist.writeStream.format("memory")
        .queryName("q_shist")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("q_shist").selectExpr(
        "round(unix_micros(window_start) / 1.0e6, 6) as window_start",
        "bucket",
        "cast(n as bigint) as n",
    )


def q_streaming_hist_oracle() -> str:
    # hopping replay: each event belongs to the two 2h windows starting at
    # date_trunc(hour) and date_trunc(hour) - 1h
    return """
        with e as (
            select value,
                   date_trunc('hour', ts) - to_hours(o.o) as w_start
            from events, unnest([0, 1]) o(o)
        )
        select round(epoch(w_start), 6) as window_start,
               cast(least(7, greatest(0, cast(floor(value / 25.0e0) as int)))
                    as int) as bucket,
               cast(count(*) as bigint) as n
        from e group by 1, 2"""


QUERIES["streaming_hist"] = (q_streaming_hist, q_streaming_hist_oracle)


def _zorder_ranges_sql(d: str, res: int = 9) -> str:
    """Z-order RANGE PLANNER: per zone, the minimal set of contiguous
    Morton-key ranges covering its cells at ``res`` — the index-pruning
    primitive that turns a spatial predicate into file/row-group skip
    ranges over a Z-ordered layout (the read-side complement of
    write_zordered).  Pure integers: cover cells → morton keys → islands
    of consecutive keys (key − row_number is constant within an island).

    Scale: cover explode (bounded fan-out) + ONE per-zone window + a
    per-(zone, island) groupBy — no corpus involvement at all; ranges are
    what the scan planner broadcasts."""
    from ..sources import layout

    cover = geo.quad_cover_bbox("pos_list", res, d)
    ex = (
        f"select zone_id, explode({cover}) as cell from geo_polys"
        if d == SPARK
        else f"select zone_id, unnest({cover}) as cell from geo_polys"
    )
    ix, iy = geo.quad_unpack("cell", res, d)
    z = layout.morton_key(f"({ix})", f"({iy})", d)
    return f"""
        with cov as ({ex}),
        keyed as (
            select zone_id, cast({z} as bigint) as zkey from cov
        ),
        ranked as (
            select zone_id, zkey,
                   zkey - row_number() over (
                       partition by zone_id order by zkey asc) as island
            from keyed
        )
        select zone_id,
               cast(min(zkey) as bigint) as z_lo,
               cast(max(zkey) as bigint) as z_hi,
               cast(count(*) as bigint) as n_cells
        from ranked group by zone_id, island"""


def q_zorder_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_zorder_ranges_sql(SPARK))


def q_zorder_ranges_oracle() -> str:
    return f"{duck_geometry_ctes()}, __zr as ({_zorder_ranges_sql(DUCK)}) select * from __zr"


QUERIES["zorder_ranges"] = (q_zorder_ranges, q_zorder_ranges_oracle)


def _churn_labels_sql(d: str, horizon_days: int = 14, feat_days: int = 7) -> str:
    """Supervised-dataset builder for churn prediction: per (user, event)
    the LABEL — no activity within the next ``horizon_days`` — plus leakage
    -safe features computed strictly from the past (events in the prior
    ``feat_days``, micros since previous event).  The window/label
    discipline every behavioral-ML pipeline needs and most get subtly
    wrong (future leakage); here the feature frame ends at the current row
    and the label frame is derived from lead() only.

    All integer micros; one user-keyed sort serves the lead, the lag, and
    the RANGE frame."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    h_us = horizon_days * 86400000000
    f_us = feat_days * 86400000000
    return f"""
        with q as (
            select user_id, event_id, {us} as us from events
        ),
        w as (
            select user_id, event_id, us,
                   lead(us) over win as next_us,
                   lag(us) over win as prev_us,
                   count(*) over (partition by user_id order by us
                                  range between {f_us} preceding and current row)
                       as n_prior_{feat_days}d
            from q
            window win as (partition by user_id order by us asc, event_id asc)
        )
        select user_id, event_id,
               cast(n_prior_{feat_days}d as bigint) as n_prior_{feat_days}d,
               cast(coalesce(us - prev_us, -1) as bigint) as us_since_prev,
               (next_us is null or next_us - us > {h_us}) as churned
        from w"""


def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_churn_labels_sql(SPARK))


def q_churn_labels_oracle() -> str:
    return _churn_labels_sql(DUCK)


QUERIES["churn_labels"] = (q_churn_labels, q_churn_labels_oracle)


_MATRYOSHKA_DIMS = (16, 32)


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka/truncation evaluation: recall@5 of cosine top-k computed
    on the first 16/32 embedding dims vs the full-dim exact ranking — the
    measurement behind 'can we serve the short prefix of the embedding?'
    (MRL-style deployments).  Both rankings are deterministic ⇒ the metric
    is bit-exact, per (dim, query)."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id % 50 = 0")
    full = similarity.topk_cosine_brute(queries, emb, k=5).select(
        "query_id", "vec_id"
    )
    out = None
    for dim in _MATRYOSHKA_DIMS:
        tq = queries.selectExpr(
            "vec_id", f"slice(embedding, 1, {dim}) as embedding"
        )
        tc = emb.selectExpr("vec_id", f"slice(embedding, 1, {dim}) as embedding")
        trunc = similarity.topk_cosine_brute(tq, tc, k=5).select(
            "query_id", F.col("vec_id").alias("t_vec")
        )
        joined = full.join(
            trunc,
            (full["query_id"] == trunc["query_id"])
            & (full["vec_id"] == trunc["t_vec"]),
            "left",
        ).select(full["query_id"], full["vec_id"], trunc["t_vec"])
        per_q = joined.groupBy("query_id").agg(
            F.lit(dim).cast("int").alias("trunc_dim"),
            F.count("*").cast("long").alias("n_full"),
            F.count("t_vec").cast("long").alias("n_hit"),
            (F.count("t_vec").cast("double") / F.count("*").cast("double")).alias(
                "recall"
            ),
        ).select("trunc_dim", "query_id", "n_full", "n_hit", "recall")
        out = per_q if out is None else out.unionByName(per_q)
    return out


def _embed_topk_sliced_oracle(dim: int) -> str:
    cos = dedup.cosine_expr(
        f"list_slice(q.embedding, 1, {dim})", f"list_slice(c.embedding, 1, {dim})", DUCK
    )
    return f"""
        select query_id, vec_id from (
            select q.vec_id as query_id, c.vec_id as vec_id,
                   row_number() over (
                       partition by q.vec_id
                       order by round({cos}, 6) desc, c.vec_id asc) as rn
            from embeddings q cross join embeddings c
            where q.vec_id % 50 = 0 and c.vec_id <> q.vec_id
        ) t where rn <= 5"""


def q_matryoshka_recall_oracle() -> str:
    parts = []
    for dim in _MATRYOSHKA_DIMS:
        parts.append(f"""
        select cast({dim} as int) as trunc_dim, b.query_id as query_id,
               cast(count(*) as bigint) as n_full,
               cast(count(t.vec_id) as bigint) as n_hit,
               (cast(count(t.vec_id) as double) / cast(count(*) as double))
                   as recall
        from (select query_id, vec_id from ({q_embed_topk_oracle()})) b
        left join ({_embed_topk_sliced_oracle(dim)}) t
          on t.query_id = b.query_id and t.vec_id = b.vec_id
        group by b.query_id""")
    return " union all ".join(parts)


QUERIES["matryoshka_recall"] = (q_matryoshka_recall, q_matryoshka_recall_oracle)


def _ndcg_sql(d: str, k: int = 15) -> str:
    """NDCG@k of the BM25 ranking with graded relevance = query-term hit
    count capped at 3 — the ranking-quality metric every retrieval system
    reports.  Each rank's gain term (2^rel − 1)/log2(rank+1) is quantized
    to bigint 1e-9 BEFORE the fold (order-free); IDCG re-ranks the same
    relevance grades descending; NDCG is one final division."""
    from ..operators import retrieval

    bm = retrieval.bm25_topk_oracle_sql(_BM25_TERMS, k=k) if d == DUCK else None
    toks = tx.tokens("text", d)
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    if d == SPARK:
        relx = (
            f"least(3, size(filter({toks}, t -> array_contains(array({terms}), t))))"
        )
    else:
        relx = (
            f"least(3, len(list_filter({toks}, t -> list_contains([{terms}], t))))"
        )
    gain = (
        "cast(floor((pow(2.0e0, cast(rel as double)) - 1.0e0)"
        " / (ln(cast(rnk + 1 as double)) / ln(2.0e0))"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    bm_src = "__ndcg_bm" if d == SPARK else f"({bm})"
    return f"""
        with ranked as (
            select doc_id, score,
                   cast(row_number() over (order by score desc, doc_id asc)
                        as bigint) as rnk
            from {bm_src}
        ),
        graded as (
            select r.rnk, {relx} as rel
            from ranked r join documents dd on dd.doc_id = r.doc_id
        ),
        ideal as (
            select cast(row_number() over (order by rel desc) as bigint) as rnk,
                   rel
            from graded
        ),
        dcg as (select cast(sum({gain}) as bigint) as dcg_q9 from graded),
        idcg as (select cast(sum({gain}) as bigint) as idcg_q9 from ideal)
        select cast({k} as int) as k, dcg.dcg_q9, idcg.idcg_q9,
               round(cast(dcg.dcg_q9 as double) / cast(idcg.idcg_q9 as double), 9)
                   as ndcg
        from dcg cross join idcg"""


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import retrieval

    register_geometry_views(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    retrieval.bm25_topk(docs, _BM25_TERMS, k=15).createOrReplaceTempView(
        "__ndcg_bm"
    )
    return spark.sql(_ndcg_sql(SPARK))


def q_ndcg_oracle() -> str:
    return _ndcg_sql(DUCK)


QUERIES["ndcg"] = (q_ndcg, q_ndcg_oracle)


def _autocorr_sql(d: str, lags_h: tuple[int, ...] = (24, 48)) -> str:
    """Periodicity detection: Pearson autocorrelation of each user's HOURLY
    event-count series at daily lags — the rhythm detector (daily
    commuters spike at lag 24h) behind demand forecasting.  Exact integer
    moments (n, Σx, Σy, Σxy, Σx², Σy²) from a self-join of the hourly
    count table on (user, hour+lag); r is ONE fixed float sequence
    quantized 1e-9.  Pairs exist only where BOTH hours have events — the
    sparse-series convention, documented; users need ≥ 3 overlapping
    hour pairs to emit.

    Scale: the hourly table is users × active-hours (dimension-sized next
    to the corpus); the lag join is keyed on (user, hour)."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    idiv = "div" if d == SPARK else "//"
    lags_vals = ", ".join(str(h) for h in lags_h)
    lags = (
        f"explode(array({lags_vals}))" if d == SPARK
        else f"unnest([{lags_vals}])"
    )
    num = "(cast(n * sxy - sx * sy as double))"
    den = (
        "sqrt(cast(n * sxx - sx * sx as double))"
        " * sqrt(cast(n * syy - sy * sy as double))"
    )
    rq = f"cast(floor({num} / nullif({den}, 0.0e0) * 1.0e9 + 0.5e0) as bigint)"
    return f"""
        with h as (
            select user_id, ({us}) {idiv} 3600000000 as hour,
                   cast(count(*) as bigint) as c
            from events group by 1, 2
        ),
        lagged as (
            select a.user_id, l.lag_h, a.c as x, b.c as y
            from h a
            cross join (select {lags} as lag_h) l
            join h b on b.user_id = a.user_id and b.hour = a.hour + l.lag_h
        ),
        m as (
            select user_id, lag_h,
                   cast(count(*) as bigint) as n,
                   cast(sum(x) as bigint) as sx, cast(sum(y) as bigint) as sy,
                   cast(sum(x * y) as bigint) as sxy,
                   cast(sum(x * x) as bigint) as sxx,
                   cast(sum(y * y) as bigint) as syy
            from lagged group by user_id, lag_h
        )
        select user_id, cast(lag_h as int) as lag_h, n,
               {rq} as autocorr_q9
        from m
        where n >= 3
          and n * sxx - sx * sx > 0
          and n * syy - sy * sy > 0"""


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_autocorr_sql(SPARK))


def q_autocorr_oracle() -> str:
    return _autocorr_sql(DUCK)


QUERIES["autocorr"] = (q_autocorr, q_autocorr_oracle)


def q_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the gated logreg — same unrolled GD chain,
    observed-range probability bins
    (operators.regression.logreg_calibration_sql)."""
    from ..operators import regression

    register_geometry_views(spark, sf_dir)
    return spark.sql(regression.logreg_calibration_sql(SPARK))


def q_logreg_calibration_oracle() -> str:
    from ..operators import regression

    return regression.logreg_calibration_sql(DUCK)


QUERIES["logreg_calibration"] = (q_logreg_calibration, q_logreg_calibration_oracle)


def _weighted_median_sql(d: str) -> str:
    """Exact weighted median of order value per returnflag, weighted by
    quantity — the fair-aggregation primitive (a 50-unit line counts 50×):
    lower weighted median = the smallest value whose cumulative weight
    reaches half the total.  Pure integers: quantized values, integer
    weights, ONE cumulative window over the per-group sort + one argmin —
    no approximation, no percentile interpolation ambiguity.

    Scale: one shuffle on the group key; the cumulative frame runs in the
    same sort; ties on value merge before the window (groupBy) so the
    window input is value-distinct per group."""
    v = "cast(floor(l_extendedprice * 1.0e2 + 0.5e0) as bigint)"
    w = "cast(floor(l_quantity + 0.5e0) as bigint)"
    return f"""
        with q as (
            select l_returnflag as grp, {v} as vq, sum({w}) as wq
            from lineitem group by l_returnflag, {v}
        ),
        c as (
            select grp, vq, wq,
                   cast(sum(wq) over (partition by grp order by vq asc
                                      rows between unbounded preceding
                                      and current row) as bigint) as cw,
                   cast(sum(wq) over (partition by grp) as bigint) as tw
            from q
        )
        select grp as l_returnflag,
               cast(min(case when 2 * cw >= tw then vq end) as bigint)
                   as wmedian_q2,
               cast(max(tw) as bigint) as total_weight
        from c group by grp"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_weighted_median_sql(SPARK))


def q_weighted_median_oracle() -> str:
    return _weighted_median_sql(DUCK)


QUERIES["weighted_median"] = (q_weighted_median, q_weighted_median_oracle)


def _theil_sen_sql(d: str) -> str:
    """Theil–Sen robust trend per user: the MEDIAN of all pairwise slopes
    (value change per hour) — breakdown point 29%, the robust sibling of
    the OLS trend_fit and the rank-based mk_trend.  Slopes are quantized
    to bigint 1e-6 per pair (one float division each, fixed operand
    order); the median is the lower median over the per-user slope
    multiset via the same cumulative-window argmin as weighted_median.

    Scale: O(n²) pairs per GROUP by problem statement (n = events/user,
    bounded); pairs join on the user key only — never cross-user."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    slope = (
        "cast(floor((b.xq - a.xq) * 3600.0e0 / cast(b.us - a.us as double)"
        " + 0.5e0) as bigint)"
    )
    return f"""
        with q as (
            select user_id, event_id, {us} as us,
                   cast(floor(value * 1.0e6 + 0.5e0) as bigint) as xq
            from events
        ),
        slopes as (
            select a.user_id, {slope} as s
            from q a join q b
              on b.user_id = a.user_id
             and (b.us > a.us or (b.us = a.us and b.event_id > a.event_id))
            where b.us <> a.us
        ),
        g as (select user_id, s, count(*) as c from slopes group by user_id, s),
        c as (
            select user_id, s, c,
                   cast(sum(c) over (partition by user_id order by s asc
                                     rows between unbounded preceding
                                     and current row) as bigint) as cc,
                   cast(sum(c) over (partition by user_id) as bigint) as tc
            from g
        )
        select user_id,
               cast(min(case when 2 * cc >= tc then s end) as bigint)
                   as ts_slope_q6_per_h,
               cast(max(tc) as bigint) as n_slopes
        from c group by user_id"""


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_theil_sen_sql(SPARK))


def q_theil_sen_oracle() -> str:
    return _theil_sen_sql(DUCK)


QUERIES["theil_sen"] = (q_theil_sen, q_theil_sen_oracle)


def _stump_sql(d: str, n_features: int = 2) -> str:
    """Decision-stump learner: per embedding feature the THRESHOLD that
    maximizes information gain for y = label % 2 — the weak learner
    boosting stacks, and the single most interpretable split-quality
    report.  Candidate splits are the observed distinct values; prefix
    positive/total counts come from ONE cumulative window per feature over
    the value sort; each candidate's IG is a fixed float sequence over
    those exact integers, quantized to 1e-9 BEFORE the per-feature argmax
    (ties → smaller threshold).  Zero-entropy guards use the exact counts.

    Scale: one (feature)-keyed window over the distinct-value table + a
    per-feature argmax — feature count × distinct values, corpus touched
    once."""
    from ..functions.portable import element_at

    cols = ", ".join(
        f"cast({element_at('embedding', str(j), d)} as double) as x{j}"
        for j in range(1, n_features + 1)
    )
    stack = " union all ".join(
        f"select {j} as feat, cast(floor(x{j} * 1.0e6 + 0.5e0) as bigint) as vq, y from base"
        for j in range(1, n_features + 1)
    )
    # entropy helper over (pos, n): −p·ln(p) − (1−p)·ln(1−p), 0 when pure
    def ent(pos: str, n: str) -> str:
        p = f"(cast({pos} as double) / cast({n} as double))"
        return (
            f"(case when {pos} = 0 or {pos} = {n} then 0.0e0 else "
            f"-({p}) * ln({p}) - (1.0e0 - {p}) * ln(1.0e0 - {p}) end)"
        )

    h_all = ent("tp", "tn")
    h_l = ent("lp", "ln_")
    h_r = ent("tp - lp", "tn - ln_")
    ig = (
        f"({h_all} - (cast(ln_ as double) / cast(tn as double)) * {h_l}"
        f" - (cast(tn - ln_ as double) / cast(tn as double)) * {h_r})"
    )
    igq = f"cast(floor({ig} * 1.0e9 + 0.5e0) as bigint)"
    return f"""
        with base as (
            select {cols}, cast(label % 2 as bigint) as y from embeddings
        ),
        stacked as ({stack}),
        vals as (
            select feat, vq,
                   cast(count(*) as bigint) as n,
                   cast(sum(y) as bigint) as pos
            from stacked group by feat, vq
        ),
        pref as (
            select feat, vq,
                   cast(sum(n) over w as bigint) as ln_,
                   cast(sum(pos) over w as bigint) as lp,
                   cast(sum(n) over (partition by feat) as bigint) as tn,
                   cast(sum(pos) over (partition by feat) as bigint) as tp
            from vals
            window w as (partition by feat order by vq asc
                         rows between unbounded preceding and current row)
        ),
        scored as (
            select feat, vq, ln_, tn, {igq} as ig_q9
            from pref where ln_ < tn
        )
        select cast(feat as int) as feature_idx,
               vq as threshold_q6, ig_q9,
               ln_ as n_left, tn - ln_ as n_right
        from (
            select feat, vq, ln_, tn, ig_q9,
                   row_number() over (
                       partition by feat order by ig_q9 desc, vq asc) as rn
            from scored
        ) t where rn = 1"""


def q_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_stump_sql(SPARK))


def q_stump_oracle() -> str:
    return _stump_sql(DUCK)


QUERIES["stump"] = (q_stump, q_stump_oracle)


def _kaplan_meier_sql(d: str) -> str:
    """Kaplan–Meier survival estimate of user lifetime: duration = hours
    between a user's first and last event; users still active in the final
    12 hours of the corpus are CENSORED (lifetime only known to exceed
    their duration) — the estimator that handles censoring correctly where
    a naive mean dies.  S(t) = Π over event times (1 − d_i/n_i), computed
    order-free as exp(Σ quantized ln terms): each time step's ln(1−d/n)
    quantized to bigint 1e-9, the cumulative sum one ordered window, the
    exp at the end.

    Scale: per-user spans are one groupBy; the KM table is event-time-
    sized (≤ users), windows run over THAT dimension table only."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    h12 = 12 * 3600000000
    lnq = "cast(floor(ln({x}) * 1000000000.0e0 + 0.5e0) as bigint)"
    term = lnq.format(
        x="1.0e0 - cast(d_events as double) / cast(n_risk as double)"
    )
    return f"""
        with spans as (
            select user_id, min({us}) as first_us, max({us}) as last_us
            from events group by user_id
        ),
        horizon as (select max(last_us) as h from spans),
        lif as (
            select user_id,
                   (last_us - first_us) {'div' if d == SPARK else '//'} 3600000000
                       as dur_h,
                   (last_us < horizon.h - {h12}) as event
            from spans cross join horizon
        ),
        steps as (
            select dur_h,
                   cast(count(*) as bigint) as n_at,
                   cast(sum(case when event then 1 else 0 end) as bigint)
                       as d_events
            from lif group by dur_h
        ),
        risk as (
            select dur_h, d_events,
                   cast(sum(n_at) over (order by dur_h desc
                                        rows between unbounded preceding
                                        and current row) as bigint) as n_risk
            from steps
        ),
        km as (
            select dur_h, d_events, n_risk,
                   cast(sum(case when d_events > 0 then {term} else 0 end)
                        over (order by dur_h asc
                              rows between unbounded preceding and current row)
                        as bigint) as cum_ln_q9
            from risk
        )
        select cast(dur_h as bigint) as dur_h, d_events, n_risk,
               round(exp(cast(cum_ln_q9 as double) / 1.0e9), 9) as survival
        from km where d_events > 0"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_kaplan_meier_sql(SPARK))


def q_kaplan_meier_oracle() -> str:
    return _kaplan_meier_sql(DUCK)


QUERIES["kaplan_meier"] = (q_kaplan_meier, q_kaplan_meier_oracle)


def _gini_sql(d: str) -> str:
    """Gini coefficient + Lorenz curve of user activity concentration —
    'do 20% of users generate 80% of events?': exact closed form
    G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) over ranked activity counts
    — pure integer numerator/denominator (one ranked window), ONE division
    at the end; Lorenz points are exact integer cumulative shares.

    Scale: the ranked window runs over the USER table (dimension-sized),
    corpus touched once for the counts."""
    return """
        with act as (
            select user_id, cast(count(*) as bigint) as x
            from events group by user_id
        ),
        ranked as (
            select x,
                   cast(row_number() over (order by x asc, user_id asc)
                        as bigint) as i,
                   cast(count(*) over () as bigint) as n,
                   cast(sum(x) over () as bigint) as sx,
                   cast(sum(x) over (order by x asc, user_id asc
                                     rows between unbounded preceding
                                     and current row) as bigint) as cumx
            from act
        )
        select i as rank, x as n_events,
               cast(cumx as bigint) as cum_events,
               round(cast(cumx as double) / cast(sx as double), 9)
                   as lorenz_share,
               round(cast(2 * sum(i * x) over () - (max(n) over () + 1)
                          * max(sx) over () as double)
                     / cast(max(n) over () * max(sx) over () as double), 9)
                   as gini
        from ranked"""


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_gini_sql(SPARK))


def q_gini_oracle() -> str:
    return _gini_sql(DUCK)


QUERIES["gini"] = (q_gini, q_gini_oracle)


_BOOT_B = 20


def _poisson_bootstrap_sql(d: str, n_reps: int = _BOOT_B) -> str:
    """Poisson bootstrap of the mean event value per type — THE resampling
    technique that works on data too large to index (each row draws an
    independent Poisson(1) replicate weight instead of multinomial counts;
    Chamandy et al. 2012): B replicate means from ONE scan, no row ids, no
    global state.  Weights come from the portable hash via the inverse
    Poisson(1) CDF as a CASE ladder (deterministic ⇒ value-hash-gateable);
    replicate means are exact integer ratios quantized at the end; the
    summary row per type reports the replicate spread (min/max/mean of
    means) — the CI ingredients.

    Scale: one scan × B-way explode (B constant), one (type, rep)
    map-side-combined aggregate, one tiny summary agg."""
    # cumulative Poisson(1): P(0)=.3679 P(<=1)=.7358 P(<=2)=.9197 P(<=3)=.9810
    # P(<=4)=.9963 P(<=5)=.9994  (1e9-scaled integer thresholds on the hash)
    u = phash60(concat_str(["'boot:'", "cast(event_id as string)", "':'",
                            "cast(rep as string)"], d), d)
    reps = (
        f"explode(sequence(0, {n_reps - 1}))" if d == SPARK
        else f"unnest(generate_series(0, {n_reps - 1}))"
    )
    w = f"""(case
        when u < 424136118829305344 then 0
        when u < 848272237658610688 then 1
        when u < 1060340297073263360 then 2
        when u < 1131029650211480960 then 3
        when u < 1148701988496035328 then 4
        else 5 end)"""
    mean_q = (
        "cast(floor(cast(sxw as double) / cast(sw as double) + 0.5e0) as bigint)"
    )
    return f"""
        with q as (
            select event_type, event_id,
                   cast(floor(value * 1.0e6 + 0.5e0) as bigint) as xq
            from events
        ),
        r as (select q.*, {reps} as rep from q),
        wtd as (
            select event_type, rep, xq, ({u}) as u from r
        ),
        reps as (
            select event_type, rep,
                   cast(sum({w} * xq) as bigint) as sxw,
                   cast(sum({w}) as bigint) as sw
            from wtd group by event_type, rep
        ),
        means as (
            select event_type, rep, {mean_q} as mean_q6
            from reps where sw > 0
        )
        select event_type,
               cast(count(*) as bigint) as n_reps,
               cast(min(mean_q6) as bigint) as boot_min_q6,
               cast(max(mean_q6) as bigint) as boot_max_q6,
               cast(floor(avg(cast(mean_q6 as double)) + 0.5e0) as bigint)
                   as boot_mean_q6
        from means group by event_type"""


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_poisson_bootstrap_sql(SPARK))


def q_poisson_bootstrap_oracle() -> str:
    return _poisson_bootstrap_sql(DUCK)


QUERIES["poisson_bootstrap"] = (q_poisson_bootstrap, q_poisson_bootstrap_oracle)


_STAT_ROUNDS = 4


def _stationary_sql(d: str, n_rounds: int = _STAT_ROUNDS) -> str:
    """Stationary distribution of the event-type Markov chain: π·Pⁿ from a
    uniform start over the gated transition counts — 'where does the user
    journey settle'.  The chain is DIMENSION-sized (types × types), so the
    power iteration unrolls as chained CTEs over tiny tables; each round's
    π entries quantize to bigint 1e-9 BEFORE the per-column sum (the
    pagerank state discipline), so the result is bit-exact at any
    partitioning.  Rows with no outgoing transition cannot occur (every
    prev_type has successors by construction of the bigram set).

    Scale: the corpus is touched ONCE (the bigram count); all rounds run
    over the |types|² matrix."""
    term = (
        "cast(floor(cast(p.pi_q as double) / 1.0e9"
        " * (cast(t.n as double) / cast(r.tot as double))"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    ctes = [
        f"t as ({_transitions_sql(d)})",
        "types as (select prev_type as et from t union"
        " select next_type as et from t)",
        "nt as (select count(*) as k from types)",
        "r as (select prev_type, cast(sum(n) as bigint) as tot"
        " from t group by prev_type)",
        # uniform start, integer split of 1e9 (remainder to the first type)
        """p0 as (
            select et,
                   cast(1000000000 {idiv} k
                        + case when rn = 1 then 1000000000 % k else 0 end
                        as bigint) as pi_q
            from (select et, row_number() over (order by et) as rn
                  from types) x cross join nt
        )""".format(idiv="div" if d == SPARK else "//"),
    ]
    for i in range(n_rounds):
        ctes.append(f"""p{i + 1} as (
            select t.next_type as et, cast(sum({term.replace('p.', f'p{i}.')})
                as bigint) as pi_q
            from t
            join p{i} on p{i}.et = t.prev_type
            join r on r.prev_type = t.prev_type
            group by t.next_type
        )""")
    return (
        "with " + ", ".join(ctes)
        + f" select et as event_type, pi_q as stationary_q9 from p{n_rounds}"
    )


def q_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_stationary_sql(SPARK))


def q_stationary_oracle() -> str:
    return _stationary_sql(DUCK)


QUERIES["stationary"] = (q_stationary, q_stationary_oracle)


def _seasonal_sql(d: str) -> str:
    """Seasonal decomposition (STL-lite) of the event stream: per
    (event_type, hour-of-day) the seasonal index — hourly activity rate
    over the type's overall rate — plus the residual dispersion after
    removing the seasonal component.  The demand-curve shape forecasting
    starts from.  Integer counts; indices and residuals quantized fixed
    float sequences (per-bucket, never folded as floats).

    Scale: two map-side-combined aggregates over (type, hod) and (type) —
    dimension-sized outputs, corpus scanned once."""
    hod = (
        "cast(date_format(ts, 'H') as int)" if d == SPARK
        else "cast(date_part('hour', ts) as int)"
    )
    day = "cast(date_trunc('day', ts) as date)"
    idx = (
        "cast(floor(cast(h.n as double) / cast(h.n_days as double)"
        " / (cast(t.n as double) / cast(t.n_slots as double))"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    return f"""
        with e as (
            select event_type, {hod} as hod, {day} as day from events
        ),
        h as (
            select event_type, hod,
                   cast(count(*) as bigint) as n,
                   cast(count(distinct day) as bigint) as n_days
            from e group by event_type, hod
        ),
        t as (
            select event_type,
                   cast(count(*) as bigint) as n,
                   cast(count(distinct day) as bigint) * 24 as n_slots
            from e group by event_type
        )
        select h.event_type, h.hod, h.n as n_events,
               {idx} as seasonal_idx_q9
        from h join t on t.event_type = h.event_type"""


def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_seasonal_sql(SPARK))


def q_seasonal_oracle() -> str:
    return _seasonal_sql(DUCK)


QUERIES["seasonal"] = (q_seasonal, q_seasonal_oracle)


def _peaks_sql(d: str) -> str:
    """Peak detection on the hourly event-count series per type: strict
    local maxima (greater than BOTH neighbors) whose height clears the
    type's p90 hourly count — the alerting primitive behind 'demand
    spiked'.  Integer counts; the p90 gate uses the exact interpolated
    percentile re-quantized half-up (the robust_anomaly discipline); the
    neighbor test is one lag/lead window over the per-type hour series.

    Scale: the hourly table is (type × active hours) — dimension-sized;
    one window + one percentile over it."""
    us = (
        "cast(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) as bigint)"
        if d == SPARK
        else "cast(epoch_us(ts) as bigint)"
    )
    idiv = "div" if d == SPARK else "//"
    pct = (
        "percentile(n, 0.9e0)" if d == SPARK else "quantile_cont(n, 0.9e0)"
    )
    return f"""
        with h as (
            select event_type, ({us}) {idiv} 3600000000 as hour,
                   cast(count(*) as bigint) as n
            from events group by 1, 2
        ),
        gate as (
            select event_type,
                   cast(floor({pct} + 0.5e0) as bigint) as p90q
            from h group by event_type
        ),
        w as (
            select event_type, hour, n,
                   lag(n) over win as prev_n,
                   lead(n) over win as next_n
            from h
            window win as (partition by event_type order by hour asc)
        )
        select w.event_type, cast(w.hour as bigint) as hour, w.n,
               g.p90q
        from w join gate g on g.event_type = w.event_type
        where w.prev_n is not null and w.next_n is not null
          and w.n > w.prev_n and w.n > w.next_n
          and w.n >= g.p90q"""


def q_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_peaks_sql(SPARK))


def q_peaks_oracle() -> str:
    return _peaks_sql(DUCK)


QUERIES["peaks"] = (q_peaks, q_peaks_oracle)


def _cell_entropy_sql(d: str, res: int = 11) -> str:
    """Spatial diversity index: per res-11 cell the Shannon entropy of its
    event-type mix (and the effective number of types e^H) — the
    segregation/mixing metric urban analytics reads off a map (H = 0:
    single-use cell; ln k: perfectly mixed).  Cells from the same
    deterministic user-home mapping as decayed_density; entropy terms
    −(n_i/n)·ln(n_i/n) quantized to bigint 1e-9 PER TYPE before the fold
    (order-free), e^H one final exp.

    Scale: one corpus scan → (cell, type) counts with map-side combine →
    cell-keyed fold; outputs are cell-table-sized."""
    la = _pr(["'pt:lat:'", "user_id"], d)
    lo = _pr(["'pt:lon:'", "user_id"], d)
    lat = f"({flit(LAT_LO)} + {la} * {flit(DLAT)})"
    lon = f"({flit(LON_LO)} + {lo} * {flit(DLON)})"
    cell = geo.quad_cell(lat, lon, res, d)
    hterm = (
        "cast(floor(-(cast(c as double) / cast(tot as double))"
        " * ln(cast(c as double) / cast(tot as double))"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    return f"""
        with e as (
            select {cell} as cell, event_type from events
        ),
        ct as (
            select cell, event_type, cast(count(*) as bigint) as c
            from e group by cell, event_type
        ),
        tc as (
            select cell, cast(sum(c) as bigint) as tot,
                   cast(count(*) as bigint) as k
            from ct group by cell
        ),
        h as (
            select ct.cell,
                   cast(sum(case when ct.c = tc.tot then 0
                            else {hterm} end) as bigint) as h_q9,
                   max(tc.tot) as n_events, max(tc.k) as n_types
            from ct join tc on tc.cell = ct.cell
            group by ct.cell
        )
        select cell, n_events, n_types, h_q9,
               round(exp(cast(h_q9 as double) / 1.0e9), 9) as effective_types
        from h"""


def q_cell_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_cell_entropy_sql(SPARK))


def q_cell_entropy_oracle() -> str:
    return _cell_entropy_sql(DUCK)


QUERIES["cell_entropy"] = (q_cell_entropy, q_cell_entropy_oracle)


def _skew_report_sql(d: str, res: int = 8) -> str:
    """Join-key skew diagnostics for the spatial partitioning: per res-8
    cell load (points per cell), the shares of the heaviest and top-10
    cells, and the Gini of cell loads — the report that tells an operator
    whether a key needs salting/AQE BEFORE the job falls over (the
    observability face of operators/skew.py).  Exact integer closed-form
    Gini (the gini query's formula) over the cell-load dimension table.

    Scale: one scan → cell counts (map-side combine); every statistic runs
    over the cell table, never the corpus."""
    cell = geo.quad_cell("lat", "lon", res, d)
    return f"""
        with c as (
            select {cell} as cell, cast(count(*) as bigint) as n
            from geo_points group by 1
        ),
        ranked as (
            select n,
                   cast(row_number() over (order by n asc, cell asc) as bigint) as i,
                   cast(row_number() over (order by n desc, cell asc) as bigint) as ri,
                   cast(count(*) over () as bigint) as k,
                   cast(sum(n) over () as bigint) as tot
            from c
        )
        select max(k) as n_cells,
               max(tot) as n_points,
               cast(max(case when ri = 1 then n end) as bigint) as max_cell_load,
               round(cast(max(case when ri = 1 then n end) as double)
                     / cast(max(tot) as double), 9) as top1_share,
               round(cast(sum(case when ri <= 10 then n else 0 end) as double)
                     / cast(max(tot) as double), 9) as top10_share,
               round(cast(2 * sum(i * n) - (max(k) + 1) * max(tot) as double)
                     / cast(max(k) * max(tot) as double), 9) as load_gini
        from ranked"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_skew_report_sql(SPARK))


def q_skew_report_oracle() -> str:
    return f"{duck_geometry_ctes()}, __sk as ({_skew_report_sql(DUCK)}) select * from __sk"


QUERIES["skew_report"] = (q_skew_report, q_skew_report_oracle)


def _lsh_band_stats_sql(d: str, threshold: float = 0.4) -> str:
    """LSH banding diagnostics — the tuning report the recall/precision
    evals stand on: candidate pairs emitted by the 4×4 banding, how many
    survive the exact Jaccard threshold (banding PRECISION — wasted verify
    work when low), and bucket occupancy (n_buckets, max bucket —
    quadratic blow-up risk when a bucket degenerates).  Same shingle/
    signature expressions as the gated minhash machinery, so the numbers
    describe the production operator, not a toy replica.

    Scale: the band self-join carries ONLY (doc_id, band, bucket) — never
    the shingle arrays — and dedups candidate pairs on ids alone; the
    arrays re-join from `base` on the (small) surviving pair set, the same
    candidate-shuffle discipline as the production operator
    (operators/dedup.py minhash_lsh_pairs)."""
    bh = tx.shingle_base_hashes("text", 3, d)
    sig = tx.minhash_from_base("mh_base", 16, d)
    if d == SPARK:
        dist = "array_distinct(mh_base)"
        bandex = (
            "explode(transform(sequence(0, 3), b -> named_struct('band', b,"
            " 'bucket', md5(concat_ws(',', slice(sig, b * 4 + 1, 4))))))"
        )
        band_src = "select doc_id, bb.band as band, bb.bucket as bucket from (select doc_id, {ex} as bb from base) e".format(ex=bandex)
        inter = "size(array_intersect(sh_a, sh_b))"
        sz = lambda x: f"size({x})"  # noqa: E731
    else:
        dist = "list_distinct(mh_base)"
        band_src = (
            "select doc_id, b as band,"
            " md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), ','))"
            " as bucket from base, unnest(generate_series(0, 3)) t(b)"
        )
        inter = "len(list_intersect(sh_a, sh_b))"
        sz = lambda x: f"len({x})"  # noqa: E731
    jac = (
        f"(cast({inter} as double) /"
        f" cast({sz('sh_a')} + {sz('sh_b')} - {inter} as double))"
    )
    return f"""
        with staged as (
            select doc_id, {bh} as mh_base from documents
        ),
        base as (
            select doc_id, {sig} as sig, {dist} as shingles from staged
        ),
        banded as ({band_src}),
        buckets as (
            select band, bucket, cast(count(*) as bigint) as bsz
            from banded group by band, bucket
        ),
        cand as (
            select distinct a.doc_id as doc_a, b.doc_id as doc_b
            from banded a join banded b
              on a.band = b.band and a.bucket = b.bucket
             and a.doc_id < b.doc_id
        ),
        pairs as (
            select x.shingles as sh_a, y.shingles as sh_b
            from cand c
            join base x on x.doc_id = c.doc_a
            join base y on y.doc_id = c.doc_b
        ),
        scored as (
            select case when round({jac}, 6) >= {threshold!r}e0
                        then 1 else 0 end as hit
            from pairs
        ),
        cstats as (
            select cast(count(*) as bigint) as n_candidates,
                   cast(coalesce(sum(hit), 0) as bigint) as n_verified
            from scored
        ),
        bstats as (
            select cast(count(*) as bigint) as n_buckets,
                   cast(max(bsz) as bigint) as max_bucket
            from buckets
        )
        select c.n_candidates, c.n_verified,
               case when c.n_candidates = 0 then 0.0e0
                    else round(cast(c.n_verified as double)
                               / cast(c.n_candidates as double), 9)
               end as banding_precision,
               b.n_buckets, b.max_bucket
        from cstats c cross join bstats b"""


def q_lsh_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame path (operators.dedup.lsh_band_stats): the persisted base
    keeps the shingle pipeline single-pass — the pure-SQL form is kept only
    as the DuckDB oracle (CollapseProject would re-inline it per
    permutation on the Spark side: 141 s vs 7 s at sf0.1)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.lsh_band_stats(docs, jaccard_threshold=0.4)


def q_lsh_band_stats_oracle() -> str:
    return _lsh_band_stats_sql(DUCK)


QUERIES["lsh_band_stats"] = (q_lsh_band_stats, q_lsh_band_stats_oracle)


def _ks_drift_sql(d: str) -> str:
    """Two-sample Kolmogorov–Smirnov drift per source: D = max |ECDF_source
    − ECDF_corpus| over the n_chars distribution — the distribution-shift
    detector that catches what mean/variance drift misses (token_drift's
    χ² sibling for CONTINUOUS features).  Exact: ECDFs are integer
    cumulative counts over the distinct-value grid (per-source cum carried
    forward with max() over an ordered frame — counts are monotone), D one
    quantized max of integer-ratio differences.

    Scale: the grid is sources × distinct values (dimension-sized); the
    corpus is scanned once for the counts."""
    return """
        with q as (
            select source, cast(n_chars as bigint) as v from documents
        ),
        vals as (
            select v, cast(count(*) as bigint) as c from q group by v
        ),
        gcum as (
            select v, cast(sum(c) over (order by v asc
                                        rows between unbounded preceding
                                        and current row) as bigint) as g,
                   cast(sum(c) over () as bigint) as n
            from vals
        ),
        s as (
            select source, v, cast(count(*) as bigint) as c
            from q group by source, v
        ),
        ns as (select source, cast(sum(c) as bigint) as n_s from s group by source),
        grid as (
            select ns.source, gcum.v, gcum.g, gcum.n, ns.n_s,
                   cast(coalesce(max(sc.scum) over (
                       partition by ns.source order by gcum.v asc
                       rows between unbounded preceding and current row), 0)
                       as bigint) as s_cum
            from gcum
            cross join ns
            left join (
                select source, v,
                       cast(sum(c) over (partition by source order by v asc
                                         rows between unbounded preceding
                                         and current row) as bigint) as scum
                from s
            ) sc on sc.source = ns.source and sc.v = gcum.v
        )
        select source,
               max(n_s) as n_source,
               max(n) as n_corpus,
               max(cast(floor(abs(cast(s_cum as double) / cast(n_s as double)
                        - cast(g as double) / cast(n as double))
                        * 1000000000.0e0 + 0.5e0) as bigint)) as ks_d_q9
        from grid group by source"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_ks_drift_sql(SPARK))


def q_ks_drift_oracle() -> str:
    return _ks_drift_sql(DUCK)


QUERIES["ks_drift"] = (q_ks_drift, q_ks_drift_oracle)


def _cramers_v_sql(d: str) -> str:
    """Cramér's V association between event type and user cohort (user_id
    hash-split into 4 segments): the normalized χ² that answers 'are these
    two categoricals related, and how strongly' on a 0–1 scale — the
    feature-selection screen for categorical pairs.  χ² terms quantized to
    bigint 1e-6 per contingency cell BEFORE the fold (token_drift's
    discipline); V = sqrt(χ²/(n·min(r−1, c−1))) one fixed float sequence.

    Scale: one scan → contingency counts (map-side combine); everything
    after runs on the r×c table."""
    seg_key = concat_str(["'seg:'", "cast(user_id as string)"], d)
    seg = f"({phash60(seg_key, d)}) % 4"
    chi_term = (
        "cast(floor((cast(o as double) - e) * (cast(o as double) - e)"
        " / e * 1.0e6 + 0.5e0) as bigint)"
    )
    return f"""
        with q as (
            select event_type, {seg} as seg from events
        ),
        cell as (
            select event_type, seg, cast(count(*) as bigint) as o
            from q group by event_type, seg
        ),
        rm as (select event_type, cast(sum(o) as bigint) as r from cell group by event_type),
        cm as (select seg, cast(sum(o) as bigint) as c from cell group by seg),
        n as (select cast(sum(o) as bigint) as n,
                     cast(count(distinct event_type) as bigint) as nr,
                     cast(count(distinct seg) as bigint) as nc
              from cell),
        grid as (
            select rm.event_type, cm.seg,
                   coalesce(cell.o, 0) as o,
                   cast(rm.r as double) * cast(cm.c as double)
                       / cast(n.n as double) as e
            from rm cross join cm cross join n
            left join cell on cell.event_type = rm.event_type
                          and cell.seg = cm.seg
        ),
        chi as (
            select cast(sum({chi_term}) as bigint) as chi2_q6 from grid
        )
        select n.nr as n_rows_cat, n.nc as n_cols_cat, n.n as n_obs,
               chi.chi2_q6,
               round(sqrt(cast(chi.chi2_q6 as double) / 1.0e6
                     / (cast(n.n as double)
                        * cast(least(n.nr - 1, n.nc - 1) as double))), 9)
                   as cramers_v
        from chi cross join n"""


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_cramers_v_sql(SPARK))


def q_cramers_v_oracle() -> str:
    return _cramers_v_sql(DUCK)


QUERIES["cramers_v"] = (q_cramers_v, q_cramers_v_oracle)


def _term_mi_sql(d: str, top_v: int = 30, top_k: int = 20) -> str:
    """Mutual information between term PRESENCE and document source, for
    the top-V vocabulary — the classic text-classification feature-
    relevance ranking (which words identify a source).  The 2×|sources|
    presence/absence contingency per term is exact integer counts; each
    MI cell term p·ln(p/(px·py)) is quantized to bigint 1e-9 BEFORE the
    per-term fold; the global top-k is a deterministic (mi desc, term asc)
    cut.

    Scale: one distinct (doc, term) scan for the vocabulary and the
    presence counts; the MI grid is top_v × sources × 2 — dimension-sized."""
    toks = tx.tokens("text", d)
    ex = (
        f"select doc_id, source, explode(array_distinct({toks})) as w from documents"
        if d == SPARK
        else f"select doc_id, source, unnest(list_distinct({toks})) as w from documents"
    )
    mi_term = (
        "cast(floor(cast(o as double) / cast(nd as double)"
        " * ln(cast(o as double) * cast(nd as double)"
        "      / (cast(rx as double) * cast(cy as double)))"
        " * 1.0e9 + 0.5e0) as bigint)"
    )
    return f"""
        with pres as (select distinct doc_id, source, w from ({ex}) e),
        freq as (select w, cast(count(*) as bigint) as dfr from pres group by w),
        vocab as (
            select w, dfr from (
                select w, dfr, row_number() over (order by dfr desc, w asc) as rn
                from freq
            ) t where rn <= {int(top_v)}
        ),
        nd as (select cast(count(distinct doc_id) as bigint) as nd from documents),
        srcs as (select source, cast(count(*) as bigint) as ns
                 from documents group by source),
        hit as (
            select p.w, p.source, cast(count(*) as bigint) as o
            from pres p join vocab on vocab.w = p.w
            group by p.w, p.source
        ),
        grid as (
            select vocab.w, srcs.source,
                   coalesce(hit.o, 0) as o_present,
                   srcs.ns - coalesce(hit.o, 0) as o_absent,
                   vocab.dfr as rx_present, srcs.ns as cy, nd.nd as nd
            from vocab cross join srcs cross join nd
            left join hit on hit.w = vocab.w and hit.source = srcs.source
        ),
        cells as (
            select w, source, o_present as o, rx_present as rx, cy, nd from grid
            union all
            select w, source, o_absent as o, nd - rx_present as rx, cy, nd from grid
        ),
        mi as (
            select w, cast(sum(case when o = 0 then 0 else {mi_term} end)
                           as bigint) as mi_q9
            from cells group by w
        )
        select w as term, mi_q9 from (
            select w, mi_q9,
                   row_number() over (order by mi_q9 desc, w asc) as rn
            from mi
        ) t where rn <= {int(top_k)}"""


def q_term_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geometry_views(spark, sf_dir)
    return spark.sql(_term_mi_sql(SPARK))


def q_term_mi_oracle() -> str:
    return _term_mi_sql(DUCK)


QUERIES["term_mi"] = (q_term_mi, q_term_mi_oracle)


def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster cohesion (n, Σd², mean squared distance to the final
    centroid) — exact clustering-quality report
    (clustering.cluster_cohesion)."""
    from ..operators import clustering

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return clustering.cluster_cohesion(emb, k=8, iters=3)


def q_cluster_cohesion_oracle() -> str:
    from ..operators import clustering

    return clustering.cluster_cohesion_oracle_sql(k=8, iters=3, dim=64)


QUERIES["cluster_cohesion"] = (q_cluster_cohesion, q_cluster_cohesion_oracle)


def q_linear_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear referencing: snap + integer-mm chainage along the polyline
    (prefix cumsum of segment lengths + round(t·seg_len), the NeTEx
    LinkSequence primitive — distjoin.linear_reference)."""
    from ..operators import distjoin

    register_geometry_views(spark, sf_dir)
    return distjoin.linear_reference(
        spark.table("geo_points"), spark.table("geo_polys"),
        radius_m=2000.0, res=14,
    )


def q_linear_ref_oracle() -> str:
    from ..operators import distjoin
    from ..functions.portable import haversine_m as _hv

    dist = distjoin.seg_dist_m("p.lat", "p.lon", "s.say", "s.sax", "s.sby", "s.sbx", DUCK)
    t = distjoin.seg_t_expr("p2.lat", "p2.lon", "st.say", "st.sax", "st.sby", "st.sbx", DUCK)
    seg_len = f"cast(round(({_hv('say', 'sax', 'sby', 'sbx', DUCK)}) * 1000.0e0) as bigint)"
    return f"""{duck_geometry_ctes()},
        segs as (
            select zone_id, t.i as seg_idx,
                   pos_list[2*t.i - 1] as say, pos_list[2*t.i] as sax,
                   pos_list[2*t.i + 1] as sby, pos_list[2*t.i + 2] as sbx
            from geo_polys, unnest(generate_series(1, len(pos_list) // 2 - 1)) t(i)
        ),
        seg_tab as (
            select zone_id, seg_idx, say, sax, sby, sbx,
                   {seg_len} as seg_len_mm,
                   coalesce(sum({seg_len}) over (
                       partition by zone_id order by seg_idx
                       rows between unbounded preceding and 1 preceding), 0)
                       as prefix_mm
            from segs
        ),
        cand as (
            select p.point_id, s.zone_id, s.seg_idx, {dist} as d
            from geo_points p cross join segs s
        ),
        snapped as (
            select point_id, zone_id, seg_idx, round(d, 6) as dist_m
            from (select *, row_number() over (partition by point_id
                      order by d, zone_id, seg_idx) as rn
                  from cand where d <= 2000.0e0)
            where rn = 1
        )
        select sn.point_id as point_id, sn.zone_id as zone_id,
               sn.seg_idx as seg_idx, sn.dist_m as dist_m,
               cast(st.prefix_mm + cast(round(({t}) * cast(st.seg_len_mm as double))
                   as bigint) as bigint) as chainage_mm
        from snapped sn
        join seg_tab st on sn.zone_id = st.zone_id and sn.seg_idx = st.seg_idx
        join geo_points p2 on sn.point_id = p2.point_id
    """


QUERIES["linear_ref"] = (q_linear_ref, q_linear_ref_oracle)


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope/intercept of the corpus term distribution, integer-exact
    OLS in log-log space (textstats.zipf_fit)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from ..operators import textstats

    return textstats.zipf_fit(docs, top_n=200)


def q_zipf_fit_oracle() -> str:
    from ..operators import textstats

    return textstats.zipf_fit_sql(DUCK, top_n=200)


QUERIES["zipf_fit"] = (q_zipf_fit, q_zipf_fit_oracle)


# ---------------------------------------------------------------------------
# round-3 additions: graph structure, association mining, changepoints,
# contrastive mining, privacy audit
# ---------------------------------------------------------------------------
def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (4 peel rounds, k=2) over the deterministic link
    graph — the density filter community/graph-ML pipelines run before
    expensive per-node work (operators.graph.k_core)."""
    from ..operators import graph

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.k_core(spark, docs, k=2, n_rounds=4)


def q_k_core_oracle() -> str:
    from ..operators import graph

    return graph.k_core_oracle_sql("documents", k=2, n_rounds=4)


QUERIES["k_core"] = (q_k_core, q_k_core_oracle)


def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities, 3 rounds, deterministic
    count-desc/label-asc vote (operators.graph.label_propagation)."""
    from ..operators import graph

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return graph.label_propagation(spark, docs, n_rounds=3)


def q_label_prop_oracle() -> str:
    from ..operators import graph

    return graph.label_propagation_oracle_sql("documents", n_rounds=3)


QUERIES["label_prop"] = (q_label_prop, q_label_prop_oracle)


def q_pmi_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI word-association mining over the top-40 vocabulary
    (operators.textstats.pmi_cooc_sql)."""
    from ..operators import textstats

    register_geometry_views(spark, sf_dir)
    return spark.sql(textstats.pmi_cooc_sql(SPARK))


def q_pmi_cooc_oracle() -> str:
    from ..operators import textstats

    return textstats.pmi_cooc_sql(DUCK)


QUERIES["pmi_cooc"] = (q_pmi_cooc, q_pmi_cooc_oracle)


def q_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-style clipped bigram precision between consecutive documents
    (operators.textstats.ngram_overlap_sql)."""
    from ..operators import textstats

    register_geometry_views(spark, sf_dir)
    return spark.sql(textstats.ngram_overlap_sql(SPARK))


def q_ngram_overlap_oracle() -> str:
    from ..operators import textstats

    return textstats.ngram_overlap_sql(DUCK)


QUERIES["ngram_overlap"] = (q_ngram_overlap, q_ngram_overlap_oracle)


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-sided CUSUM changepoint detector over the event stream,
    closed-form window formulation (operators.temporal.cusum_sql)."""
    from ..operators import temporal

    register_geometry_views(spark, sf_dir)
    return temporal.cusum(spark)


def q_cusum_oracle() -> str:
    from ..operators import temporal

    return temporal.cusum_sql(DUCK)


QUERIES["cusum"] = (q_cusum, q_cusum_oracle)


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per query vector, top-5 most
    similar corpus vectors with a different label
    (operators.similarity.hard_negatives)."""
    from ..operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id % 50 = 0")
    return similarity.hard_negatives(queries, emb, k=5)


def q_hard_negatives_oracle() -> str:
    cos = dedup.cosine_expr("q.embedding", "c.embedding", DUCK)
    return f"""
        with scored as (
            select q.vec_id as query_id, c.vec_id as vec_id,
                   round({cos}, 6) as cos
            from embeddings q cross join embeddings c
            where q.vec_id % 50 = 0 and c.label <> q.label
        ),
        ranked as (
            select query_id, vec_id, cos,
                   row_number() over (
                       partition by query_id order by cos desc, vec_id asc
                   ) as rn
            from scored
        )
        select query_id, vec_id, cos, rn from ranked where rn <= 5"""


QUERIES["hard_negatives"] = (q_hard_negatives, q_hard_negatives_oracle)


def q_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-generalization k-anonymity audit over the customer
    quasi-identifiers (operators.curation.kanon_ladder_sql)."""
    from ..operators import curation

    register_geometry_views(spark, sf_dir)
    return curation.kanon_ladder(spark, k=5)


def q_kanon_oracle() -> str:
    from ..operators import curation

    return curation.kanon_ladder_sql(DUCK, k=5)


QUERIES["kanon"] = (q_kanon, q_kanon_oracle)


def q_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup dedup: one survivor per LSH component, the
    highest-quality copy (operators.dedup.keep_best_dedup)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.keep_best_dedup(docs, n_perm=16, bands=4, jaccard_threshold=0.4)
    dedup.unpersist_intermediates(out)
    return out


def q_keep_best_oracle() -> str:
    from ..operators.textstats import quality_score_expr

    pairs_sql = q_minhash_pairs_oracle()
    qexpr = quality_score_expr("text", DUCK)
    return f"""
        with recursive pairs as (select doc_a, doc_b from ({pairs_sql}) tp),
        edges as (
            select doc_a as a, doc_b as b from pairs
            union
            select doc_b as a, doc_a as b from pairs
        ),
        reach(v, l) as (
            select a, a from edges
            union
            select e.a, r.l from edges e join reach r on r.v = e.b
        ),
        comp as (select v as doc_id, min(l) as component from reach group by v),
        q as (
            select doc_id,
                   cast(floor(({qexpr}) * 1.0e6 + 0.5e0) as bigint) as quality_q6
            from documents
        ),
        lab as (
            select q.doc_id,
                   cast(coalesce(c.component, q.doc_id) as bigint) as grp,
                   q.quality_q6
            from q left join comp c on c.doc_id = q.doc_id
        )
        select doc_id, grp, quality_q6,
               (row_number() over (
                   partition by grp order by quality_q6 desc, doc_id asc
               ) = 1) as kept
        from lab"""


QUERIES["keep_best"] = (q_keep_best, q_keep_best_oracle)


# round-4 additions live in their own module (this file is large enough)
from .queries_r4 import register_r4  # noqa: E402
from .queries_r5 import register_r5  # noqa: E402
from .queries_r5b import register_r5b  # noqa: E402
from .queries_r5c import register_r5c  # noqa: E402
from .queries_r5d import register_r5d  # noqa: E402
from .queries_r5e import register_r5e  # noqa: E402
from .queries_r5f import register_r5f  # noqa: E402
from .queries_r5g import register_r5g  # noqa: E402
from .queries_r5h import register_r5h  # noqa: E402
from .queries_r5i import register_r5i  # noqa: E402
from .queries_r5j import register_r5j  # noqa: E402
from .queries_r5k import register_r5k  # noqa: E402
from .queries_r5l import register_r5l  # noqa: E402
from .queries_r5m import register_r5m  # noqa: E402
from .queries_r5n import register_r5n  # noqa: E402
from .queries_r5o import register_r5o  # noqa: E402
from .queries_r5p import register_r5p  # noqa: E402
from .queries_r5q import register_r5q  # noqa: E402
from .queries_r5r import register_r5r  # noqa: E402
from .queries_r5s import register_r5s  # noqa: E402
from .queries_r5t import register_r5t  # noqa: E402
from .queries_r5u import register_r5u  # noqa: E402
from .queries_r5v import register_r5v  # noqa: E402

register_r4(QUERIES)
register_r5(QUERIES)
register_r5b(QUERIES)
register_r5c(QUERIES)
register_r5d(QUERIES)
register_r5e(QUERIES)
register_r5f(QUERIES)
register_r5g(QUERIES)
register_r5h(QUERIES)
register_r5i(QUERIES)
register_r5j(QUERIES)
register_r5k(QUERIES)
register_r5l(QUERIES)
register_r5m(QUERIES)
register_r5n(QUERIES)
register_r5o(QUERIES)
register_r5p(QUERIES)
register_r5q(QUERIES)
register_r5r(QUERIES)
register_r5s(QUERIES)
register_r5t(QUERIES)
register_r5u(QUERIES)
register_r5v(QUERIES)


# ---------------------------------------------------------------------------
# registry ordering: rotate the driver-checked window
# ---------------------------------------------------------------------------
# The correctness driver hash-gates the FIRST 50 registry entries in insertion
# order; round 2 left 103 queries with no driver-hard signal.  Round 3 keeps
# the conversion pipeline + flagship spatial operators in the top slots (the
# reference-parity anchors must stay under the gate every round) and fills the
# remaining ~38 with the back half of the registry — first the 14 oracles
# whose DuckDB integer sums formerly widened to HUGEINT (now cast to BIGINT;
# promoting them proves the fix under the driver's dtype-sensitive hash), then
# the judge-named never-gated operators (map_match, semdedup, pq_adc, hull,
# dissolve, tpch_*, …).  Everything else follows in original insertion order
# and stays covered by tools/verify_oracle.py + pytest.
_DRIVER_WINDOW = [
    # anchors: flagship spatial + documents→NeTEx conversion pipeline
    # (the reference-parity rows stay under the gate every round)
    "tile_assign", "polyfill", "pip", "knn", "assemble_poslist",
    "zone_mapping", "convert_tariffzone", "convert_farezone",
    "convert_farezone_groups", "doc_tile_assign", "conversion_metrics",
    # round-5 rotation: 39 slots, all never driver-gated before (r01..r04
    # covered 127/238; VERDICT r4 task 1 leads with the 33 r4 operators —
    # none had a driver row — then training-pipeline staples, then two
    # streaming rows to re-gate arrival-order independence under the
    # dtype-faithful comparator (VERDICT r4 task 7).
    "spearman", "mannwhitney", "jsd_drift", "gearys_c", "link_predict",
    "media_context", "f_function", "clark_evans", "quadrat",
    "radius_gyration", "bearing_stats", "mmr_rerank", "pca_top",
    "feature_hash", "l_diversity", "edr_join", "centrography",
    "kruskal_wallis", "emerging_hotspots", "auc_roc",
    "isotonic_calibration", "item_cf", "tfidf_topk", "simhash_pairs",
    "rocchio_expand", "burstiness", "raster_slope", "zonal_majority",
    "tpch_q5", "l_moments", "vocab_richness",
    "dsir", "lm_score", "decontaminate", "redact_pii",
    "media_phash_pairs", "rrf_hybrid",
    "streaming_sessions", "streaming_dedup",
]


def _rotate_registry() -> None:
    missing = [k for k in _DRIVER_WINDOW if k not in QUERIES]
    assert not missing, f"_DRIVER_WINDOW names unknown queries: {missing}"
    rest = [k for k in QUERIES if k not in set(_DRIVER_WINDOW)]
    ordered = {k: QUERIES[k] for k in (*_DRIVER_WINDOW, *rest)}
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate_registry()
