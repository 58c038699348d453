"""Vector-tile cutting: clip zone polygons to quad-tile bboxes and quantize
to tile-local integer coordinates (Mapbox-Vector-Tile-style extent grid).

This is the map-serving half of the tiling story (the pyramid rollup is the
analytics half): every (zone, tile) pair from the polygon's quad cover gets
the zone ring CLIPPED to the tile rectangle (Sutherland–Hodgman against the
4 half-planes) and emitted as extent-grid integers — exactly what an MVT
encoder consumes.

Spark-first shape: the whole 4-stage clip is ONE expression built from
nested let_ bindings — each stage's ring is bound exactly once, so Catalyst
cannot re-inline stage N's tree into every element_at of stage N+1 (the
naive staged-columns form collapses into an expression tree that grows as
(edges)^stages and stalls Janino; measured here).  Each Sutherland–Hodgman
stage is ``flatten(transform(edges, …))``: per-edge emissions depend only on
that edge's two endpoints, so no typed fold is needed and both engines share
the expression text verbatim.  All float arithmetic is fixed-order (sub,
div, mul, add), so the DuckDB oracle reproduces the quantized integers
bit-exactly.

Reference parity note: the reference renders zones to NeTEx XML
(`OsmToNetexMapper.java`); tile cutting is an engine addition the north
rule's "raster/vector tile lookups" line implies for map overlays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import geo
from ..functions.portable import DUCK, SPARK, flit, let_


def _empty(d: str) -> str:
    return "cast(array() as array<double>)" if d == SPARK else "cast([] as double[])"


def _arr(vals: list[str], d: str) -> str:
    return f"array({', '.join(vals)})" if d == SPARK else f"[{', '.join(vals)}]"


def _clip_expr(ring: str, axis_lon: bool, bound: str, keep_ge: bool, d: str) -> str:
    """One Sutherland–Hodgman half-plane stage over a CLOSED flat ring
    [lat,lon,...]: per-edge emissions concatenated in traversal order, ring
    re-closed when non-degenerate (>= 3 distinct points), else empty.
    ``ring`` must be a cheap reference (a column or let_ binding) — it is
    textually repeated ~12x per edge."""
    el = (lambda idx: f"element_at({ring}, cast({idx} as int))") if d == SPARK \
        else (lambda idx: f"list_extract({ring}, cast({idx} as bigint))")
    ay, ax = el("2*i - 1"), el("2*i")
    by, bx = el("2*i + 1"), el("2*i + 2")
    va, vb = (ax, bx) if axis_lon else (ay, by)
    cmp_op = ">=" if keep_ge else "<="
    a_in = f"(({va}) {cmp_op} ({bound}))"
    b_in = f"(({vb}) {cmp_op} ({bound}))"
    t = f"((({bound}) - ({va})) / (({vb}) - ({va})))"
    iy = f"(({ay}) + (({by}) - ({ay})) * {t})"
    ix = f"(({ax}) + (({bx}) - ({ax})) * {t})"
    # the clipped-axis coordinate is EXACTLY the boundary
    ipt = [iy, f"({bound})"] if axis_lon else [f"({bound})", ix]
    emit = (
        f"case when {a_in} and {b_in} then {_arr([by, bx], d)} "
        f"when {a_in} and not {b_in} then {_arr(ipt, d)} "
        f"when (not {a_in}) and {b_in} then {_arr(ipt + [by, bx], d)} "
        f"else {_empty(d)} end"
    )
    # guard: an emptied ring must not reach element_at (ANSI Spark throws on
    # out-of-bounds); a valid closed input has >= 8 doubles
    if d == SPARK:
        n = f"(size({ring}) div 2)"
        body = f"flatten(transform(sequence(1, greatest({n} - 1, 1)), i -> {emit}))"
        clipped = (
            f"(transform(array({body}), __r -> case when size(__r) >= 6 "
            f"then concat(__r, slice(__r, 1, 2)) else {_empty(d)} end)[0])"
        )
        return f"(case when size({ring}) >= 8 then {clipped} else {_empty(d)} end)"
    n = f"(len({ring}) // 2)"
    body = (
        f"flatten(list_transform(generate_series(1, greatest({n} - 1, 1)), "
        f"i -> {emit}))"
    )
    clipped = (
        f"(list_transform([{body}], __r -> case when len(__r) >= 6 "
        f"then list_concat(__r, __r[1:2]) else {_empty(d)} end)[1])"
    )
    return f"(case when len({ring}) >= 8 then {clipped} else {_empty(d)} end)"


def clip_ring_to_tile_expr(d: str) -> str:
    """Full 4-half-plane clip of column ``pos_list`` against the tile
    rectangle given by columns (lon_lo, lon_hi, lat_lo, lat_hi) — one
    expression, each intermediate ring bound exactly once."""
    c4 = _clip_expr("__c3.r3", False, "lat_hi", False, d)
    c3 = _clip_expr("__c2.r2", False, "lat_lo", True, d)
    c2 = _clip_expr("__c1.r1", True, "lon_hi", False, d)
    c1 = _clip_expr("pos_list", True, "lon_lo", True, d)
    inner = let_({"r3": c3}, c4, d, var="__c3")
    mid = let_({"r2": c2}, inner, d, var="__c2")
    return let_({"r1": c1}, mid, d, var="__c1")


def tile_cut_sql(
    d: str,
    res: int = 7,
    extent: int = 256,
    cover_table: str = "__tc_cover",
) -> str:
    """(zone_id, cell, v_idx, qx, qy): zone rings clipped to every tile of
    their quad cover, quantized to the tile-local extent grid (qx east, qy
    north, 0..extent at the tile edges; round-half-away ties).

    ``cover_table`` must provide (zone_id, cell, pos_list) — the refined
    quad cover join output (tiling.cover_cells on the engine side; the
    inline cover expression in the oracle).  Degenerate clips (cover-cell
    false positives) vanish: their ring empties and the explode emits
    nothing."""
    n = 2**res
    latstep, lonstep = 180.0 / n, 360.0 / n
    ix, iy = geo.quad_unpack("cell", res, d)
    lon_lo = f"(cast({ix} as double) * {flit(lonstep)} - 180.0e0)"
    lon_hi = f"((cast({ix} as double) + 1.0e0) * {flit(lonstep)} - 180.0e0)"
    lat_lo = f"(cast({iy} as double) * {flit(latstep)} - 90.0e0)"
    lat_hi = f"((cast({iy} as double) + 1.0e0) * {flit(latstep)} - 90.0e0)"
    clip = clip_ring_to_tile_expr(d)
    qx = f"cast(round((lon_v - lon_lo) / {flit(lonstep)} * {extent}) as bigint)"
    qy = f"cast(round((lat_v - lat_lo) / {flit(latstep)} * {extent}) as bigint)"
    if d == SPARK:
        expl = "explode(sequence(1, size(r4) div 2)) as v"
        lat_v = "element_at(r4, cast(2*v - 1 as int))"
        lon_v = "element_at(r4, cast(2*v as int))"
        sz = "size"
    else:
        expl = "unnest(generate_series(1, len(r4) // 2)) as v"
        lat_v = "list_extract(r4, cast(2*v - 1 as bigint))"
        lon_v = "list_extract(r4, cast(2*v as bigint))"
        sz = "len"
    return f"""
        with bounds as (
            select zone_id, cell, pos_list,
                   {lon_lo} as lon_lo, {lon_hi} as lon_hi,
                   {lat_lo} as lat_lo, {lat_hi} as lat_hi
            from {cover_table}
        ),
        clipped as (
            select zone_id, cell, lon_lo, lat_lo, {clip} as r4 from bounds
        ),
        pts as (
            select zone_id, cell, lon_lo, lat_lo, r4, {expl}
            from clipped where {sz}(r4) >= 8
        )
        select zone_id, cell, cast(v as int) as v_idx,
               {qx} as qx, {qy} as qy
        from (select zone_id, cell, v, {lat_v} as lat_v, {lon_v} as lon_v,
                     lon_lo, lat_lo from pts)
    """


def duck_cover_cte(res: int = 7, polys_table: str = "geo_polys") -> str:
    """Oracle-side refined cover: (zone_id, cell, pos_list)."""
    return (
        f"select zone_id, unnest({geo.quad_cover_refined('pos_list', res, DUCK)}) "
        f"as cell, pos_list from {polys_table}"
    )


def tile_cut(polys: DataFrame, res: int = 7, extent: int = 256) -> DataFrame:
    """Engine entry: refined quad cover via the staged cover builder (the
    polyfill lesson — the inline cover expression pays its Catalyst/Janino
    fixed cost per plan), then the shared clip SQL."""
    from pyspark.sql import functions as F

    from . import tiling

    spark = polys.sparkSession
    cov = (
        tiling.cover_cells(polys, "zone_id", res, "quad", keep=("pos_list",))
        .where(F.expr(f"({geo.quad_cell_classify('cell', 'pos_list', res, SPARK)}) > 0"))
        .select("zone_id", "cell", "pos_list")
    )
    cov.createOrReplaceTempView("__tc_cover")
    return spark.sql(tile_cut_sql(SPARK, res=res, extent=extent, cover_table="__tc_cover"))
