"""Round-5 geospatial/graph batch (SURVEY §2.3 `(r5)` rows): hillshade,
D8 flow direction, flow accumulation, bounded-radius harmonic centrality,
and an exact exponential smoother.

Landing discipline as everywhere (LANDING.md): dual-dialect SQL (or a
Spark iterative operator whose algebra the DuckDB oracle replays as a
recursive/unrolled CTE), integer-quantized folds, trig-free cross-engine
math (illumination constants are Python-computed literals; the only SQL
transcendental is sqrt, which IEEE 754 rounds correctly in both
engines), scalar output columns, identical aliases both dialects.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK
from .queries_r4 import _raster_cte

_RES = 12
_M_PER_DEG = 111194.92664455873


def _cell_sizes() -> tuple[float, float]:
    from . import queries as q

    n = 2**_RES
    cell_y_m = 180.0 / n * _M_PER_DEG
    cell_x_m = 360.0 / n * _M_PER_DEG * q.COSLAT0
    return cell_x_m, cell_y_m


def _views(spark: SparkSession, sf_dir: str) -> None:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)


# ---------------------------------------------------------------------------
# Hillshade (Horn 1981 gradient + trig-free Lambertian illumination)
# ---------------------------------------------------------------------------
def _hillshade_sql(d: str, azimuth_deg: float = 315.0, altitude_deg: float = 45.0) -> str:
    """Analytical hillshade over the synthesized elevation raster: Horn's
    8-neighbor weighted gradient (the canonical GIS kernel — NOT the
    2-neighbor central difference `raster_slope` uses), then the
    Lambertian dot product of the unit surface normal with the light
    vector.  TRIG-FREE in SQL: sin/cos of azimuth/altitude are
    Python-computed literals, and cos/sin of slope/aspect reduce to
    rational functions of the gradient —
    shade = (sin_alt − cos_alt·sin_az·gx − cos_alt·cos_az·gy) / √(1+g²)
    — so the only transcendental evaluated cross-engine is sqrt
    (correctly rounded by IEEE 754 in both engines).

    Scale: eight equi-joins of the raster with its shifted self on the
    integer lattice key — raster-sized, no corpus involvement, no
    neighborhood explode; interior cells only."""
    cell_x_m, cell_y_m = _cell_sizes()
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    sin_alt, ca_sa = math.sin(alt), math.cos(alt) * math.sin(az)
    ca_ca = math.cos(alt) * math.cos(az)
    shade = f"(({sin_alt!r}e0 - {ca_sa!r}e0 * gx - {ca_ca!r}e0 * gy) / sqrt(1.0e0 + gx * gx + gy * gy))"
    return f"""ras as ({_raster_cte(d, _RES)}),
        grad as (
            select c.ix, c.iy,
                   ((ne.value + 2.0e0 * e.value + se.value)
                    - (nw.value + 2.0e0 * w.value + sw.value))
                       / {8.0 * cell_x_m!r}e0 as gx,
                   ((ne.value + 2.0e0 * nn.value + nw.value)
                    - (se.value + 2.0e0 * s.value + sw.value))
                       / {8.0 * cell_y_m!r}e0 as gy
            from ras c
            join ras e  on e.iy  = c.iy     and e.ix  = c.ix + 1
            join ras w  on w.iy  = c.iy     and w.ix  = c.ix - 1
            join ras nn on nn.ix = c.ix     and nn.iy = c.iy + 1
            join ras s  on s.ix  = c.ix     and s.iy  = c.iy - 1
            join ras ne on ne.ix = c.ix + 1 and ne.iy = c.iy + 1
            join ras nw on nw.ix = c.ix - 1 and nw.iy = c.iy + 1
            join ras se on se.ix = c.ix + 1 and se.iy = c.iy - 1
            join ras sw on sw.ix = c.ix - 1 and sw.iy = c.iy - 1
        )
        select cast(ix as bigint) as ix, cast(iy as bigint) as iy,
               cast(floor(greatest(0.0e0, {shade}) * 1.0e6 + 0.5e0) as bigint)
                   as shade_q6,
               cast(floor(greatest(0.0e0, {shade}) * 255.0e0 + 0.5e0) as bigint)
                   as hs8
        from grad"""


def q_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(f"with {_hillshade_sql(SPARK)}")


def q_hillshade_oracle() -> str:
    return f"with {_hillshade_sql(DUCK)}"


# ---------------------------------------------------------------------------
# D8 flow direction (steepest-descent drainage pointer)
# ---------------------------------------------------------------------------
def _d8_offsets() -> list[tuple[int, int, int, float]]:
    """(dir, dx, dy, dist_m): ESRI-style D8 numbering 0=E counterclockwise
    is irrelevant here — any FIXED deterministic numbering works; we use
    0=E,1=NE,2=N,3=NW,4=W,5=SW,6=S,7=SE with metric distances."""
    cx, cy = _cell_sizes()
    diag = math.sqrt(cx * cx + cy * cy)
    return [
        (0, 1, 0, cx), (1, 1, 1, diag), (2, 0, 1, cy), (3, -1, 1, diag),
        (4, -1, 0, cx), (5, -1, -1, diag), (6, 0, -1, cy), (7, 1, -1, diag),
    ]


def _flow_dir_sql(d: str) -> str:
    """CTE chain ending in ``fdir(ix, iy, flow_dir, drop_q9)``: per
    interior cell, the D8 steepest-descent direction — argmax over the 8
    neighbors of (elevation drop / metric distance), positive drops only,
    ties broken toward the LOWEST direction index, pits/flats → dir −1.
    The drop rate is quantized to int 1e-9 per neighbor BEFORE the argmax
    so the comparison is exact bigint; the argmax itself is the packed
    integer max(slope_q9·8 + (7−dir)) — one aggregate, no window.

    Scale: the 8-row offset table cross-joins the raster (a broadcast
    nested loop over 8 rows — constant fan-out, the supercover/seg_
    candidates shape), one lattice equi-join to fetch the neighbor, one
    map-side-combined argmax per cell."""
    offsets = " union all ".join(
        f"select {dr} as dir, {dx} as dx, {dy} as dy, {dist!r}e0 as dist_m"
        for dr, dx, dy, dist in _d8_offsets()
    )
    return f"""ras as ({_raster_cte(d, _RES)}),
        offs as ({offsets}),
        nb as (
            select c.ix, c.iy, o.dir,
                   cast(floor((c.value - n.value) / o.dist_m * 1.0e9 + 0.5e0)
                        as bigint) as slope_q9
            from ras c
            join offs o on 1 = 1
            join ras n on n.ix = c.ix + o.dx and n.iy = c.iy + o.dy
        ),
        interior as (
            select ix, iy from nb group by ix, iy having count(*) = 8
        ),
        best as (
            select nb.ix, nb.iy,
                   max(case when slope_q9 > 0
                       then slope_q9 * 8 + (7 - dir) else null end) as packed
            from nb join interior i on i.ix = nb.ix and i.iy = nb.iy
            group by nb.ix, nb.iy
        ),
        fdir as (
            select ix, iy,
                   cast(coalesce(7 - (packed % 8), -1) as bigint) as flow_dir,
                   cast(coalesce(packed, 0) as bigint) as packed_q9
            from best
        )"""


def q_flow_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        f"with {_flow_dir_sql(SPARK)} "
        f"select cast(ix as bigint) as ix, cast(iy as bigint) as iy, "
        f"flow_dir, packed_q9 from fdir"
    )


def q_flow_dir_oracle() -> str:
    return (
        f"with {_flow_dir_sql(DUCK)} "
        f"select cast(ix as bigint) as ix, cast(iy as bigint) as iy, "
        f"flow_dir, packed_q9 from fdir"
    )


# ---------------------------------------------------------------------------
# D8 flow accumulation (upstream drainage area)
# ---------------------------------------------------------------------------
def _flow_edges_sql(d: str) -> str:
    """Drainage pointers as (src_ix, src_iy, dst_ix, dst_iy) — the
    functional graph each non-pit interior cell contributes one edge to."""
    dx = " ".join(
        f"when {dr} then {ddx}" for dr, ddx, _, _ in _d8_offsets()
    )
    dy = " ".join(
        f"when {dr} then {ddy}" for dr, _, ddy, _ in _d8_offsets()
    )
    return (
        f"select ix as src_ix, iy as src_iy, "
        f"ix + (case flow_dir {dx} end) as dst_ix, "
        f"iy + (case flow_dir {dy} end) as dst_iy "
        f"from fdir where flow_dir >= 0"
    )


_ACCUM_ROUNDS = 8  # covers drainage paths up to 2^8 cells — > any path on
# the bounded test raster; at scale the round count is ⌈log2 L_max⌉ for the
# longest drainage path L_max (SCALE.md row)


def q_flow_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ix, iy, accum): D8 flow accumulation — 1 + the number of upstream
    cells whose drainage path passes through the cell.  The flow graph is
    FUNCTIONAL (out-degree ≤ 1) and strictly descending (acyclic), so the
    ancestor relation is its transitive closure, computed by pointer
    doubling: T₀ = E, T_{i+1} = T_i ∪ (T_i ∘ T_i) — all path lengths up
    to 2^i covered after i rounds, ⌈log₂ L⌉ rounds total (the alternating-
    star / hyperanf round discipline, localCheckpoint-bounded plans).

    Scale: each round is one self-join + distinct keyed on the lattice
    cell; the closure is Θ(Σ path length) rows — the documented cost of
    exact accumulation (same posture class as the exact PPJoin verifiers);
    the raster itself never re-scans after the fdir CTE materializes."""
    _views(spark, sf_dir)
    edges = spark.sql(
        f"with {_flow_dir_sql(SPARK)} {_flow_edges_sql(SPARK)}"
    ).localCheckpoint(eager=False)
    edges.createOrReplaceTempView("__fa_t0")
    cur = "__fa_t0"
    for i in range(_ACCUM_ROUNDS):
        nxt = spark.sql(f"""
            select src_ix, src_iy, dst_ix, dst_iy from {cur}
            union
            select a.src_ix, a.src_iy, b.dst_ix, b.dst_iy
            from {cur} a join {cur} b
              on b.src_ix = a.dst_ix and b.src_iy = a.dst_iy
        """).localCheckpoint(eager=False)
        cur = f"__fa_t{i + 1}"
        nxt.createOrReplaceTempView(cur)
    return spark.sql(f"""
        with {_flow_dir_sql(SPARK)},
        anc as (
            select dst_ix as ix, dst_iy as iy,
                   cast(count(*) as bigint) as n_upstream
            from {cur} group by dst_ix, dst_iy
        )
        select cast(f.ix as bigint) as ix, cast(f.iy as bigint) as iy,
               cast(1 + coalesce(a.n_upstream, 0) as bigint) as accum
        from fdir f
        left join anc a on a.ix = f.ix and a.iy = f.iy""")


def q_flow_accum_oracle() -> str:
    """Recursive-CTE walk down the drainage pointers (the closure the
    doubling rounds compute), counted per target cell."""
    return f"""
        with recursive {_flow_dir_sql(DUCK)},
        e as ({_flow_edges_sql(DUCK)}),
        walk(src_ix, src_iy, ix, iy) as (
            select src_ix, src_iy, dst_ix, dst_iy from e
            union
            select w.src_ix, w.src_iy, e.dst_ix, e.dst_iy
            from walk w join e on e.src_ix = w.ix and e.src_iy = w.iy
        ),
        anc as (
            select ix, iy, cast(count(*) as bigint) as n_upstream
            from walk group by ix, iy
        )
        select cast(f.ix as bigint) as ix, cast(f.iy as bigint) as iy,
               cast(1 + coalesce(a.n_upstream, 0) as bigint) as accum
        from fdir f
        left join anc a on a.ix = f.ix and a.iy = f.iy"""


# ---------------------------------------------------------------------------
# Bounded-radius harmonic centrality (K-hop, sampled sources)
# ---------------------------------------------------------------------------
_HC_MOD = 7
_HC_ROUNDS = 4
# 1/d as exact integer 1e-6 units per hop count — no float division in the
# fold, and every engine sums identical bigints
_HC_W = {dd: round(1.0e6 / dd) for dd in range(1, _HC_ROUNDS + 1)}


def _hc_iter_sql(edges: str, prev: str) -> str:
    # the sssp relaxation lifted to (src, node) pair state
    return (
        f"select src, doc_id, min(dist) as dist from ("
        f"  select src, doc_id, dist from {prev}"
        f"  union all"
        f"  select p.src, e.w as doc_id, p.dist + 1 as dist"
        f"  from {edges} e join {prev} p on e.u = p.doc_id"
        f") group by src, doc_id"
    )


def _hc_final_sql(last: str) -> str:
    w = " ".join(f"when {dd} then {_HC_W[dd]}" for dd in _HC_W)
    return (
        f"select src as doc_id, "
        f"cast(count(*) - 1 as bigint) as n_reached, "
        f"cast(sum(case dist {w} else 0 end) as bigint) as harmonic_q6 "
        f"from {last} group by src"
    )


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_reached, harmonic_q6): harmonic centrality Σ 1/d(u,v)
    within radius K=4 on the deterministic undirected link graph, for the
    sampled source set doc_id % 7 == 0 — the bounded-radius sampled form
    every large-graph centrality system ships (exact all-pairs is Θ(n·m)).
    1/d is an exact integer 1e-6 weight per hop count, so the fold is a
    bigint sum; BFS distances are exact min-plus integers (order-free).

    Scale: state is (src, node) pairs — sparse frontier bounded by
    |sources|·|K-ball|; one join + one map-side-combined min per round,
    localCheckpoint keeps plans linear in K (the sssp discipline,
    operators/graph.py:267)."""
    from ..operators.graph import undirected_edges_sql

    _views(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    ).createOrReplaceTempView("__hc_docs")
    n_expr = "(select count(*) from __hc_docs)"
    spark.sql(
        undirected_edges_sql(SPARK, "__hc_docs", n_expr)
    ).localCheckpoint(eager=False).createOrReplaceTempView("__hc_edges")
    cur = spark.sql(
        f"select doc_id as src, doc_id, cast(0 as bigint) as dist "
        f"from __hc_docs where doc_id % {_HC_MOD} = 0"
    )
    for t in range(_HC_ROUNDS):
        cur.localCheckpoint(eager=False).createOrReplaceTempView(f"__hc_d{t}")
        cur = spark.sql(_hc_iter_sql("__hc_edges", f"__hc_d{t}"))
    cur.localCheckpoint(eager=False).createOrReplaceTempView("__hc_last")
    return spark.sql(_hc_final_sql("__hc_last"))


def q_harmonic_centrality_oracle() -> str:
    from ..operators.graph import undirected_edges_sql

    n_expr = "(select count(*) from d0)"
    ctes = [
        "d0 as (select doc_id from documents)",
        f"e0 as ({undirected_edges_sql(DUCK, 'd0', n_expr)})",
        f"s0 as (select doc_id as src, doc_id, cast(0 as bigint) as dist "
        f"from d0 where doc_id % {_HC_MOD} = 0)",
    ]
    for t in range(_HC_ROUNDS):
        ctes.append(f"s{t + 1} as ({_hc_iter_sql('e0', f's{t}')})")
    return "with " + ", ".join(ctes) + " " + _hc_final_sql(f"s{_HC_ROUNDS}")


# ---------------------------------------------------------------------------
# Exact exponential smoothing (α = 1/2, binary weights)
# ---------------------------------------------------------------------------
_ES_M = 24  # recency window: weights 2^0 .. 2^(M-2) stay far inside bigint


def _exp_smooth_sql(d: str) -> str:
    """Per-user simple exponential smoothing of `value` (α = 1/2) over the
    last 24 events — the closed form of l_t = α·x_t + (1−α)·l_{t−1} with
    l_1 = x_1, computed EXACTLY: α = 1/2 makes every weight a power of
    two, so the scaled level L = x₁_q + Σ_{j≥2} 2^{j−2}·x_j_q is one
    bigint sum of exact products (values quantized to int 1e-6 first),
    and the final level is an integer rounding division by 2^{m−1} —
    no float average, no pow(), no fold-order dependence anywhere.

    Scale: ONE user-keyed sort serves the ranking window; the weighted
    fold is a map-side-combined bigint sum per user."""
    div = "div" if d == SPARK else "//"
    return f"""
        with ranked as (
            select user_id,
                   cast(floor(value * 1.0e6 + 0.5e0) as bigint) as x_q6,
                   row_number() over (
                       partition by user_id
                       order by ts desc, event_id desc) as r_desc
            from events
        ),
        win as (
            select user_id, x_q6,
                   count(*) over (partition by user_id) as m,
                   cast(count(*) over (partition by user_id) as bigint)
                       - cast(r_desc as bigint) + 1 as j
            from ranked
            where r_desc <= {_ES_M}
        ),
        folded as (
            select user_id,
                   cast(max(m) as bigint) as n_events,
                   cast(sum(case when j = 1 then x_q6
                            else x_q6 * cast(pow(2.0e0, j - 2) as bigint)
                            end) as bigint) as level_scaled
            from win
            group by user_id
        )
        select user_id, n_events, level_scaled,
               cast((level_scaled
                     + (case when n_events > 1
                        then cast(pow(2.0e0, n_events - 2) as bigint)
                        else 0 end))
                    {div} (cast(pow(2.0e0, n_events - 1) as bigint))
                    as bigint) as level_q6
        from folded"""


def q_exp_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_exp_smooth_sql(SPARK))


def q_exp_smooth_oracle() -> str:
    return _exp_smooth_sql(DUCK)


def register_r5c(QUERIES: dict) -> None:
    QUERIES["hillshade"] = (q_hillshade, q_hillshade_oracle)
    QUERIES["flow_dir"] = (q_flow_dir, q_flow_dir_oracle)
    QUERIES["flow_accum"] = (q_flow_accum, q_flow_accum_oracle)
    QUERIES["harmonic_centrality"] = (
        q_harmonic_centrality,
        q_harmonic_centrality_oracle,
    )
    QUERIES["exp_smooth"] = (q_exp_smooth, q_exp_smooth_oracle)
