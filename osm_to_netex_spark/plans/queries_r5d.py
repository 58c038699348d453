"""Round-5 batch D (SURVEY §2.3 `(r5)` rows): viewshed, cost distance,
RAKE keyphrases, SPRT sequential test, JSON property extraction.

Landing discipline as everywhere (LANDING.md): dual-dialect SQL (or an
iterative Spark operator whose algebra the DuckDB oracle replays
unrolled), integer-quantized folds, transcendental constants computed in
Python and embedded as literals (never evaluated cross-engine), scalar
output columns, identical aliases both dialects.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK
from .queries_r5c import _cell_sizes

_RES = 12


def _grid_bounds() -> tuple[int, int, int, int]:
    from . import queries as q

    n = 2**_RES
    return (
        int((q.LON_LO + 180.0) / 360.0 * n),
        int((q.LON_HI + 180.0) / 360.0 * n),
        int((q.LAT_LO + 90.0) / 180.0 * n),
        int((q.LAT_HI + 90.0) / 180.0 * n),
    )


def _views(spark: SparkSession, sf_dir: str) -> None:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)


def _raster(d: str) -> str:
    from .queries_r4 import _raster_cte

    return _raster_cte(d, _RES)


# ---------------------------------------------------------------------------
# Viewshed (line-of-sight over the elevation raster)
# ---------------------------------------------------------------------------
_OBS_H = 20.0  # observer mast height above terrain, metres


def _viewshed_sql(d: str) -> str:
    """Per raster cell: is it visible from a fixed observer (the grid's
    center cell + a 20 m mast)?  Exact supercover line-of-sight: the
    blockers tested are exactly the cells the sightline CROSSES (the
    line_raster slab test in index space — parametric t-interval
    intersection against each cell's [j−½, j+½] square), and a target is
    visible iff every such intermediate cell's elevation angle is
    strictly below the target's.  The angle comparison is the
    cross-multiplied form (z_c − z_o)·d_t < (z_t − z_o)·d_c — one
    identical IEEE expression both engines, no trig.

    Scale: candidate blockers explode over the sightline's bbox and the
    slab test prunes to the true supercover — Θ(path) survivors per
    target but Θ(bbox area) candidates, the documented line_raster
    posture; production DEMs sectorize rays per partition (SCALE.md).
    One (target) keyed aggregate closes it."""
    ix_lo, ix_hi, iy_lo, iy_hi = _grid_bounds()
    ox, oy = (ix_lo + ix_hi) // 2, (iy_lo + iy_hi) // 2
    cx_m, cy_m = _cell_sizes()
    # metric distance in index space: hypot of anisotropic steps
    dist = (
        lambda jx, jy: f"sqrt((cast({jx} - {ox} as double) * {cx_m!r}e0)"
        f" * (cast({jx} - {ox} as double) * {cx_m!r}e0)"
        f" + (cast({jy} - {oy} as double) * {cy_m!r}e0)"
        f" * (cast({jy} - {oy} as double) * {cy_m!r}e0))"
    )
    if d == SPARK:
        cand = (
            f"select t.ix, t.iy, t.value, cy, explode(sequence("
            f"least({ox}, t.ix), greatest({ox}, t.ix))) as cx "
            f"from (select ix, iy, value, explode(sequence("
            f"least({oy}, iy), greatest({oy}, iy))) as cy from tgt) t"
        )
    else:
        cand = (
            f"select t.ix, t.iy, t.value, cy.y as cy, cx.x as cx from tgt t, "
            f"unnest(generate_series(least({oy}, t.iy), greatest({oy}, t.iy))) cy(y), "
            f"unnest(generate_series(least({ox}, t.ix), greatest({ox}, t.ix))) cx(x)"
        )
    # slab test for segment (ox,oy)->(ix,iy) vs square [cx±0.5]×[cy±0.5]
    ax, ay = f"cast({ox} as double)", f"cast({oy} as double)"
    bx, by = "cast(b.ix as double)", "cast(b.iy as double)"
    x0 = "(cast(b.cx as double) - 0.5e0)"
    x1 = "(cast(b.cx as double) + 0.5e0)"
    y0 = "(cast(b.cy as double) - 0.5e0)"
    y1 = "(cast(b.cy as double) + 0.5e0)"
    slab = (
        f"case when {bx} = {ax} then ({ax} >= {x0} and {ax} <= {x1}) "
        f"when {by} = {ay} then ({ay} >= {y0} and {ay} <= {y1}) "
        f"else greatest("
        f"least(({x0} - {ax}) / ({bx} - {ax}), ({x1} - {ax}) / ({bx} - {ax})), "
        f"least(({y0} - {ay}) / ({by} - {ay}), ({y1} - {ay}) / ({by} - {ay})), 0.0e0)"
        f" <= least("
        f"greatest(({x0} - {ax}) / ({bx} - {ax}), ({x1} - {ax}) / ({bx} - {ax})), "
        f"greatest(({y0} - {ay}) / ({by} - {ay}), ({y1} - {ay}) / ({by} - {ay})), 1.0e0) end"
    )
    blocked = (
        f"case when (r.value - obs.z) * {dist('b.ix', 'b.iy')}"
        f" >= (b.value - obs.z) * {dist('b.cx', 'b.cy')}"
        f" then 1 else 0 end"
    )
    return f"""ras as ({_raster(d)}),
        obs as (select value + {_OBS_H!r}e0 as z from ras
                where ix = {ox} and iy = {oy}),
        tgt as (select ix, iy, value from ras
                where not (ix = {ox} and iy = {oy})),
        blockers as (
            select b.ix, b.iy, max({blocked}) as any_block,
                   cast(count(*) as bigint) as n_crossed
            from ({cand}) b
            join ras r on r.ix = b.cx and r.iy = b.cy
            cross join obs
            where {slab}
              and not (b.cx = {ox} and b.cy = {oy})
              and not (b.cx = b.ix and b.cy = b.iy)
            group by b.ix, b.iy
        )
        select cast(t.ix as bigint) as ix, cast(t.iy as bigint) as iy,
               cast(1 - coalesce(k.any_block, 0) as bigint) as visible,
               cast(coalesce(k.n_crossed, 0) as bigint) as n_crossed,
               cast(floor((t.value - obs.z) / {dist('t.ix', 't.iy')} * 1.0e9
                    + 0.5e0) as bigint) as angle_q9
        from tgt t
        cross join obs
        left join blockers k on k.ix = t.ix and k.iy = t.iy"""


def q_viewshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(f"with {_viewshed_sql(SPARK)}")


def q_viewshed_oracle() -> str:
    return f"with {_viewshed_sql(DUCK)}"


# ---------------------------------------------------------------------------
# Cost distance (slope-weighted least-cost-path lengths on the grid)
# ---------------------------------------------------------------------------
_CD_ROUNDS = 20  # ≥ the grid's Chebyshev diameter — every cell settles


def _cd_edges_sql(d: str) -> str:
    """8-neighbor traversal costs: cost_q3 = ⌊(step_m + 10·|Δz|)·10³⌉ —
    distance plus a slope penalty, quantized to integer millimetre-class
    units per edge so every relaxation is exact min-plus bigint."""
    from .queries_r5c import _d8_offsets

    parts = []
    for _, dx, dy, dist_m in _d8_offsets():
        parts.append(
            f"select a.ix as src_ix, a.iy as src_iy, "
            f"b.ix as dst_ix, b.iy as dst_iy, "
            f"cast(floor(({dist_m!r}e0 + 10.0e0 * abs(b.value - a.value))"
            f" * 1.0e3 + 0.5e0) as bigint) as w "
            f"from ras a join ras b on b.ix = a.ix + {dx} and b.iy = a.iy + {dy}"
        )
    return " union all ".join(parts)


def _cd_iter_sql(edges: str, prev: str) -> str:
    return (
        f"select ix, iy, min(cost) as cost from ("
        f"  select ix, iy, cost from {prev}"
        f"  union all"
        f"  select e.dst_ix as ix, e.dst_iy as iy, p.cost + e.w as cost"
        f"  from {edges} e join {prev} p"
        f"    on e.src_ix = p.ix and e.src_iy = p.iy"
        f") group by ix, iy"
    )


_CD_SRC = (
    "select ix, iy, cast(0 as bigint) as cost from ("
    "select ix, iy, row_number() over "
    "(order by value asc, ix asc, iy asc) as rn from ras) r where rn = 1"
)


def q_cost_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ix, iy, cost_q3): least-cost-path distance from the raster's
    minimum-elevation cell under slope-weighted 8-neighbor traversal —
    the cost-surface primitive under service-area and corridor analyses.
    K synchronous min-plus relaxations with K ≥ the grid's Chebyshev
    diameter settle every cell exactly (Bellman-Ford on a nonnegative
    grid); integer edge weights make every round order-free.

    Scale: the sssp discipline (operators/graph.py:267) — sparse label
    table, one join + one map-side-combined min per round,
    localCheckpoint keeps plans linear in K; the edge table is 8×raster,
    built once."""
    _views(spark, sf_dir)
    spark.sql(_raster(SPARK)).localCheckpoint(
        eager=False
    ).createOrReplaceTempView("ras")
    spark.sql(_cd_edges_sql(SPARK)).localCheckpoint(
        eager=False
    ).createOrReplaceTempView("__cd_edges")
    cur = spark.sql(_CD_SRC)
    for t in range(_CD_ROUNDS):
        cur.localCheckpoint(eager=False).createOrReplaceTempView(f"__cd_d{t}")
        cur = spark.sql(_cd_iter_sql("__cd_edges", f"__cd_d{t}"))
    return cur.selectExpr(
        "cast(ix as bigint) as ix",
        "cast(iy as bigint) as iy",
        "cast(cost as bigint) as cost_q3",
    )


def q_cost_distance_oracle() -> str:
    # every s{t} feeds TWO branches of s{t+1} (carry + relax): without a
    # materialization barrier DuckDB's CTE inlining re-evaluates the chain
    # 2^K times — AS MATERIALIZED is the oracle-side localCheckpoint
    ctes = [
        f"ras as materialized ({_raster(DUCK)})",
        f"e0 as materialized ({_cd_edges_sql(DUCK)})",
        f"s0 as materialized ({_CD_SRC})",
    ]
    for t in range(_CD_ROUNDS):
        ctes.append(
            f"s{t + 1} as materialized ({_cd_iter_sql('e0', f's{t}')})"
        )
    return (
        "with " + ", ".join(ctes)
        + f" select cast(ix as bigint) as ix, cast(iy as bigint) as iy, "
        f"cast(cost as bigint) as cost_q3 from s{_CD_ROUNDS}"
    )


# ---------------------------------------------------------------------------
# RAKE keyphrases (Rose et al. 2010, exact integer scoring)
# ---------------------------------------------------------------------------
_RAKE_TOPK = 3
_RAKE_STOP = ["the", "and", "of", "to", "in", "is", "that", "it", "for",
              "with", "a"]


def _rake_sql(d: str) -> str:
    """Top-3 RAKE keyphrases per document: candidate phrases are maximal
    stopword-free token runs; word score = deg(w)/freq(w) where deg sums
    the lengths of phrases containing w; phrase score sums its words'
    scores.  The division is floored at integer 1e-6 per word
    ((deg·10⁶) div freq — exact integer), so phrase scores fold as exact
    bigints; ties broken by phrase text.

    Scale: one posexplode + one doc-keyed window (phrase segmentation),
    two doc-keyed aggregates (word stats, phrase fold), one top-k window
    — everything partitions by doc_id; the corpus-wide shuffle count is
    three, all map-side-combinable."""
    stop = ", ".join(f"'{w}'" for w in _RAKE_STOP)
    if d == SPARK:
        toks = (
            "select doc_id, pos, tok from (select doc_id, "
            "posexplode(filter(split(lower(text), '[^a-z0-9]+'), "
            "t -> t <> '')) as (pos, tok) from documents)"
        )
        phrase_txt = (
            "array_join(transform(array_sort(collect_list("
            "struct(p.pos, p.tok))), x -> x.tok), ' ')"
        )
        stop_set = f"array({stop})"
        is_stop = f"array_contains({stop_set}, tok)"
    else:
        toks = (
            "select doc_id, t.i - 1 as pos, arr[t.i] as tok from "
            "(select doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), t -> t <> '') as arr from documents) a, "
            "unnest(generate_series(1, len(arr))) t(i)"
        )
        is_stop = f"list_contains([{stop}], tok)"
        phrase_txt = "string_agg(p.tok, ' ' order by p.pos)"
    return f"""
        with toks as ({toks}),
        seg as (
            select doc_id, pos, tok, {is_stop} as stop,
                   sum(case when {is_stop} then 1 else 0 end)
                       over (partition by doc_id order by pos
                             rows unbounded preceding) as phrase_id
            from toks
        ),
        pw as (
            select doc_id, phrase_id, pos, tok,
                   count(*) over (partition by doc_id, phrase_id)
                       as phrase_len
            from seg where not stop
        ),
        wstat as (
            select doc_id, tok,
                   cast(count(*) as bigint) as freq,
                   cast(sum(phrase_len) as bigint) as deg
            from pw group by doc_id, tok
        ),
        pscore as (
            select p.doc_id, p.phrase_id,
                   {phrase_txt} as phrase,
                   cast(sum((w.deg * 1000000) {"div" if d == SPARK else "//"}
                        w.freq) as bigint) as score_q6
            from pw p
            join wstat w on w.doc_id = p.doc_id and w.tok = p.tok
            group by p.doc_id, p.phrase_id
        ),
        ranked as (
            select doc_id, phrase, score_q6,
                   row_number() over (
                       partition by doc_id
                       order by score_q6 desc, phrase asc) as rk
            from pscore
        )
        select doc_id, cast(rk as bigint) as rk, phrase, score_q6
        from ranked where rk <= {_RAKE_TOPK}"""


def q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_rake_sql(SPARK))


def q_rake_oracle() -> str:
    return _rake_sql(DUCK)


# ---------------------------------------------------------------------------
# SPRT (Wald sequential probability ratio test per event stream)
# ---------------------------------------------------------------------------
_SPRT_P0, _SPRT_P1 = 0.4, 0.6
_SPRT_ALPHA = 0.05
_SPRT_THRESH = 50.0  # conversion: value > threshold
# log-likelihood increments and decision boundaries as integer 1e-9
# literals (Python-computed — no cross-engine ln())
_L1_Q9 = round(math.log(_SPRT_P1 / _SPRT_P0) * 1.0e9)
_L0_Q9 = round(math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)) * 1.0e9)
_A_Q9 = round(math.log((1.0 - _SPRT_ALPHA) / _SPRT_ALPHA) * 1.0e9)
_B_Q9 = -_A_Q9


def _sprt_sql(d: str) -> str:
    """Wald SPRT per event_type on the (ts, event_id)-ordered Bernoulli
    stream (conversion = value > 50): cumulative LLR with H0 p=0.4 vs H1
    p=0.6, α=β=0.05.  The LLR is EXACT integer arithmetic — increments
    and boundaries are Python-computed 1e-9 literals, the cumulative sum
    is conv_cum·L1 + nonconv_cum·L0 over window counts — so the crossing
    index is a deterministic integer compare, not a float walk.

    Scale: ONE type-keyed ordered window (the sessionize posture) + one
    aggregate; no self-joins."""
    return f"""
        with obs as (
            select event_type,
                   case when value > {_SPRT_THRESH!r}e0 then 1 else 0 end as x,
                   row_number() over w as i,
                   sum(case when value > {_SPRT_THRESH!r}e0 then 1 else 0 end)
                       over w as conv_cum
            from events
            window w as (partition by event_type order by ts, event_id)
        ),
        llr as (
            select event_type, i,
                   conv_cum * cast({_L1_Q9} as bigint)
                   + (i - conv_cum) * cast({_L0_Q9} as bigint) as llr_q9
            from obs
        )
        select event_type,
               cast(count(*) as bigint) as n_total,
               cast(min(case when llr_q9 >= {_A_Q9} then i end) as bigint)
                   as first_h1_cross,
               cast(min(case when llr_q9 <= {_B_Q9} then i end) as bigint)
                   as first_h0_cross,
               cast(case
                   when coalesce(min(case when llr_q9 >= {_A_Q9} then i end),
                                 9223372036854775807)
                      < coalesce(min(case when llr_q9 <= {_B_Q9} then i end),
                                 9223372036854775807) then 1
                   when coalesce(min(case when llr_q9 <= {_B_Q9} then i end),
                                 9223372036854775807)
                      < coalesce(min(case when llr_q9 >= {_A_Q9} then i end),
                                 9223372036854775807) then -1
                   else 0 end as bigint) as decision
        from llr
        group by event_type"""


def q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_sprt_sql(SPARK))


def q_sprt_oracle() -> str:
    return _sprt_sql(DUCK)


# ---------------------------------------------------------------------------
# JSON property extraction + stats
# ---------------------------------------------------------------------------
def _json_stats_sql(d: str) -> str:
    """Per event_type stats of the JSON property ``props.k`` — the
    semi-structured extraction surface (get_json_object / json_extract):
    exact integer count/sum/min/max/distinct on the extracted value.

    Scale: extraction is scan-parallel codegen; one tiny (type) keyed
    aggregate; distinct expands to two-level agg on the same key."""
    k = (
        "cast(get_json_object(props, '$.k') as bigint)"
        if d == SPARK
        else "cast(json_extract(props, '$.k') as bigint)"
    )
    return f"""
        with ext as (select event_type, {k} as k from events)
        select event_type,
               cast(count(*) as bigint) as n_events,
               cast(count(distinct k) as bigint) as n_distinct_k,
               cast(sum(k) as bigint) as sum_k,
               cast(min(k) as bigint) as min_k,
               cast(max(k) as bigint) as max_k
        from ext
        group by event_type"""


def q_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_json_stats_sql(SPARK))


def q_json_stats_oracle() -> str:
    return _json_stats_sql(DUCK)


def register_r5d(QUERIES: dict) -> None:
    QUERIES["viewshed"] = (q_viewshed, q_viewshed_oracle)
    QUERIES["cost_distance"] = (q_cost_distance, q_cost_distance_oracle)
    QUERIES["rake_keyphrases"] = (q_rake, q_rake_oracle)
    QUERIES["sprt"] = (q_sprt, q_sprt_oracle)
    QUERIES["json_extract_stats"] = (q_json_stats, q_json_stats_oracle)
