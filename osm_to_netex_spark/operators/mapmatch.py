"""HMM (Viterbi) map-matching: GPS trajectories snapped to polyline segments
with path smoothness, not greedy nearest-segment choice.

The reference never matches trajectories (it copies zone geometry verbatim,
SURVEY §2.1 negative findings); this is north-rule engine surface on top of
the snap-join candidate machinery (`distjoin.seg_candidates`).

Model (Newson & Krumm 2009, simplified to a deterministic integer form):

* state at step t = a candidate segment within ``radius_m`` of the point
  (complete prefilter — same planar metric as snap_join);
* emission cost  = point-to-segment distance, quantized to integer mm
  (``floor(d·1000 + 0.5)`` — exact in IEEE, identical cross-engine);
* transition cost = 0 for staying on the same segment, a flat
  ``switch_penalty_mm`` for changing segment.  The flat penalty collapses
  the classic O(|states|²) inner minimum to
  ``dp_t(s) = emis_t(s) + min(dp_{t-1}(s), best_{t-1} + P)`` — each Viterbi
  step is ONE aggregate (per-trajectory best) plus ONE equi-join (stay),
  never a per-pair product;
* steps with no candidate in range are unmatched: they drop out and the
  chain connects across them (matchable steps are densely re-indexed per
  trajectory, identically in both engines).

All costs are bigint ⇒ every min is exact and ties break deterministically
by (cost, line, seg) lexicographic struct-min.  The whole DP runs as ONE
per-trajectory higher-order-function expression over the collected
candidate set (ONE groupBy shuffle, no per-round jobs): trajectories are
bounded windows by contract — segment GPS traces first
(operators/chunking, events_sessionize) if raw trajectories are unbounded
— so per-trajectory state is O(steps × candidates-per-step), tiny.  The
pre-r5 form looped k_max driver rounds with a localCheckpoint barrier per
round (the sssp/grid_bfs discipline, ~12 jobs): correct, but 29.5 s
at sf0.1 against 3.2 s for this form — round-job overhead, not compute.
Paths are carried forward in the DP state (path-copy Viterbi), so no
separate backtrack pass exists; the stay-vs-switch decision and both
argmin tie-breaks are the same algebra the unrolled DuckDB oracle
replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.portable import SPARK, let_
from .distjoin import seg_candidates

_BIG = 1 << 60


def map_match(
    points: DataFrame,
    lines: DataFrame,
    radius_m: float,
    switch_penalty_mm: int = 100_000,
    res: int = 12,
    traj_id: str = "traj_id",
    step_col: str = "step",
    line_id: str = "zone_id",
    pos_list: str = "pos_list",
) -> DataFrame:
    """(traj_id, step, line_id, seg_idx, emis_mm): per matched step, the
    segment of the GLOBALLY cost-optimal path (Σ emission + Σ switch
    penalties), with the matched distance in mm."""
    P = int(switch_penalty_mm)
    big = f"cast({_BIG} as bigint)"
    cand = (
        seg_candidates(
            points, lines, radius_m, res, [traj_id, step_col], line_id, pos_list
        )
        .selectExpr(
            f"{traj_id} as traj",
            f"{step_col} as step",
            "__lid as lid",
            "seg_idx as seg",
            "cast(floor(__d * 1000.0e0 + 0.5e0) as bigint) as emis",
        )
    )
    # ONE shuffle: each trajectory's candidate set collects to the executor
    # that owns its group; the full Viterbi (forward DP + path carry) then
    # runs as a single expression over that array.  Per-(lid, seg)
    # uniqueness within a step is guaranteed by seg_candidates (a point has
    # exactly one cell), so filter(...)[1] lookups are total functions and
    # the result is collect_list-order-independent.
    grp = cand.groupBy("traj").agg(
        F.collect_list(F.struct("step", "lid", "seg", "emis")).alias("cs")
    )

    mk = "named_struct('step', c.step, 'lid', c.lid, 'seg', c.seg, 'emis', c.emis)"
    # matchable steps in order = the dense k-index; gaps drop out and the
    # chain connects across them
    levels = (
        "transform(array_sort(array_distinct(transform(cs, c -> c.step))),"
        " s -> filter(cs, c -> c.step = s))"
    )
    init = (
        "transform(element_at(__lv.lv, 1), c -> named_struct("
        "'lid', c.lid, 'seg', c.seg, 'cost', c.emis, "
        f"'path', array({mk})))"
    )
    pcost = f"coalesce(try_element_at(__pv.pv, 1).cost, {big})"
    # stay iff dp_{t-1}(same seg) <= best_{t-1} + P — ties prefer stay,
    # identical to the unrolled oracle's case-when
    new_state = let_(
        {"pv": "filter(acc, p -> p.lid = c.lid and p.seg = c.seg)"},
        (
            "named_struct('lid', c.lid, 'seg', c.seg, "
            f"'cost', c.emis + least({pcost}, __bb.bb.cost + {P}), "
            f"'path', concat(if({pcost} <= __bb.bb.cost + {P}, "
            "try_element_at(__pv.pv, 1).path, "
            "element_at(filter(acc, p -> p.lid = __bb.bb.lid"
            " and p.seg = __bb.bb.seg), 1).path), "
            f"array({mk})))"
        ),
        SPARK,
        var="__pv",
    )
    merge = let_(
        {
            "bb": "array_min(transform(acc, p -> "
            "named_struct('cost', p.cost, 'lid', p.lid, 'seg', p.seg)))"
        },
        f"transform(lev, c -> {new_state})",
        SPARK,
        var="__bb",
    )
    fwd = (
        f"aggregate(slice(__lv.lv, 2, size(__lv.lv) - 1), {init}, "
        f"(acc, lev) -> {merge})"
    )
    # argmin by (cost, lid, seg) lexicographic struct-min, then emit the
    # winning state's carried path — no separate backtrack pass
    best_path = let_(
        {"fw": fwd},
        let_(
            {
                "bf": "array_min(transform(__fw.fw, p -> "
                "named_struct('cost', p.cost, 'lid', p.lid, 'seg', p.seg)))"
            },
            "element_at(filter(__fw.fw, p -> p.lid = __bf.bf.lid"
            " and p.seg = __bf.bf.seg), 1).path",
            SPARK,
            var="__bf",
        ),
        SPARK,
        var="__fw",
    )
    sel = let_({"lv": levels}, best_path, SPARK, var="__lv")

    return grp.select("traj", F.explode(F.expr(sel)).alias("m")).selectExpr(
        f"traj as {traj_id}",
        f"m.step as {step_col}",
        f"m.lid as {line_id}",
        "m.seg as seg_idx",
        "m.emis as emis_mm",
    )


def map_match_oracle_sql(
    points_cte: str,
    lines_cte: str,
    radius_m: float,
    k_unroll: int,
    switch_penalty_mm: int = 100_000,
    traj_id: str = "traj_id",
    step_col: str = "step",
    line_id: str = "zone_id",
    pos_list: str = "pos_list",
) -> str:
    """DuckDB replay with the DP unrolled to ``k_unroll`` levels (the house
    kmeans/sssp oracle pattern): brute point×segment candidates (proves the
    cell prefilter complete), identical integer costs, identical carry and
    tie-break algebra, backtrack replayed from the same parent tables.
    ``points_cte``/``lines_cte`` are CTE names already defined in the
    surrounding WITH clause."""
    from .distjoin import seg_dist_m
    from ..functions.portable import DUCK

    P = int(switch_penalty_mm)
    dist = seg_dist_m("p.lat", "p.lon", "s.say", "s.sax", "s.sby", "s.sbx", DUCK)
    parts = [
        f"""segs as (
            select {line_id} as lid, t.i as seg,
                   {pos_list}[2*t.i - 1] as say, {pos_list}[2*t.i] as sax,
                   {pos_list}[2*t.i + 1] as sby, {pos_list}[2*t.i + 2] as sbx
            from {lines_cte}, unnest(generate_series(1, len({pos_list}) // 2 - 1)) t(i)
        )""",
        f"""cand0 as materialized (
            select p.{traj_id} as traj, p.{step_col} as step, s.lid, s.seg,
                   cast(floor(({dist}) * 1000.0e0 + 0.5e0) as bigint) as emis_mm
            from {points_cte} p cross join segs s
            where ({dist}) <= {radius_m!r}e0
        )""",
        """ks as materialized (
            select traj, step,
                   row_number() over (partition by traj order by step) - 1 as k
            from (select distinct traj, step from cand0)
        )""",
        "cand as materialized (select c.*, k.k from cand0 c join ks k using (traj, step))",
        "dpfull0 as materialized (select traj, lid, seg, emis_mm as cost from cand where k = 0)",
    ]
    for k in range(1, k_unroll + 1):
        prev = f"dpfull{k - 1}"
        parts.append(f"""b{k} as materialized (
            select traj,
                   (min(struct_pack(cost := cost, lid := lid, seg := seg))).cost as bc,
                   (min(struct_pack(cost := cost, lid := lid, seg := seg))).lid as blid,
                   (min(struct_pack(cost := cost, lid := lid, seg := seg))).seg as bseg
            from {prev} group by traj
        )""")
        parts.append(f"""dp{k} as materialized (
            select c.traj, c.lid, c.seg,
                   c.emis_mm + least(coalesce(p.cost, {_BIG}), b.bc + {P}) as cost,
                   case when coalesce(p.cost, {_BIG}) <= b.bc + {P}
                        then c.lid else b.blid end as plid,
                   case when coalesce(p.cost, {_BIG}) <= b.bc + {P}
                        then c.seg else b.bseg end as pseg
            from (select * from cand where k = {k}) c
            join b{k} b using (traj)
            left join {prev} p on p.traj = c.traj and p.lid = c.lid and p.seg = c.seg
        )""")
        parts.append(f"""dpfull{k} as materialized (
            select traj, lid, seg, cost from dp{k}
            union all
            select traj, lid, seg, cost from {prev}
            where traj not in (select traj from dp{k})
        )""")
    parts.append(f"""klast as materialized (
            select traj, max(k) as kl from ks group by traj
        ), fin as materialized (
            select d.traj, l.kl as k,
                   (d.m).lid as lid, (d.m).seg as seg
            from (select traj,
                         min(struct_pack(cost := cost, lid := lid, seg := seg)) as m
                  from dpfull{k_unroll} group by traj) d
            join klast l using (traj)
        )""")
    parts.append(f"r{k_unroll} as materialized (select * from fin where k = {k_unroll})")
    for k in range(k_unroll - 1, -1, -1):
        parts.append(f"""r{k} as materialized (
            select * from fin where k = {k}
            union all
            select s.traj, {k} as k, d.plid as lid, d.pseg as seg
            from r{k + 1} s
            join dp{k + 1} d on d.traj = s.traj and d.lid = s.lid and d.seg = s.seg
        )""")
    sel = " union all ".join(f"select * from r{k}" for k in range(k_unroll + 1))
    body = ",\n".join(parts)
    return f"""{body},
        sel as ({sel})
        select s.traj as {traj_id}, c.step as {step_col},
               s.lid as {line_id}, s.seg as seg_idx, c.emis_mm
        from sel s
        join cand c on c.traj = s.traj and c.k = s.k
                   and c.lid = s.lid and c.seg = s.seg"""
