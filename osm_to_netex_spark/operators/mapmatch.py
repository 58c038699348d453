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
by (cost, line, seg) lexicographic struct-min.  The forward pass runs
max-trajectory-length rounds — 2 shuffles per round, dp/parent tables
localCheckpoint-bounded (the sssp/grid_bfs discipline); segment GPS traces
into bounded windows first (operators/chunking, events_sessionize) if raw
trajectories are unbounded.  The backtrack replays the parent tables from
the per-trajectory argmin — K small joins on trajectory-sized tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _attach_cached
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
    cand = (
        seg_candidates(
            points, lines, radius_m, res, [traj_id, step_col], line_id, pos_list
        )
        .selectExpr(
            f"{traj_id} as traj",
            f"{step_col} as step",
            "__lid as lid",
            "seg_idx as seg",
            "cast(floor(__d * 1000.0e0 + 0.5e0) as bigint) as emis_mm",
        )
    )
    # dense k-index over each trajectory's MATCHABLE steps (gaps drop out)
    ks = (
        cand.select("traj", "step")
        .distinct()
        .withColumn(
            "k",
            F.row_number().over(Window.partitionBy("traj").orderBy("step")) - 1,
        )
    )
    cand = cand.join(ks, ["traj", "step"]).persist()
    k_max = cand.agg(F.max("k")).first()[0]
    if k_max is None:
        empty = cand.selectExpr(
            f"traj as {traj_id}", f"step as {step_col}",
            f"lid as {line_id}", "seg as seg_idx", "emis_mm",
        )
        return _attach_cached(empty, [cand])

    dp = (
        cand.where(F.col("k") == 0)
        .select("traj", "lid", "seg", F.col("emis_mm").alias("cost"))
        .localCheckpoint()
    )
    parents: dict[int, DataFrame] = {}
    for k in range(1, k_max + 1):
        best = dp.groupBy("traj").agg(
            F.min(F.struct("cost", "lid", "seg")).alias("b")
        )
        stay = dp.select("traj", "lid", "seg", F.col("cost").alias("pcost"))
        ck = cand.where(F.col("k") == k)
        dpk = (
            ck.join(best, "traj")
            .join(stay, ["traj", "lid", "seg"], "left")
            .selectExpr(
                "traj", "lid", "seg",
                f"emis_mm + least(coalesce(pcost, {_BIG}), b.cost + {P}) as cost",
                f"case when coalesce(pcost, {_BIG}) <= b.cost + {P} "
                "then lid else b.lid end as plid",
                f"case when coalesce(pcost, {_BIG}) <= b.cost + {P} "
                "then seg else b.seg end as pseg",
            )
            .localCheckpoint()
        )
        parents[k] = dpk.select("traj", "lid", "seg", "plid", "pseg")
        carry = dp.join(ck.select("traj").distinct(), "traj", "left_anti")
        dp = dpk.select("traj", "lid", "seg", "cost").unionByName(carry)

    # per-trajectory argmin at its LAST matchable step, then walk parents
    k_last = ks.groupBy("traj").agg(F.max("k").alias("kl"))
    fin = (
        dp.groupBy("traj")
        .agg(F.min(F.struct("cost", "lid", "seg")).alias("m"))
        .join(k_last, "traj")
        .selectExpr("traj", "kl as k", "m.lid as lid", "m.seg as seg")
        .localCheckpoint()
    )
    cur = fin.where(F.col("k") == k_max)
    acc = [cur]
    for k in range(k_max - 1, -1, -1):
        ext = (
            cur.join(parents[k + 1], ["traj", "lid", "seg"])
            .selectExpr("traj", f"{k} as k", "plid as lid", "pseg as seg")
        )
        cur = fin.where(F.col("k") == k).unionByName(ext).localCheckpoint()
        acc.append(cur)
    sel = acc[0]
    for df in acc[1:]:
        sel = sel.unionByName(df)

    out = sel.join(cand, ["traj", "k", "lid", "seg"]).selectExpr(
        f"traj as {traj_id}",
        f"step as {step_col}",
        f"lid as {line_id}",
        "seg as seg_idx",
        "emis_mm",
    )
    # cand is consumed k_max+2 times (per-level filters + the final emis
    # join); caller releases via dedup.unpersist_intermediates
    return _attach_cached(out, [cand])


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
