"""Distributed 2-D convex hull (per group), exact over integer coordinates.

The geometry sibling of the skyline operator: zone footprints, coverage
outlines, and bounding geometries for tile/PIP pre-filters all start from
"the convex hull of this group's points".  The reference has no hull (its
polygons arrive pre-drawn, `OsmToNetexMapper.java:251-267`); a spatial
engine replacing it needs one.

Definition used (strict hull): a point p of the distinct point set S is an
upper-hull vertex iff no chord (a, b) of per-x representatives spans it
with p on or below the chord — ``cross(a, b, p) <= 0`` where
``cross = (bx-ax)(py-ay) - (by-ay)(px-ax)``.  Collinear envelope points are
NOT vertices.  Lower hull is the same test on (x, -y).  Coordinates must be
integers (quantize first): every cross product is exact int64 arithmetic,
so the result is bit-identical across engines and partitionings.

Scale design — the textbook monotone chain is a sequential stack and the
brute characterization is O(n³); this plan is two linear scans plus
output-sensitive refinement:

* **Per-x reduce first.** Only the max-y point per (group, x) can be an
  upper-hull vertex: one map-side-combined aggregate collapses 10^12 rows
  to the x-value domain.
* **Summary-envelope prune.** Fixed-width x-buckets per group; each
  bucket's max-y point is a REAL data point, so any point strictly below a
  chord of two such points is provably not a hull vertex.  The bucket
  summary (<= n_buckets rows/group) gets its own upper hull via the brute
  test (tiny), consecutive vertices become envelope segments, and segments
  are exploded to the buckets they span — each point then anti-joins at
  most a couple of candidate segments on (group, bucket): hash join, no
  cartesian, corpus scanned once.
* **Exact refine on survivors.** Hull vertices are never strictly below
  any real-point chord, so all survive the prune; survivors k per group
  ~ hull size + collinear envelope points.  The O(k³) chord test runs as a
  group-keyed self-join — output-sensitive, independent of n.  (Adversarial
  inputs with *every* point on a circle keep k = n; recurse with finer
  buckets if that corpus exists.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

def _cross(pre: str, px: str, py: str) -> str:
    """Integer orientation of p vs chord a->b, columns prefixed ``pre.``."""
    ax, ay, bx, by = (f"{pre}.{c}" for c in ("ax", "ay", "bx", "by"))
    return f"({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax})"


def _upper_vertices(
    pts: DataFrame, n_buckets: int
) -> DataFrame:
    """Upper-hull vertices of (grp, x, y) integer points."""
    # per-x representative: only the max-y point per x can be on the upper hull
    reps = pts.groupBy("__hgrp", "x").agg(F.max("y").alias("y"))
    ext = reps.groupBy("__hgrp").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    # integer-exact bucket id in [0, n_buckets): ((x-lo)*B) div (hi-lo+1)
    bkt = f"cast(((x - lo) * {n_buckets}) div (hi - lo + 1) as int)"
    reps = reps.join(F.broadcast(ext), "__hgrp").selectExpr(
        "__hgrp", "x", "y", "lo", "hi", f"{bkt} as bkt"
    )
    # bucket summary: the (max y, then max x) point per bucket — a real point
    summ = (
        reps.groupBy("__hgrp", "bkt")
        .agg(F.max(F.struct("y", "x")).alias("p"))
        .selectExpr("__hgrp", "p.x as x", "p.y as y")
    )

    def _anti_chords(cand: DataFrame, chord_src: DataFrame, strict_cross: bool) -> DataFrame:
        """cand rows with NO chord of chord_src spanning them on-or-below
        (``cross <= 0``; ``< 0`` when strict_cross) — all frames re-aliased
        so derived self-joins stay unambiguous."""
        a = chord_src.selectExpr("__hgrp as cg", "x as ax", "y as ay")
        b = chord_src.selectExpr("__hgrp as cg2", "x as bx", "y as by")
        chords = a.join(b, [F.col("cg") == F.col("cg2"), F.col("ax") < F.col("bx")]).drop("cg2")
        op = "<" if strict_cross else "<="
        return cand.alias("p").join(
            chords.alias("c"),
            F.expr(
                f"p.__hgrp = c.cg AND c.ax < p.x AND p.x < c.bx AND "
                f"({_cross('c', 'p.x', 'p.y')}) {op} 0"
            ),
            "left_anti",
        )

    # upper hull OF THE SUMMARY via the brute chord test (<= B rows/group)
    sverts = _anti_chords(summ, summ, strict_cross=False)
    # consecutive summary-hull vertices -> envelope segments
    w = Window.partitionBy("__hgrp").orderBy("x")
    segs = (
        sverts.select(
            "__hgrp",
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.lead("x").over(w).alias("bx"),
            F.lead("y").over(w).alias("by"),
        )
        .where(F.col("bx").isNotNull())
    )
    # explode each segment to the buckets its x-range spans (tiny table)
    segs = segs.join(F.broadcast(ext), "__hgrp").selectExpr(
        "__hgrp as sg", "ax", "ay", "bx", "by",
        f"explode(sequence(cast(((ax - lo) * {n_buckets}) div (hi - lo + 1) as int), "
        f"cast(((bx - lo) * {n_buckets}) div (hi - lo + 1) as int))) as sbkt",
    )
    # prune: a point STRICTLY below a real-point chord is not a hull vertex
    surv = reps.alias("p").join(
        segs.alias("s"),
        F.expr(
            "p.__hgrp = s.sg AND p.bkt = s.sbkt AND s.ax <= p.x AND p.x <= s.bx "
            f"AND ({_cross('s', 'p.x', 'p.y')}) < 0"
        ),
        "left_anti",
    ).select("__hgrp", "x", "y")
    # exact refine over the k survivors (hull vertices all survived: a hull
    # vertex is never strictly below a chord of real points)
    return _anti_chords(surv, surv, strict_cross=False).select("__hgrp", "x", "y")


def convex_hull(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    n_buckets: int = 64,
) -> DataFrame:
    """Strict convex-hull vertices per group.

    Returns (group cols..., x, y, on_upper, on_lower).  ``x_col``/``y_col``
    must be integer-typed (quantize floats first) so the orientation tests
    are exact.  A vertex shared by both chains (the x-extremes) carries both
    flags.
    """
    grp = (
        F.concat_ws("", *[F.col(c).cast("string") for c in group_cols])
        if group_cols
        else F.lit("_")
    )
    base = df.select(
        grp.alias("__hgrp"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        *[F.col(c) for c in group_cols],
    )
    keys = base.select("__hgrp", *group_cols).distinct()
    pts = base.select("__hgrp", "x", "y")
    up = _upper_vertices(pts, n_buckets).withColumn("on_upper", F.lit(True))
    lo = (
        _upper_vertices(
            pts.select("__hgrp", "x", (-F.col("y")).alias("y")), n_buckets
        )
        .select("__hgrp", "x", (-F.col("y")).alias("y"))
        .withColumn("on_lower", F.lit(True))
    )
    both = up.join(lo, ["__hgrp", "x", "y"], "full_outer").select(
        "__hgrp",
        "x",
        "y",
        F.coalesce("on_upper", F.lit(False)).alias("on_upper"),
        F.coalesce("on_lower", F.lit(False)).alias("on_lower"),
    )
    if group_cols:
        return both.join(F.broadcast(keys), "__hgrp").select(
            *group_cols, "x", "y", "on_upper", "on_lower"
        )
    return both.drop("__hgrp")


def hull_oracle_sql(
    points_sql: str,
    x_expr: str,
    y_expr: str,
    group_expr: str,
) -> str:
    """Brute DuckDB replay of the same strict-hull characterization.

    O(n^3) per group — per-x reps (max y for the upper side, min y for the
    lower), then NOT EXISTS a spanning chord with the candidate on-or-below
    (``cross <= 0``, upper) / on-or-above (``cross >= 0``, lower — the sign
    flip IS the y-negation).  Identical integer cross products => bit-exact
    agreement with the distributed plan.
    """

    def side(reps: str, op: str) -> str:
        return f"""
        select grp, x, y from {reps} p
        where not exists (
            select 1 from {reps} a, {reps} b
            where a.grp = p.grp and b.grp = p.grp
              and a.x < p.x and p.x < b.x
              and (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) {op} 0
        )"""

    return f"""
        with pts as (
            select {group_expr} as grp,
                   cast({x_expr} as bigint) as x,
                   cast({y_expr} as bigint) as y
            from ({points_sql}) src
        ),
        ru as (select grp, x, max(y) as y from pts group by grp, x),
        rl as (select grp, x, min(y) as y from pts group by grp, x),
        up as ({side("ru", "<=")}),
        lo as ({side("rl", ">=")})
        select coalesce(up.grp, lo.grp) as grp,
               coalesce(up.x, lo.x) as x,
               coalesce(up.y, lo.y) as y,
               up.x is not null as on_upper,
               lo.x is not null as on_lower
        from up full outer join lo
          on up.grp = lo.grp and up.x = lo.x and up.y = lo.y
    """
