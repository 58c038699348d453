"""Ring validity audit + repair ("make_valid"-lite for the zone pipeline).

The reference marshals zone polygons with NO geometric validation beyond the
NeTEx XSD (`NetexHelper.java:47-49` validates structure, not geometry) — a
malformed OSM way flows straight into the output.  At engine scale, invalid
rings poison every downstream consumer (PIP ray-casts, overlap joins, area
stats), so validity is a first-class audit + repair stage, the same posture
as plans/netex.py's output CHECK DataFrame.

Checks per ring (all pure Catalyst / dual-dialect SQL, oracle-gated):
* closed       — first vertex == last vertex;
* min size     — >= 4 vertex pairs including the closure (a triangle);
* dup vertices — consecutive duplicate points (zero-length edges);
* orientation  — sign of the planar shoelace sum (ccw / cw / degenerate);
  CCW is the engine's canonical exterior-ring form (GeoJSON RFC 7946
  convention), so cw rings audit as invalid and repair re-winds them;
* self-cross   — count of PROPERLY crossing non-adjacent edge pairs (the
  distjoin._seg_cross_exprs convention: endpoint touches and collinear
  overlaps are measure-zero and excluded).  Per-ring O(V²) pair explode —
  V is ring size, bounded and small; the corpus never self-joins.

Repair (deterministic, idempotent):
* drop consecutive duplicate vertices;
* close an open ring by appending the first vertex;
* normalize orientation to CCW (reverse if the signed area is negative).
Self-crossing rings are FLAGGED, not rewritten — untangling changes the
region; that is a modelling decision, not a repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import geo
from ..functions.portable import DUCK, SPARK, element_at, size as asize


def _npts(pl: str, d: str) -> str:
    return f"({asize(pl, d)} div 2)" if d == SPARK else f"({asize(pl, d)} // 2)"


def _closed(pl: str, d: str) -> str:
    n = _npts(pl, d)
    la1, lo1 = element_at(pl, "1", d), element_at(pl, "2", d)
    lan = element_at(pl, f"2*{n} - 1", d)
    lon = element_at(pl, f"2*{n}", d)
    return f"({la1} = {lan} AND {lo1} = {lon})"


def _dedup_pairs(pl: str, d: str) -> str:
    """Vertex-pair array with consecutive duplicates removed (order kept):
    keep pair i if i == 1 or pair i != pair i-1."""
    n = _npts(pl, d)
    la_i, lo_i = element_at(pl, "2*i - 1", d), element_at(pl, "2*i", d)
    la_p, lo_p = element_at(pl, "2*i - 3", d), element_at(pl, "2*i - 2", d)
    keep = f"i = 1 OR NOT ({la_i} = {la_p} AND {lo_i} = {lo_p})"
    if d == SPARK:
        idxs = f"filter(sequence(1, {n}), i -> {keep})"
        return (
            f"flatten(transform({idxs}, i -> array({la_i}, {lo_i})))"
        )
    idxs = f"list_filter(generate_series(1, {n}), i -> {keep})"
    return f"flatten(list_transform({idxs}, i -> [{la_i}, {lo_i}]))"


def ring_validity(
    polys: DataFrame, id_col: str = "zone_id", pos_list: str = "pos_list"
) -> DataFrame:
    """(zone_id, n_vertices, is_closed, n_dup_vertices, orientation,
    n_self_cross, is_valid) — the audit table."""
    cross = geo.poly_cross_sum(pos_list, SPARK)
    n = _npts(pos_list, SPARK)
    dedup_n = f"({asize(_dedup_pairs(pos_list, SPARK), SPARK)} div 2)"
    base = polys.selectExpr(
        id_col,
        pos_list,
        f"cast({n} as bigint) as n_vertices",
        f"{_closed(pos_list, SPARK)} as is_closed",
        f"cast({n} - {dedup_n} as bigint) as n_dup_vertices",
        f"case when {cross} > 0.0e0 then 'ccw' "
        f"when {cross} < 0.0e0 then 'cw' else 'degenerate' end as orientation",
    )
    sx = self_cross_counts(polys, id_col, pos_list)
    out = base.join(sx, id_col, "left").selectExpr(
        id_col,
        "n_vertices",
        "is_closed",
        "n_dup_vertices",
        "orientation",
        "cast(coalesce(n_self_cross, 0) as bigint) as n_self_cross",
        "is_closed AND n_dup_vertices = 0 AND n_vertices >= 4 "
        "AND orientation = 'ccw' "
        "AND coalesce(n_self_cross, 0) = 0 as is_valid",
    )
    return out


def self_cross_counts(
    polys: DataFrame, id_col: str = "zone_id", pos_list: str = "pos_list"
) -> DataFrame:
    """(id, n_self_cross): properly-crossing NON-ADJACENT edge pairs per
    ring (adjacent edges share an endpoint — excluded by the proper-crossing
    predicate anyway, but also by the j > i+1 index filter, which keeps the
    closure edge from pairing with the first edge)."""
    from .distjoin import _seg_cross_exprs

    n = _npts(pos_list, SPARK)
    segs = polys.selectExpr(
        id_col, pos_list, f"explode(sequence(1, {n} - 1)) as i"
    ).selectExpr(
        id_col,
        pos_list,
        "i",
        f"{element_at(pos_list, '2*i - 1', SPARK)} as ay1",
        f"{element_at(pos_list, '2*i', SPARK)} as ax1",
        f"{element_at(pos_list, '2*i + 1', SPARK)} as ay2",
        f"{element_at(pos_list, '2*i + 2', SPARK)} as ax2",
    )
    pairs = (
        segs.selectExpr(
            id_col, "i", "ay1", "ax1", "ay2", "ax2",
            # Spark sequence(a, b) DESCENDS when a > b (it is never empty):
            # the j-range filter below restores the empty-range semantics
            f"explode(sequence(i + 2, {n} - 1)) as j",
            f"{pos_list} as __pl",
        )
        .where(F.expr(f"j >= i + 2 AND j <= {_npts('__pl', SPARK)} - 1"))
        .selectExpr(
            id_col, "i", "j", "ay1", "ax1", "ay2", "ax2",
            f"{element_at('__pl', '2*j - 1', SPARK)} as by1",
            f"{element_at('__pl', '2*j', SPARK)} as bx1",
            f"{element_at('__pl', '2*j + 1', SPARK)} as by2",
            f"{element_at('__pl', '2*j + 2', SPARK)} as bx2",
        )
    )
    pred, _, _ = _seg_cross_exprs("a", "b")
    crossed = pairs.where(pred)
    # wrap-adjacency: the (first, closure) edge pair shares the ring's
    # first/last vertex; the proper-crossing predicate rejects endpoint
    # touches, so that pair can never count — no extra filter needed.
    return crossed.groupBy(id_col).agg(F.count("*").alias("n_self_cross"))


def repair_rings(
    polys: DataFrame, id_col: str = "zone_id", pos_list: str = "pos_list"
) -> DataFrame:
    """(zone_id, pos_list) with consecutive duplicates dropped, the ring
    closed, and orientation normalized to CCW.  Idempotent: running it on
    its own output is the identity."""
    dedup = _dedup_pairs(pos_list, SPARK)
    staged = polys.selectExpr(id_col, f"{dedup} as __pl")
    n = _npts("__pl", SPARK)
    la1, lo1 = element_at("__pl", "1", SPARK), element_at("__pl", "2", SPARK)
    lan = element_at("__pl", f"2*{n} - 1", SPARK)
    lon = element_at("__pl", f"2*{n}", SPARK)
    closed = staged.selectExpr(
        id_col,
        f"case when {la1} = {lan} AND {lo1} = {lon} then __pl "
        f"else concat(__pl, array({la1}, {lo1})) end as __pl",
    )
    cross = geo.poly_cross_sum("__pl", SPARK)
    n2 = _npts("__pl", SPARK)
    rev = (
        f"flatten(transform(sequence({n2}, 1, -1), i -> "
        f"array({element_at('__pl', '2*i - 1', SPARK)}, {element_at('__pl', '2*i', SPARK)})))"
    )
    return closed.selectExpr(
        id_col,
        f"case when {cross} < 0.0e0 then {rev} else __pl end as {pos_list}",
    )


def ring_validity_oracle_sql(
    polys_sql_text: str, id_col: str = "zone_id", pos_list: str = "pos_list"
) -> str:
    """DuckDB replay of the audit (same predicates, same conventions)."""
    from .distjoin import _seg_cross_exprs

    d = DUCK
    cross = geo.poly_cross_sum(pos_list, d)
    n = _npts(pos_list, d)
    dedup_n = f"({asize(_dedup_pairs(pos_list, d), d)} // 2)"
    pred, _, _ = _seg_cross_exprs("a", "b")
    e = lambda idx: element_at(pos_list, idx, d)  # noqa: E731
    return f"""
        with polys as ({polys_sql_text}),
        base as (
            select {id_col}, {pos_list},
                   cast({n} as bigint) as n_vertices,
                   {_closed(pos_list, d)} as is_closed,
                   cast({n} - {dedup_n} as bigint) as n_dup_vertices,
                   case when {cross} > 0.0e0 then 'ccw'
                        when {cross} < 0.0e0 then 'cw'
                        else 'degenerate' end as orientation
            from polys
        ),
        segs as (
            select {id_col}, {pos_list}, t.i,
                   {e('2*t.i - 1')} as ay1, {e('2*t.i')} as ax1,
                   {e('2*t.i + 1')} as ay2, {e('2*t.i + 2')} as ax2
            from polys, unnest(generate_series(1, {n} - 1)) t(i)
        ),
        pairs as (
            select s.{id_col}, s.i, u.j, s.ay1, s.ax1, s.ay2, s.ax2,
                   {element_at(f's.{pos_list}', '2*u.j - 1', d)} as by1,
                   {element_at(f's.{pos_list}', '2*u.j', d)} as bx1,
                   {element_at(f's.{pos_list}', '2*u.j + 1', d)} as by2,
                   {element_at(f's.{pos_list}', '2*u.j + 2', d)} as bx2
            from segs s,
                 unnest(generate_series(s.i + 2, {_npts(f's.{pos_list}', d)} - 1)) u(j)
        ),
        sx as (
            select {id_col}, count(*) as n_self_cross
            from pairs where {pred} group by {id_col}
        )
        select b.{id_col}, b.n_vertices, b.is_closed, b.n_dup_vertices,
               b.orientation,
               cast(coalesce(sx.n_self_cross, 0) as bigint) as n_self_cross,
               b.is_closed AND b.n_dup_vertices = 0 AND b.n_vertices >= 4
               AND b.orientation = 'ccw'
               AND coalesce(sx.n_self_cross, 0) = 0 as is_valid
        from base b left join sx on sx.{id_col} = b.{id_col}"""


def repair_rings_oracle_sql(
    polys_sql_text: str, id_col: str = "zone_id", pos_list: str = "pos_list"
) -> str:
    """DuckDB replay of repair_rings (dedup → close → normalize to CCW),
    emitting the repaired ring as a comma-joined string (driver-hashable)."""
    d = DUCK
    dedup = _dedup_pairs(pos_list, d)
    n = "(len(__pl) // 2)"
    la1, lo1 = element_at("__pl", "1", d), element_at("__pl", "2", d)
    lan = element_at("__pl", f"2*{n} - 1", d)
    lon = element_at("__pl", f"2*{n}", d)
    cross = geo.poly_cross_sum("__pl", d)
    rev = (
        f"flatten(list_transform(generate_series({n}, 1, -1), i -> "
        f"[{element_at('__pl', '2*i - 1', d)}, {element_at('__pl', '2*i', d)}]))"
    )
    return f"""
        with polys as ({polys_sql_text}),
        dd as (select {id_col}, {dedup} as __pl from polys),
        cl as (
            select {id_col},
                   case when {la1} = {lan} AND {lo1} = {lon} then __pl
                        else list_concat(__pl, [{la1}, {lo1}]) end as __pl
            from dd
        )
        select {id_col},
               array_to_string(case when {cross} < 0.0e0 then {rev} else __pl end, ',')
               as ring_str
        from cl"""
