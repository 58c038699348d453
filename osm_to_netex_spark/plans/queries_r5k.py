"""Round-5 batch K (SURVEY §2.3 `(r5)` rows): Strahler stream order and
watershed basin labeling — completing the hydrology family over the D8
drainage forest (flow_dir → flow_accum → strahler/watershed).

Landing discipline as everywhere (LANDING.md): pure-integer iterative
operators (Spark: K localCheckpoint-bounded rounds; DuckDB oracle: the
same rounds unrolled as AS MATERIALIZED CTEs — the cost_distance
lesson), scalar outputs, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK
from .queries_r5c import _flow_dir_sql, _flow_edges_sql


def _views(spark: SparkSession, sf_dir: str) -> None:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)


# ---------------------------------------------------------------------------
# Strahler stream order (leaf-up settlement rounds)
# ---------------------------------------------------------------------------
_ST_ROUNDS = 24  # ≥ the drainage forest's height on the bounded raster;
# at DEM scale the round count is the basin's longest-path depth


def _st_round_sql(edges: str, prev: str) -> str:
    """One settlement round: nodes whose upstream children are ALL
    ordered receive order max(child) + (≥2 children at that max) — the
    Strahler rule as two grouped joins, no window."""
    return f"""
        select ix, iy, o from {prev}
        union
        select a.ix, a.iy,
               a.mx + (case when c.cmax >= 2 then 1 else 0 end) as o
        from (
            select e.dst_ix as ix, e.dst_iy as iy,
                   count(*) as nc, count(o.o) as no, max(o.o) as mx
            from {edges} e
            left join {prev} o on o.ix = e.src_ix and o.iy = e.src_iy
            group by e.dst_ix, e.dst_iy
        ) a
        join (
            select e.dst_ix as ix, e.dst_iy as iy, o.o, count(*) as cmax
            from {edges} e
            join {prev} o on o.ix = e.src_ix and o.iy = e.src_iy
            group by e.dst_ix, e.dst_iy, o.o
        ) c on c.ix = a.ix and c.iy = a.iy and c.o = a.mx
        where a.nc = a.no
          and not exists (select 1 from {prev} p
                          where p.ix = a.ix and p.iy = a.iy)"""


_ST_LEAVES = (
    "select f.ix, f.iy, cast(1 as bigint) as o from fdir f "
    "where not exists (select 1 from e0 e "
    "where e.dst_ix = f.ix and e.dst_iy = f.iy)"
)


def q_strahler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ix, iy, strahler_order): Strahler stream order over the D8
    drainage forest — leaves (no upstream cell) are order 1; a cell's
    order is its children's max, +1 when ≥2 children tie at that max.
    K leaf-up settlement rounds (K ≥ forest height) order every cell;
    each round settles exactly the frontier whose children are all
    ordered, so the fixpoint is reached monotonically with pure-integer
    decisions.

    Scale: each round is two grouped equi-joins on the lattice key over
    the (sparse) unsettled frontier — the sssp round discipline with a
    leaf-up direction; localCheckpoint bounds the plan per round."""
    _views(spark, sf_dir)
    spark.sql(f"with {_flow_dir_sql(SPARK)} select ix, iy, flow_dir from fdir").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("fdir")
    spark.sql(_flow_edges_sql(SPARK)).localCheckpoint(
        eager=False
    ).createOrReplaceTempView("e0")
    cur = spark.sql(_ST_LEAVES)
    for t in range(_ST_ROUNDS):
        cur.localCheckpoint(eager=False).createOrReplaceTempView(f"__st_{t}")
        cur = spark.sql(_st_round_sql("e0", f"__st_{t}"))
    return cur.selectExpr(
        "cast(ix as bigint) as ix",
        "cast(iy as bigint) as iy",
        "cast(o as bigint) as strahler_order",
    )


def q_strahler_oracle() -> str:
    ctes = [
        f"{_flow_dir_sql(DUCK)}",
        f"e0 as materialized ({_flow_edges_sql(DUCK)})",
        f"s0 as materialized ({_ST_LEAVES})",
    ]
    for t in range(_ST_ROUNDS):
        ctes.append(
            f"s{t + 1} as materialized ({_st_round_sql('e0', f's{t}')})"
        )
    return (
        "with " + ", ".join(ctes)
        + f" select cast(ix as bigint) as ix, cast(iy as bigint) as iy, "
        f"cast(o as bigint) as strahler_order from s{_ST_ROUNDS}"
    )


# ---------------------------------------------------------------------------
# Watershed labeling (terminal-sink root via pointer doubling)
# ---------------------------------------------------------------------------
_WS_ROUNDS = 8  # 2^8 ≥ any drainage path on the bounded raster


def _ws_round_sql(prev: str) -> str:
    # pointer doubling on a functional graph: root pointers jump 2^t steps
    return f"""
        select a.ix, a.iy,
               coalesce(b.rx, a.rx) as rx, coalesce(b.ry, a.ry) as ry
        from {prev} a
        left join {prev} b on b.ix = a.rx and b.iy = a.ry"""


def q_watershed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ix, iy, basin_ix, basin_iy): the terminal sink (pit or raster
    edge) each cell drains to — watershed delineation of the D8 forest.
    Pointer doubling: each round the root pointer jumps twice as far, so
    ⌈log₂ L⌉ rounds resolve every cell to its basin terminal; cells whose
    pointer already rests on a terminal (no outgoing edge) keep it via
    the left-join coalesce.

    Scale: one self-equi-join per round on the lattice key — O(n) rows
    per round, log rounds total, localCheckpoint-bounded: the watershed
    transform at DEM scale without any per-path walk."""
    _views(spark, sf_dir)
    spark.sql(f"with {_flow_dir_sql(SPARK)} select ix, iy, flow_dir from fdir").localCheckpoint(
        eager=False
    ).createOrReplaceTempView("fdir")
    edges = spark.sql(_flow_edges_sql(SPARK)).localCheckpoint(eager=False)
    edges.createOrReplaceTempView("__ws_e")
    cur = spark.sql("""
        select f.ix, f.iy,
               coalesce(e.dst_ix, f.ix) as rx, coalesce(e.dst_iy, f.iy) as ry
        from fdir f
        left join __ws_e e on e.src_ix = f.ix and e.src_iy = f.iy""")
    for t in range(_WS_ROUNDS):
        cur.localCheckpoint(eager=False).createOrReplaceTempView(f"__ws_{t}")
        cur = spark.sql(_ws_round_sql(f"__ws_{t}"))
    return cur.selectExpr(
        "cast(ix as bigint) as ix",
        "cast(iy as bigint) as iy",
        "cast(rx as bigint) as basin_ix",
        "cast(ry as bigint) as basin_iy",
    )


def q_watershed_oracle() -> str:
    """Recursive-CTE walk down each cell's drainage pointers to the
    terminal — the closure the doubling rounds compute."""
    return f"""
        with recursive {_flow_dir_sql(DUCK)},
        e as materialized ({_flow_edges_sql(DUCK)}),
        walk(ix, iy, cx, cy) as (
            select f.ix, f.iy, f.ix, f.iy from fdir f
            union all
            select w.ix, w.iy, e.dst_ix, e.dst_iy
            from walk w join e on e.src_ix = w.cx and e.src_iy = w.cy
        ),
        term as (
            select w.ix, w.iy, w.cx, w.cy from walk w
            where not exists (select 1 from e
                              where e.src_ix = w.cx and e.src_iy = w.cy)
        )
        select cast(ix as bigint) as ix, cast(iy as bigint) as iy,
               cast(cx as bigint) as basin_ix, cast(cy as bigint) as basin_iy
        from term"""


def register_r5k(QUERIES: dict) -> None:
    QUERIES["strahler"] = (q_strahler, q_strahler_oracle)
    QUERIES["watershed"] = (q_watershed, q_watershed_oracle)
