"""Round-5 batch E (SURVEY §2.3 `(r5)` rows): OSM way-splitting
(routing-topology build) and local Moran / LISA cluster labels.

way_split is the classic OSM routing preprocessing step the reference's
domain implies but its converter never needed (it maps zones, not roads):
split every way at junction nodes — nodes shared by ≥2 ways — so each
output edge is a road segment between decision points.  The road network
here is synthesized deterministically (sparse lattice: horizontal ways
every 3rd row, vertical every 4th column), the same testdata philosophy
as the elevation raster.

Landing discipline as everywhere (LANDING.md): one SQL text both
dialects where syntax allows, exact integer folds (LISA is computed
entirely in scaled integers — no float mean/sd), scalar outputs,
identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import DUCK, SPARK
from .queries_r5d import _grid_bounds


def _views(spark: SparkSession, sf_dir: str) -> None:
    from . import queries as q

    q.register_geometry_views(spark, sf_dir)


# ---------------------------------------------------------------------------
# Way splitting at junctions (routing topology build)
# ---------------------------------------------------------------------------
_WS_H_EVERY = 3  # horizontal way on every 3rd lattice row
_WS_V_EVERY = 4  # vertical way on every 4th lattice column


def _ways_sql(d: str) -> str:
    """(way_id, pos, node_id) rows of the deterministic sparse road
    lattice; node_id packs (ix, iy), way ids disambiguate orientation."""
    ix_lo, ix_hi, iy_lo, iy_hi = _grid_bounds()
    if d == SPARK:
        h = (
            f"select 10000 + iy as way_id, ix - {ix_lo} as pos, "
            f"iy * 100000 + ix as node_id "
            f"from (select explode(sequence({iy_lo}, {iy_hi})) as iy) a, "
            f"(select explode(sequence({ix_lo}, {ix_hi})) as ix) b "
            f"where iy % {_WS_H_EVERY} = 0"
        )
        v = (
            f"select 20000 + ix as way_id, iy - {iy_lo} as pos, "
            f"iy * 100000 + ix as node_id "
            f"from (select explode(sequence({iy_lo}, {iy_hi})) as iy) a, "
            f"(select explode(sequence({ix_lo}, {ix_hi})) as ix) b "
            f"where ix % {_WS_V_EVERY} = 0"
        )
    else:
        h = (
            f"select 10000 + iy as way_id, ix - {ix_lo} as pos, "
            f"iy * 100000 + ix as node_id "
            f"from unnest(generate_series({iy_lo}, {iy_hi})) a(iy), "
            f"unnest(generate_series({ix_lo}, {ix_hi})) b(ix) "
            f"where iy % {_WS_H_EVERY} = 0"
        )
        v = (
            f"select 20000 + ix as way_id, iy - {iy_lo} as pos, "
            f"iy * 100000 + ix as node_id "
            f"from unnest(generate_series({iy_lo}, {iy_hi})) a(iy), "
            f"unnest(generate_series({ix_lo}, {ix_hi})) b(ix) "
            f"where ix % {_WS_V_EVERY} = 0"
        )
    return f"{h} union all {v}"


def _way_split_sql(d: str) -> str:
    """Split every way at junction nodes (nodes on ≥2 ways) into routing
    edges: per way, cut positions are the endpoints plus every junction;
    consecutive cuts bound one edge.  Classic OSM graph-build semantics —
    interior junction nodes terminate one edge and start the next, so
    they appear as both a to_node and the next from_node.

    Scale: one junction aggregate keyed on node_id (map-side-combined;
    the junction set is road-network-sized, broadcastable), one way-keyed
    ordered window for the lead(), one equi-join back for node ids —
    everything partitions by way_id except the node-keyed junction
    count."""
    return f"""
        with ways as ({_ways_sql(d)}),
        junction as (
            select node_id from ways
            group by node_id having count(distinct way_id) >= 2
        ),
        marked as (
            select w.way_id, w.pos, w.node_id,
                   case when j.node_id is not null
                        or w.pos = min(w.pos) over (partition by w.way_id)
                        or w.pos = max(w.pos) over (partition by w.way_id)
                   then 1 else 0 end as cut
            from ways w left join junction j on j.node_id = w.node_id
        ),
        cuts as (
            select way_id, pos, node_id,
                   lead(pos) over (partition by way_id order by pos)
                       as next_pos,
                   lead(node_id) over (partition by way_id order by pos)
                       as next_node,
                   row_number() over (partition by way_id order by pos)
                       as cut_idx
            from marked where cut = 1
        )
        select cast(way_id as bigint) as way_id,
               cast(cut_idx as bigint) as edge_idx,
               cast(node_id as bigint) as from_node,
               cast(next_node as bigint) as to_node,
               cast(next_pos - pos + 1 as bigint) as n_nodes
        from cuts
        where next_pos is not null"""


def q_way_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(_way_split_sql(SPARK))


def q_way_split_oracle() -> str:
    return _way_split_sql(DUCK)


# ---------------------------------------------------------------------------
# Local Moran (LISA) cluster labels over the elevation raster
# ---------------------------------------------------------------------------
def _local_moran_sql(d: str) -> str:
    """Anselin's local Moran statistic per raster cell with HH/LL/HL/LH
    quadrant labels — the LISA map under every hotspot cartogram.
    Computed ENTIRELY in scaled integers: elevations are exact 1e-3
    integers, the centered value is z'_i = v_i·n − Σv (exact bigint), the
    row-standardized spatial lag is (Σ_j z'_j) div n_i (one integer
    division of an exact sum), and I'_i = z'_i · lag'_i — no float mean,
    sd, or fold anywhere, so the labels are bit-exact by construction.

    Scale: one global-moment aggregate (broadcast scalar), one 8-neighbor
    lattice equi-join + map-side-combined sum — the raster_slope shape."""
    from .queries_r5c import _d8_offsets
    from .queries_r5d import _raster

    div = "div" if d == SPARK else "//"
    nb = " union all ".join(
        f"select ix + {dx} as nx, iy + {dy} as ny, ix, iy from ras"
        for _, dx, dy, _ in _d8_offsets()
    )
    return f"""
        with ras0 as ({_raster(d)}),
        ras as (
            select ix, iy,
                   cast(floor(value * 1.0e3 + 0.5e0) as bigint) as v_q3
            from ras0
        ),
        mom as (
            select cast(count(*) as bigint) as n,
                   cast(sum(v_q3) as bigint) as s
            from ras
        ),
        ctr as (
            select ix, iy, v_q3 * (select n from mom) - (select s from mom)
                       as z_scaled
            from ras
        ),
        nbr as ({nb}),
        lag as (
            select c.ix, c.iy,
                   cast(count(*) as bigint) as n_nb,
                   cast(sum(z.z_scaled) as bigint) as z_sum
            from (select nbr.ix, nbr.iy, nbr.nx, nbr.ny from nbr) c
            join ctr z on z.ix = c.nx and z.iy = c.ny
            group by c.ix, c.iy
        )
        select cast(c.ix as bigint) as ix, cast(c.iy as bigint) as iy,
               c.z_scaled,
               cast(l.z_sum {div} l.n_nb as bigint) as lag_scaled,
               cast(c.z_scaled * (l.z_sum {div} l.n_nb) as bigint)
                   as i_scaled,
               case when c.z_scaled > 0 and l.z_sum > 0 then 'HH'
                    when c.z_scaled < 0 and l.z_sum < 0 then 'LL'
                    when c.z_scaled > 0 and l.z_sum < 0 then 'HL'
                    when c.z_scaled < 0 and l.z_sum > 0 then 'LH'
                    else 'NS' end as quad
        from ctr c
        join lag l on l.ix = c.ix and l.iy = c.iy"""


def q_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(_local_moran_sql(SPARK))


def q_local_moran_oracle() -> str:
    return _local_moran_sql(DUCK)


def register_r5e(QUERIES: dict) -> None:
    QUERIES["way_split"] = (q_way_split, q_way_split_oracle)
    QUERIES["local_moran"] = (q_local_moran, q_local_moran_oracle)
