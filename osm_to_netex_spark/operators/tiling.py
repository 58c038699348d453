"""Tile-assign operators: hex ("H3-style") and quad ("S2-style") indexes.

North-rule operators (SURVEY §2.2): assign points and polygon documents to
hierarchical cells, build (cell, id) index tables, expand k-rings.  All cell
math is Catalyst-native (functions.geo) — the hot path never leaves the JVM.

Scale notes:
* index tables are produced pre-partitioned by cell via repartitionByRange —
  downstream cell-equi-joins reuse the partitioning instead of reshuffling;
* explode(cover) fan-out is bounded: bbox covers at res 7–9 of city-sized
  polygons are 10²–10³ cells; AQE splits any skewed cell at join time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import geo
from ..functions.portable import SPARK


def assign_point_cells(
    points: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    resolutions: tuple[int, ...] = (7, 8, 9),
    scheme: str = "hex",
) -> DataFrame:
    """Add cell_r{res} columns for each resolution (projection only, no
    shuffle).  Hex goes through the staged-intermediate builder — the inline
    expression tree duplicates the cube-rounding subtrees and measures ~40%
    slower (functions.geo.hex_cells_staged)."""
    if scheme == "hex":
        out, names = geo.hex_cells_staged(points, lat, lon, resolutions)
        for r, n in zip(resolutions, names):
            out = out.withColumnRenamed(n, f"cell_r{r}")
        return out
    out = points
    for r in resolutions:
        out = out.withColumn(f"cell_r{r}", F.expr(geo.quad_cell(lat, lon, r, SPARK)))
    return out


def polyfill(
    polys: DataFrame,
    pos_list: str = "pos_list",
    resolutions: tuple[int, ...] = (7, 8, 9),
    scheme: str = "hex",
) -> DataFrame:
    """Add cells_r{res} array columns covering each polygon (bbox cover —
    conservative superset; see functions.geo.quad_cover_bbox docstring)."""
    fn = geo.hex_cover_bbox if scheme == "hex" else geo.quad_cover_bbox
    out = polys
    for r in resolutions:
        out = out.withColumn(f"cells_r{r}", F.expr(fn(pos_list, r, SPARK)))
    return out


def cell_index(
    polys: DataFrame,
    id_col: str,
    res: int,
    scheme: str = "hex",
    pos_list: str = "pos_list",
    range_partition: bool = True,
) -> DataFrame:
    """(cell, id) index table: one row per covering cell per polygon.

    range-partitioned by cell so PIP/kNN joins against it co-locate without a
    fresh shuffle (SURVEY §2.2 repartitionByRange mandate).
    """
    fn = geo.hex_cover_bbox if scheme == "hex" else geo.quad_cover_bbox
    idx = polys.select(
        F.col(id_col), F.explode(F.expr(fn(pos_list, res, SPARK))).alias("cell")
    )
    if range_partition:
        idx = idx.repartitionByRange("cell")
    return idx


def kring(cells: DataFrame, cell_col: str, res: int, k: int, scheme: str = "hex") -> DataFrame:
    """Explode each cell into its k-ring (cell_col → ring_cell)."""
    fn = geo.hex_kring if scheme == "hex" else geo.quad_kring
    return cells.withColumn("ring_cell", F.explode(F.expr(fn(cell_col, res, k, SPARK))))


def document_tile_assign(
    documents_nodes: DataFrame,
    resolutions: tuple[int, ...] = (7, 8, 9),
) -> DataFrame:
    """Per-document tile assignment: every osm_node span's point → hex+quad
    cells per resolution, collected per doc (tile_assign_expected shape,
    FIXTURES.md §5).

    Input: extract.extract_nodes output (doc_id, lat, lon, …).
    Output: (doc_id, res, h3_cells, s2_cells) with sorted distinct cells.
    """
    out = None
    for r in resolutions:
        per_res = (
            documents_nodes.select(
                "doc_id",
                F.lit(r).alias("res"),
                F.expr(geo.hex_cell("lat", "lon", r, SPARK)).alias("hc"),
                F.expr(geo.quad_cell("lat", "lon", r, SPARK)).alias("qc"),
            )
            .groupBy("doc_id", "res")
            .agg(
                F.array_sort(F.collect_set("hc")).alias("h3_cells"),
                F.array_sort(F.collect_set("qc")).alias("s2_cells"),
            )
        )
        out = per_res if out is None else out.unionByName(per_res)
    return out
