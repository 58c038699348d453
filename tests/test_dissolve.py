"""Polygon dissolve semantics: transitive overlap grouping (a chain A-B-C
collapses even though A and C are disjoint), isolated polygons as singleton
components, envelope/area rollups, and partition invariance."""

from osm_to_netex_spark.operators import overlap


def _sq(lat, lon, half):
    # closed CCW square ring packed [lat0,lon0,...]
    return [
        lat - half, lon - half,
        lat - half, lon + half,
        lat + half, lon + half,
        lat + half, lon - half,
        lat - half, lon - half,
    ]


def _polys(spark, rows):
    return spark.createDataFrame(rows, "zone_id bigint, pos_list array<double>")


def test_chain_dissolves_transitively_and_isolated_is_singleton(spark):
    rows = [
        (1, _sq(60.00, 10.00, 0.010)),   # A overlaps B
        (2, _sq(60.015, 10.00, 0.010)),  # B overlaps A and C
        (3, _sq(60.030, 10.00, 0.010)),  # C overlaps B only (A,C disjoint)
        (4, _sq(60.50, 10.50, 0.010)),   # isolated
    ]
    out = {r.component: r for r in overlap.dissolve(_polys(spark, rows), res=12).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_polys == 3 and out[4].n_polys == 1
    # envelope of the chain spans all three squares
    assert abs(out[1].lat_lo - 59.99) < 1e-9
    assert abs(out[1].lat_hi - 60.04) < 1e-9
    # area: three squares of (0.02)^2 deg2, quantized at 1e12
    assert out[1].area_q == 3 * round(0.02 * 0.02 * 1e12)
    assert out[4].area_q == round(0.02 * 0.02 * 1e12)


def test_containment_counts_as_overlap(spark):
    rows = [
        (1, _sq(60.0, 10.0, 0.02)),
        (2, _sq(60.0, 10.0, 0.005)),  # fully inside 1: no edge crossing
    ]
    out = overlap.dissolve(_polys(spark, rows), res=12).collect()
    assert len(out) == 1 and out[0].component == 1 and out[0].n_polys == 2


def test_partition_invariance(spark):
    rows = [
        (i, _sq(60.0 + (i % 7) * 0.018, 10.0 + (i // 7) * 0.05, 0.010))
        for i in range(1, 22)
    ]
    df = _polys(spark, rows)
    a = sorted(map(tuple, overlap.dissolve(df, res=12).collect()))
    b = sorted(map(tuple, overlap.dissolve(df.repartition(5), res=12).collect()))
    assert a == b and len(a) < 21  # some components merged
