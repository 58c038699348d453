"""Geofence transition semantics: enter/exit/switch emission, no-change
silence, first-fix-inside enter, overlapping-zone min rule, and partition
invariance."""

from osm_to_netex_spark.operators import trajectory


def _sq(lat, lon, half):
    return [
        lat - half, lon - half,
        lat - half, lon + half,
        lat + half, lon + half,
        lat + half, lon - half,
        lat - half, lon - half,
    ]


def _polys(spark, rows):
    return spark.createDataFrame(rows, "zone_id bigint, pos_list array<double>")


def _fixes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, eps double, lat double, lon double"
    )


def _run(spark, fixes, polys):
    out = trajectory.geofence_events(_fixes(spark, fixes), _polys(spark, polys)).collect()
    return sorted(((r.user_id, r.event_id, r.prev_zone, r.zone, r.kind) for r in out))


def test_enter_exit_switch_sequence(spark):
    polys = [(1, _sq(60.0, 10.0, 0.01)), (2, _sq(60.05, 10.0, 0.01))]
    fixes = [
        (1, 1, 0.0, 59.9, 10.0),    # outside -> nothing
        (1, 2, 10.0, 60.0, 10.0),   # enter zone 1
        (1, 3, 20.0, 60.001, 10.0), # still zone 1 -> silent
        (1, 4, 30.0, 60.05, 10.0),  # switch to zone 2
        (1, 5, 40.0, 59.9, 10.0),   # exit
        (1, 6, 50.0, 60.05, 10.0),  # re-enter zone 2
    ]
    assert _run(spark, fixes, polys) == [
        (1, 2, -1, 1, "enter"),
        (1, 4, 1, 2, "switch"),
        (1, 5, 2, -1, "exit"),
        (1, 6, -1, 2, "enter"),
    ]


def test_first_fix_inside_emits_enter_and_overlap_takes_min_zone(spark):
    polys = [(7, _sq(60.0, 10.0, 0.02)), (3, _sq(60.0, 10.0, 0.01))]  # nested
    fixes = [(1, 1, 0.0, 60.0, 10.0), (1, 2, 10.0, 60.0005, 10.0)]
    # inside both zones -> min zone_id = 3; second fix unchanged -> silent
    assert _run(spark, fixes, polys) == [(1, 1, -1, 3, "enter")]


def test_users_are_independent(spark):
    polys = [(1, _sq(60.0, 10.0, 0.01))]
    fixes = [
        (1, 1, 0.0, 60.0, 10.0),
        (2, 2, 5.0, 59.9, 10.0),
        (2, 3, 15.0, 60.0, 10.0),
    ]
    assert _run(spark, fixes, polys) == [
        (1, 1, -1, 1, "enter"),
        (2, 3, -1, 1, "enter"),
    ]


def test_partition_invariance(spark):
    polys = [(1, _sq(60.0, 10.0, 0.01)), (2, _sq(60.05, 10.0, 0.01))]
    fixes = []
    for i in range(36):
        lat = [59.9, 60.0, 60.05][i % 3]
        fixes.append((1 + i % 4, i, float(i), lat, 10.0))
    f = _fixes(spark, fixes)
    p = _polys(spark, polys)
    a = sorted(map(tuple, trajectory.geofence_events(f, p).collect()))
    b = sorted(
        map(tuple, trajectory.geofence_events(f.repartition(7), p).collect())
    )
    assert a == b and len(a) > 10
