"""ST-DBSCAN: the Birant–Kut spatio-temporal neighbor predicate on the
dbscan machinery — same-place different-time points must NOT chain, and
with an infinite time band the result must equal plain DBSCAN."""

from osm_to_netex_spark.operators import clustering

DAY = 86400

# two visits to the SAME 4-point blob a week apart, plus spatial noise
VISIT_1 = [(i, 0.0 + 0.002 * i, 0.0, 0 * DAY) for i in range(4)]        # ids 0-3
VISIT_2 = [(10 + i, 0.0 + 0.002 * i, 0.0, 7 * DAY) for i in range(4)]   # ids 10-13
LONER = [(99, 5.0, 5.0, 0)]


def _run(spark, eps_t_s, repartition=None):
    pts = spark.createDataFrame(
        VISIT_1 + VISIT_2 + LONER, ["point_id", "lat", "lon", "t_s"]
    )
    if repartition:
        pts = pts.repartition(repartition)
    return clustering.st_dbscan(
        pts, eps_m=1500.0, eps_t_s=eps_t_s, min_pts=4, res=14
    )


def test_time_band_splits_revisits(spark):
    got = {r.point_id: (r.cluster, r.kind) for r in _run(spark, eps_t_s=DAY).collect()}
    # within a visit: 4 points within eps and within the band → core
    assert all(got[i] == (0, "core") for i in range(4))
    assert all(got[i] == (10, "core") for i in range(10, 14))
    assert got[99] == (-1, "noise")


def test_infinite_band_equals_plain_dbscan(spark):
    wide = {tuple(r) for r in _run(spark, eps_t_s=10**9).collect()}
    pts = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in VISIT_1 + VISIT_2 + LONER],
        ["point_id", "lat", "lon"],
    )
    plain = {
        tuple(r)
        for r in clustering.dbscan(pts, eps_m=1500.0, min_pts=4, res=14).collect()
    }
    assert wide == plain


def test_partition_invariant(spark):
    a = {tuple(r) for r in _run(spark, eps_t_s=DAY).collect()}
    b = {tuple(r) for r in _run(spark, eps_t_s=DAY, repartition=7).collect()}
    assert a == b
