"""DBSCAN: constructed blob/chain/noise geometry + partition invariance."""

from osm_to_netex_spark.operators import clustering


# ~1e-2 deg ≈ 1.1 km; eps 1.5 km links within-blob points, not across blobs
BLOB_A = [(i, 0.0 + 0.002 * i, 0.0) for i in range(4)]          # ids 0-3
BLOB_B = [(10 + i, 0.5 + 0.002 * i, 0.5) for i in range(4)]     # ids 10-13
LONER = [(99, 5.0, 5.0)]                                        # noise
# border: within eps of blob A's last core point but with too few neighbors
EDGE = [(50, 0.0 + 0.002 * 3 + 0.012, 0.0)]


def _run(spark, repartition=None):
    pts = spark.createDataFrame(
        BLOB_A + BLOB_B + LONER + EDGE, ["point_id", "lat", "lon"]
    )
    if repartition:
        pts = pts.repartition(repartition)
    return clustering.dbscan(pts, eps_m=1500.0, min_pts=4, res=14)


def test_blobs_chain_noise(spark):
    got = {r.point_id: (r.cluster, r.kind) for r in _run(spark).collect()}
    # each blob of 4 points within eps of each other → all core, min-id label
    assert all(got[i] == (0, "core") for i in range(4))
    assert all(got[i] == (10, "core") for i in range(10, 14))
    assert got[99] == (-1, "noise")
    # the edge point sees 2 neighbors (itself + blob tail id 3) < min_pts →
    # not core, but within eps of core id 3 → border of cluster 0
    assert got[50] == (0, "border")


def test_partition_invariant(spark):
    a = {tuple(r) for r in _run(spark).collect()}
    b = {tuple(r) for r in _run(spark, repartition=7).collect()}
    assert a == b
