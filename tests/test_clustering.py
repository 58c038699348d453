"""Fixed-point k-means: pinned against an independent numpy Lloyd's
implementation using the same quantization/rounding rules, plus partition
invariance (the determinism claim the fixed-point design exists for)."""

import math

import numpy as np

from osm_to_netex_spark.operators import clustering


def _np_kmeans(vectors, k, iters, bits=20):
    """Reference Lloyd's on quantized ints; ids are 0..n-1, init = first k."""
    q = np.floor(np.asarray(vectors, dtype=np.float64) * (1 << bits) + 0.5).astype(np.int64)
    cents = {cid: q[cid].copy() for cid in range(k)}
    assign = None
    for t in range(iters):
        labels = sorted(cents)
        d = np.stack([((q - cents[c]) ** 2).sum(axis=1) for c in labels], axis=1)
        assign = np.array([labels[i] for i in d.argmin(axis=1)])  # argmin ties → lowest cid
        if t == iters - 1:
            break
        for c in labels:
            members = q[assign == c]
            if len(members):
                s = members.sum(axis=0)
                cents[c] = np.array(
                    [math.floor(int(sv) / len(members) + 0.5) for sv in s], dtype=np.int64
                )
    return assign


def _blobs(n=60, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, size=(3, dim))
    pts = np.concatenate([c + 0.05 * rng.randn(n // 3, dim) for c in centers])
    return pts


def test_kmeans_matches_numpy_reference(spark):
    pts = _blobs()
    rows = [(i, [float(v) for v in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vid: r.cluster
        for r in clustering.kmeans_fixed_point(df, k=3, iters=4).collect()
    }
    expect = _np_kmeans(pts, k=3, iters=4)
    assert got == {i: int(expect[i]) for i in range(len(pts))}


def test_kmeans_partition_invariant(spark):
    pts = _blobs(n=45, dim=6, seed=11)
    rows = [(i, [float(v) for v in pts[i]]) for i in range(len(pts))]
    a = spark.createDataFrame(rows, ["vec_id", "embedding"])
    b = a.repartition(13)
    ra = sorted((r.vid, r.cluster) for r in clustering.kmeans_fixed_point(a, k=3, iters=3).collect())
    rb = sorted((r.vid, r.cluster) for r in clustering.kmeans_fixed_point(b, k=3, iters=3).collect())
    assert ra == rb


def test_kmeans_separates_blobs(spark):
    pts = _blobs(n=90, dim=8, seed=3)
    rows = [(i, [float(v) for v in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = clustering.kmeans_fixed_point(df, k=3, iters=5).collect()
    by_true = {}
    for r in out:
        by_true.setdefault(r.vid // 30, []).append(r.cluster)
    # within each true blob, the dominant learned cluster owns ≥ 90%
    for blob, cl in by_true.items():
        top = max(set(cl), key=cl.count)
        assert cl.count(top) / len(cl) >= 0.9
