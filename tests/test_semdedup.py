"""SemDeDup: keep-first rule vs a pure-Python replay, threshold
monotonicity, smallest-id-survives, partition invariance."""

import math

import pyspark.sql.functions as F
import pytest

from osm_to_netex_spark.operators import dedup


@pytest.fixture(scope="module")
def emb(spark):
    import random

    rng = random.Random(7)
    base = [[rng.uniform(-0.5, 0.5) for _ in range(8)] for _ in range(6)]
    rows = []
    for i in range(60):
        proto = base[i % 6]
        vec = [v + rng.uniform(-0.05, 0.05) for v in proto]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    df = df.withColumn("embedding", F.expr("transform(embedding, x -> cast(x as float))"))
    return df.cache()


def _python_semdedup(rows, k, iters, p, q, bits):
    """Independent replay: quantize, Lloyd with smallest-id init and
    floor(s/n + .5) centroid rounding, then the keep-first integer rule."""
    V = {i: [math.floor(x * (1 << bits) + 0.5) for x in vec] for i, vec in rows}
    ids = sorted(V)
    cents = {i: V[i][:] for i in ids[:k]}

    def assign():
        out = {}
        for i in ids:
            best = min(
                (sum((a - b) ** 2 for a, b in zip(V[i], cq)), cid)
                for cid, cq in cents.items()
            )
            out[i] = best[1]
        return out

    lab = None
    for t in range(iters):
        lab = assign()
        if t == iters - 1:
            break
        sums, cnts = {}, {}
        for i, c in lab.items():
            cnts[c] = cnts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(V[i]))
            for j, v in enumerate(V[i]):
                s[j] += v
        for c in cents:
            if c in cnts:
                cents[c] = [math.floor(s / cnts[c] + 0.5) for s in sums[c]]
    pruned = set()
    for b in ids:
        for a in ids:
            if a >= b or lab[a] != lab[b]:
                continue
            dot = sum(x * y for x, y in zip(V[a], V[b]))
            if dot > 0 and q * q * dot * dot >= p * p * sum(
                x * x for x in V[a]
            ) * sum(x * x for x in V[b]):
                pruned.add(b)
                break
    return {i: (lab[i], i not in pruned) for i in ids}


def test_matches_python_replay(spark, emb):
    got = {
        r.vec_id: (r.cluster, r.keep)
        for r in dedup.semdedup(emb, k=4, iters=2, p=1, q=2, bits=9).collect()
    }
    # replay quantizes the same float32 values Spark sees
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    want = _python_semdedup(rows, k=4, iters=2, p=1, q=2, bits=9)
    assert got == want
    assert any(not keep for _, keep in got.values())  # it actually prunes


def test_smallest_id_per_cluster_survives(spark, emb):
    out = dedup.semdedup(emb, k=4, iters=2, p=1, q=2)
    firsts = out.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    gone = firsts.join(out.where("not keep"), ["vec_id"], "inner")
    assert gone.count() == 0


def test_threshold_monotone(spark, emb):
    loose = dedup.semdedup(emb, k=4, iters=2, p=1, q=4).where("not keep").count()
    tight = dedup.semdedup(emb, k=4, iters=2, p=3, q=4).where("not keep").count()
    assert tight <= loose


def test_partition_invariance(spark, emb):
    a = sorted(tuple(r) for r in dedup.semdedup(emb, k=4, iters=2).collect())
    b = sorted(
        tuple(r) for r in dedup.semdedup(emb.repartition(7), k=4, iters=2).collect()
    )
    assert a == b
