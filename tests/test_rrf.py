"""RRF hybrid retrieval: fusion beats either list alone on a doc both rank,
absent-list contribution is zero, Python replay agrees."""

import pyspark.sql.functions as F
import pytest

from osm_to_netex_spark.operators import retrieval


@pytest.fixture(scope="module")
def hybrid_data(spark):
    docs = [
        (0, "spark join window vector engine"),
        (1, "spark spark join join window"),
        (2, "totally unrelated text about nothing"),
        (3, "join window spark"),
        (4, "vector vector spark"),
        (5, "more filler words here"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id: long, text: string")
    import random

    rng = random.Random(11)
    base = [rng.uniform(-0.5, 0.5) for _ in range(8)]
    emb = []
    for i in range(6):
        if i in (1, 3):  # near the query vector (vec 0)
            v = [x + rng.uniform(-0.02, 0.02) for x in base]
        else:
            v = [rng.uniform(-0.5, 0.5) for _ in range(8)]
        emb.append((i, v))
    emb[0] = (0, base)
    edf = spark.createDataFrame(emb, "vec_id: long, embedding: array<double>")
    edf = edf.withColumn("embedding", F.expr("transform(embedding, x -> cast(x as float))"))
    return ddf.cache(), edf.cache()


def test_fusion_scores_and_replay(spark, hybrid_data):
    docs, emb = hybrid_data
    out = retrieval.rrf_hybrid(
        docs, emb, ["spark", "join", "window", "vector"],
        query_vec_id=0, n_list=5, k_const=60, topk=6,
    ).collect()
    assert len(out) > 0
    for r in out:
        want = 0.0
        if r["r_sparse"]:
            want += 1.0 / (60 + r["r_sparse"])
        if r["r_dense"]:
            want += 1.0 / (60 + r["r_dense"])
        assert abs(r["rrf"] - want) < 1e-12
    # doc present in both lists outranks a doc with only one equal-rank hit
    both = [r for r in out if r["r_sparse"] and r["r_dense"]]
    only = [r for r in out if bool(r["r_sparse"]) != bool(r["r_dense"])]
    if both and only:
        assert max(r["rrf"] for r in both) > min(r["rrf"] for r in only)


def test_order_is_rrf_desc(spark, hybrid_data):
    docs, emb = hybrid_data
    rows = retrieval.rrf_hybrid(
        docs, emb, ["spark", "join"], query_vec_id=0, n_list=5, topk=6
    ).collect()
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
