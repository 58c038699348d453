"""Product quantization: code validity, Python ADC replay, determinism."""

import math

import pyspark.sql.functions as F

from osm_to_netex_spark.operators import similarity


def _emb(spark, n=40, dim=16, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(dim)]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    return df.withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as float))")
    ).cache()


def test_codes_are_codebook_labels(spark):
    emb = _emb(spark)
    codes, cents = similarity.pq_encode(emb, m=4, k=4, iters=2, dim=16)
    rows = codes.collect()
    assert len(rows) == 40
    for j in range(4):
        valid = set(cents[j].keys())
        assert {int(r[f"code_{j}"]) for r in rows} <= valid
        assert len(cents[j]) == 4


def test_adc_matches_python_replay(spark):
    emb = _emb(spark)
    m, k, dim, bits = 4, 4, 16, 9
    codes, cents = similarity.pq_encode(emb, m=m, k=k, iters=2, dim=dim, bits=bits)
    code_rows = {int(r["vid"]): [int(r[f"code_{j}"]) for j in range(m)] for r in codes.collect()}
    vecs = {int(r["vec_id"]): list(r["embedding"]) for r in emb.collect()}
    scale = 1 << bits
    d_sub = dim // m

    got = similarity.topk_pq_adc(
        emb, m=m, k=k, iters=2, dim=dim, n_queries=2, topk=5, bits=bits
    ).collect()

    for qid in (0, 1):
        qv = [math.floor(float(x) * scale + 0.5) for x in vecs[qid]]
        dists = []
        for vid, code in code_rows.items():
            dtot = 0
            for j in range(m):
                qsub = qv[j * d_sub : (j + 1) * d_sub]
                cq = cents[j][code[j]]
                dtot += sum((a - b) * (a - b) for a, b in zip(qsub, cq))
            dists.append((dtot, vid))
        want = sorted(dists)[:5]
        have = sorted(
            (int(r["adc_dist"]), int(r["vid"]))
            for r in got
            if int(r["qid"]) == qid
        )
        assert have == want


def test_partition_invariance(spark):
    emb = _emb(spark)
    a = sorted(tuple(r) for r in similarity.topk_pq_adc(emb, m=4, k=4, iters=2, dim=16, n_queries=2, topk=5).collect())
    b = sorted(tuple(r) for r in similarity.topk_pq_adc(emb.repartition(5), m=4, k=4, iters=2, dim=16, n_queries=2, topk=5).collect())
    assert a == b


def test_adc_plan_size_constant_in_query_count(spark):
    """The ADC distance table ships as broadcast-joined DATA, so the physical
    plan must not grow with the query set (the round-2 literal-inlined form
    grew O(n_q*m*k)).  10x the queries may add at most a small constant."""
    emb = _emb(spark, n=60)
    small = similarity.topk_pq_adc(emb, m=4, k=4, iters=1, dim=16, n_queries=4, topk=3)
    big = similarity.topk_pq_adc(emb, m=4, k=4, iters=1, dim=16, n_queries=40, topk=3)
    p_small = small._jdf.queryExecution().executedPlan().toString()
    p_big = big._jdf.queryExecution().executedPlan().toString()
    assert len(p_big) < len(p_small) * 1.5 + 2000, (
        f"plan grew with n_queries: {len(p_small)} -> {len(p_big)}"
    )
