"""Benchmark decontamination: constructed train/eval corpora with known
n-gram overlaps, plus partition invariance and the no-shuffle-broadcast
plan property."""

from osm_to_netex_spark.operators import contamination


EVAL = [
    (100, "the quick brown fox jumps over the lazy dog near the river"),
    (101, "large language models memorize benchmark answers verbatim sometimes"),
]

TRAIN = [
    # shares the 5-gram "the quick brown fox jumps" (and longer runs) with eval 100
    (1, "yesterday the quick brown fox jumps over the lazy dog again"),
    # shares "language models memorize benchmark answers" with eval 101
    (2, "we found that language models memorize benchmark answers when trained"),
    # clean: no 4-gram in common with either eval doc
    (3, "completely unrelated text about columnar storage engines and parquet"),
    # too short to produce any 4-gram
    (4, "tiny doc"),
]


def _run(spark, n_shingle=4, repartition=None):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    if repartition:
        train = train.repartition(repartition)
        ev = ev.repartition(repartition)
    return contamination.decontaminate(train, ev, n_shingle=n_shingle)


def test_known_overlaps_flagged(spark):
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in _run(spark).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1][1] and got[1][0] >= 4   # a 7-token shared run → ≥4 shared 4-grams
    assert got[2][1] and got[2][0] >= 2
    assert got[3] == (0, False)
    assert got[4] == (0, False)           # sub-n docs are clean, not dropped


def test_partition_invariant(spark):
    a = {(r.doc_id, r.n_hits, r.contaminated) for r in _run(spark).collect()}
    b = {(r.doc_id, r.n_hits, r.contaminated) for r in _run(spark, repartition=7).collect()}
    assert a == b


def test_eval_side_is_broadcast(spark):
    plan = _run(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
