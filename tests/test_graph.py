"""PageRank: exact-integer fixed point — invariant under partitioning, and
the deliberately skewed hub set must actually concentrate rank."""

from pyspark.sql import functions as F

from osm_to_netex_spark.operators import graph

SF_DIR = "/root/testdata/sf0.001"


def _ranks(spark, docs, n_iter=3):
    return {
        r["doc_id"]: r["pagerank"]
        for r in graph.pagerank(spark, docs, n_iter=n_iter).collect()
    }


def test_pagerank_partition_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = _ranks(spark, docs)
    b = _ranks(spark, docs.repartition(13, "doc_id"))
    c = _ranks(spark, docs.coalesce(1))
    assert a == b == c


def test_pagerank_hubs_concentrate_rank(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pr = graph.pagerank(spark, docs, n_iter=3)
    row = pr.select(
        F.avg(F.when(F.col("doc_id") < graph.HUB_MOD, F.col("pagerank"))).alias("hub"),
        F.avg(F.when(F.col("doc_id") >= graph.HUB_MOD, F.col("pagerank"))).alias(
            "rest"
        ),
        F.sum("pagerank").alias("total"),
        F.count("*").alias("n"),
    ).first()
    assert row["hub"] > 2 * row["rest"]
    # integer floors only ever lose mass: total <= SCALE, but stays close
    assert row["total"] <= graph.SCALE
    assert row["total"] >= graph.SCALE * 0.95
