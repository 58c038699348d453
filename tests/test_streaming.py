"""Structured Streaming: stream result must equal the batch plan's result."""

from pyspark.sql import functions as F

from osm_to_netex_spark.functions import geo
from osm_to_netex_spark.functions.portable import SPARK
from osm_to_netex_spark.operators import extract
from osm_to_netex_spark.sources import documents as docs_src
from osm_to_netex_spark.streaming import stream


def test_stream_tile_assign_matches_batch(spark, corpus, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs_src.write_documents(corpus, src, partitions=6)

    st = stream.read_document_stream(spark, src, max_files_per_trigger=2)
    assigned = stream.streaming_tile_assign(st, res=8)
    q = stream.run_stream_to_parquet(assigned, out, ckpt)
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.hex_cell, r.quad_cell)
        for r in spark.read.parquet(out).select("doc_id", "hex_cell", "quad_cell").collect()
    }
    batch = extract.extract_nodes(corpus).select(
        "doc_id",
        F.expr(geo.hex_cell("lat", "lon", 8, SPARK)).alias("hex_cell"),
        F.expr(geo.quad_cell("lat", "lon", 8, SPARK)).alias("quad_cell"),
    )
    expect = {(r.doc_id, r.hex_cell, r.quad_cell) for r in batch.collect()}
    assert got == expect


def test_stream_is_incremental_and_exactly_once(spark, corpus, tmp_path):
    """Re-running the stream over the same checkpoint emits nothing new."""
    src = str(tmp_path / "in2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    docs_src.write_documents(corpus, src, partitions=4)

    st = stream.read_document_stream(spark, src)
    q = stream.run_stream_to_parquet(stream.streaming_tile_assign(st, res=8), out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    q2 = stream.run_stream_to_parquet(
        stream.streaming_tile_assign(stream.read_document_stream(spark, src), res=8), out, ckpt
    )
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0
