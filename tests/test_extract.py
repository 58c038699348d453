"""Extraction, validation, and span-sequence invariant tests."""

import pytest
from pyspark.sql import functions as F

from osm_to_netex_spark.operators import assemble, extract
from osm_to_netex_spark.sources import documents as docs_src


def test_extraction_counts(spark, corpus):
    nodes = extract.extract_nodes(corpus)
    ways = extract.extract_ways(corpus)
    rels = extract.extract_relations(corpus)
    assert ways.count() == 12
    assert rels.count() == 3
    # nodes = zone vertices + 90 point docs
    n_vert = corpus.selectExpr(
        "size(filter(spans, s -> s.kind = 'osm_node')) as n"
    ).agg(F.sum("n")).collect()[0][0]
    assert nodes.count() == n_vert


def test_nodes_slim_matches_full_parse(spark, corpus):
    """Slim struct parse (fixed tag keys, no map) == full map parse."""
    full = extract.extract_nodes(corpus).select(
        "node_id", "lat", "lon",
        F.expr("tags['entity']").alias("entity"),
        F.expr("tags['id']").alias("tag_id"),
    )
    slim = extract.extract_nodes_slim(corpus, tag_fields=("entity", "id"))
    assert slim.columns == ["node_id", "lat", "lon", "entity", "tag_id"]
    assert full.exceptAll(slim).count() == 0
    assert slim.exceptAll(full).count() == 0


def test_span_invariant_roundtrip(spark, corpus, tmp_path):
    """(kind, text, media_ref, order) survives a write/read/repartition cycle."""
    p = str(tmp_path / "docs")
    docs_src.write_documents(corpus, p, partitions=5)
    back = docs_src.read_documents(spark, p).repartition(3)
    assert extract.assert_span_parity(corpus, back) == corpus.count()


def test_span_invariant_detects_mutation(spark, corpus):
    mutated = corpus.withColumn(
        "spans", F.expr("reverse(spans)")
    )
    with pytest.raises(AssertionError, match="span-sequence invariant"):
        extract.assert_span_parity(corpus, mutated)


def test_offsets_strictly_increasing(spark, corpus):
    bad = corpus.selectExpr(
        "size(filter(sequence(1, size(spans) - 1), "
        "i -> spans[i].offset <= spans[i-1].offset)) as n_bad"
    ).where("n_bad > 0")
    assert bad.count() == 0


def test_duplicate_node_id_detection(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, None), (1, 1.5, 2.5, None), (2, 3.0, 4.0, None)],
        "node_id long, lat double, lon double, tags map<string,string>",
    )
    dupes = extract.duplicate_node_ids(df).collect()
    assert len(dupes) == 1 and dupes[0].node_id == 1


def test_missing_nd_ref_fails_strict(spark):
    """Reference NPEs on missing refs (OsmToNetexMapper.java:255)."""
    nodes = spark.createDataFrame(
        [(10, 1.0, 2.0, None)], "node_id long, lat double, lon double, tags map<string,string>"
    )
    ways = spark.createDataFrame(
        [(1, [10, 99], {"codespace": "X"})],
        "way_id long, nd_refs array<long>, tags map<string,string>",
    )
    with pytest.raises(ValueError, match="unresolved nd refs"):
        assemble.assemble_poslist(ways, nodes, strict=True)
    # non-strict drops the missing vertex (documented divergence knob)
    out = assemble.assemble_poslist(ways, nodes, strict=False).collect()
    assert out[0].pos_list == [1.0, 2.0]


def test_duplicate_node_fails_strict(spark):
    nodes = spark.createDataFrame(
        [(10, 1.0, 2.0, None), (10, 5.0, 6.0, None)],
        "node_id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(1, [10, 10], {"codespace": "X"})],
        "way_id long, nd_refs array<long>, tags map<string,string>",
    )
    with pytest.raises(ValueError, match="duplicate node ids"):
        assemble.assemble_poslist(ways, nodes, strict=True)


def test_schema_violations(spark):
    nodes = spark.createDataFrame(
        [(1, 91.0, 0.0, None), (2, 10.0, 181.0, None), (3, 0.0, 0.0, None)],
        "node_id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(7, [1], None)], "way_id long, nd_refs array<long>, tags map<string,string>"
    )
    v = extract.schema_violations(nodes, ways).collect()
    kinds = {(r.violation, r.id) for r in v}
    assert ("node_coord_range", 1) in kinds
    assert ("node_coord_range", 2) in kinds
    assert ("way_nd_count", 7) in kinds
    assert len(kinds) == 3
