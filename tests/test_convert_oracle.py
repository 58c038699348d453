"""Round-2 convert-pipeline hardening: fixture pinning, enum validation
(V1-style strict failure, OsmToNetexMapper.java:161-166), and the NeTEx
output-validation analogue (NetexHelper.java:47-49,61-67)."""

import pytest
from pyspark.sql import functions as F

from osm_to_netex_spark.operators import extract, zones
from osm_to_netex_spark.plans import netex
from osm_to_netex_spark.plans.convert_queries import FIXTURE_CORPUS
from osm_to_netex_spark.sources import documents as docs_src

FIXTURE_PARAMS = dict(n_docs=500, n_zones=32, n_groups=4, n_points=150)


def test_fixture_matches_live_generator(spark):
    """The committed fixture (both engines' shared input for the convert_*
    oracle gates) must stay bit-identical to the live generator — silent
    generator drift would quietly decouple the gate from the code."""
    committed = spark.read.parquet(FIXTURE_CORPUS)
    fresh = docs_src.synthesize_corpus(spark, **FIXTURE_PARAMS)
    assert extract.assert_span_parity(committed, fresh) == FIXTURE_PARAMS["n_docs"]


def _with_bad_tag(corpus, key: str, value: str):
    """Rewrite every osm_way span's JSON payload to carry tags[key]=value."""
    patched = corpus.select(
        "doc_id",
        F.expr(
            f"""transform(spans, s -> CASE WHEN s.kind = 'osm_way'
                 THEN named_struct('kind', s.kind,
                      'text', to_json(named_struct(
                          'id', cast(get_json_object(s.text, '$.id') as bigint),
                          'nd_refs', from_json(get_json_object(s.text, '$.nd_refs'),
                                               'array<bigint>'),
                          'tags', map_concat(
                              map_filter(
                                  from_json(get_json_object(s.text, '$.tags'),
                                            'map<string,string>'),
                                  (k, v) -> k != '{key}'),
                              map('{key}', '{value}')))),
                      'media_ref', s.media_ref, 'offset', s.offset)
                 ELSE s END)"""
        ).alias("spans"),
    )
    return patched


def test_enum_validation_strict_vs_lenient(spark):
    corpus = spark.read.parquet(FIXTURE_CORPUS)
    bad = _with_bad_tag(corpus, "zoneTopology", "hexagonal")  # not a NeTEx value
    with pytest.raises(ValueError, match="Invalid enum tag values"):
        netex.convert_documents(bad, "FareZone", strict=True)
    # lenient mode passes the value through (caller opted out of validation)
    out = netex.convert_documents(bad, "FareZone", strict=False).zones
    assert out.where("zone_topology = 'hexagonal'").count() == 32
    # scopingMethod path too
    bad2 = _with_bad_tag(corpus, "scopingMethod", "telepathy")
    with pytest.raises(ValueError, match="scopingMethod"):
        netex.convert_documents(bad2, "FareZone", strict=True)
    # valid values (the fixture's own) pass strict
    ok = netex.convert_documents(corpus, "FareZone", strict=True).zones
    assert ok.count() == 32


def test_enum_validate_enums_rows(spark):
    corpus = spark.read.parquet(FIXTURE_CORPUS)
    ways = extract.extract_ways(_with_bad_tag(corpus, "zoneTopology", "weird"))
    nodes = extract.extract_nodes(corpus)
    from osm_to_netex_spark.operators import assemble

    asm = assemble.assemble_poslist(ways, nodes, broadcast_nodes=True, strict=False)
    bad = zones.validate_enums(asm)
    rows = bad.collect()
    assert len(rows) == 32 and all(r.tag == "zoneTopology" for r in rows)
    assert all(r.bad_value == "weird" for r in rows)


def test_output_validation_clean_and_corrupted(spark):
    corpus = spark.read.parquet(FIXTURE_CORPUS)
    z = netex.convert_documents(corpus, "TariffZone").zones
    # the fixture's rings are closed and >= 8 doubles → validates clean
    assert netex.validate_zones_output(z).count() == 0
    netex.check_zones_output(z)  # must not raise

    # corrupt: drop the closing vertex of one zone + null one id
    corrupted = z.withColumn(
        "pos_list",
        F.expr(
            "CASE WHEN zone_id = 'BRA:TariffZone:100' "
            "THEN slice(pos_list, 1, size(pos_list) - 2) ELSE pos_list END"
        ),
    ).withColumn(
        "zone_id",
        F.expr("CASE WHEN zone_id = 'BRA:TariffZone:101' THEN NULL ELSE zone_id END"),
    )
    v = {(r.zone_id, r.violation) for r in netex.validate_zones_output(corrupted).collect()}
    assert ("BRA:TariffZone:100", "ring_not_closed") in v
    assert (None, "null_zone_id") in v
    with pytest.raises(ValueError, match="output validation failed"):
        netex.check_zones_output(corrupted)
