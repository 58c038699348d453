"""Reference-parity golden tests (test strategy per SURVEY §5: golden-row
comparison with nondeterministic envelope fields excluded, mirroring
OsmToNetexTransformerTest.java:21-60)."""

import pytest

from osm_to_netex_spark.plans import netex
from osm_to_netex_spark.sources import documents as docs_src


def test_smallosm_tariffzone_parity(spark):
    """Exact parity with the reference's smallosm.xml semantics
    (reference: smallosm.xml:1-17 through OsmToNetexMapper.mapTags)."""
    doc = docs_src.smallosm_document(spark)
    res = netex.convert_documents(doc, "TariffZone")
    rows = res.zones.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.zone_id == "BRA:TariffZone:104"
    assert r.version == "1"
    assert r.name == "Kongsberg"
    assert r.name_lang == "nor"
    assert r.polygon_id == "GEN-PolygonType-136284"
    # posList in nd order: lat lon lat lon (OsmToNetexMapper.java:251-267)
    assert r.pos_list == [59.6714157, 10.2251785, 59.7304896, 10.0912439]
    assert r.key_list is None  # no zone_type tag in smallosm
    assert r.valid_from is None and r.valid_to is None


def test_smallosm_topographic_place(spark):
    doc = docs_src.smallosm_document(spark)
    res = netex.convert_documents(doc, "TopographicPlace")
    r = res.zones.collect()[0]
    assert r.zone_id == "BRA:TopographicPlace:104"
    assert r.name == "Kongsberg"


def test_farezone_path_with_groups(spark, corpus):
    res = netex.convert_documents(corpus, "FareZone")
    zones = {r.zone_id: r for r in res.zones.collect()}
    assert len(zones) == 12
    z0 = zones["VOT:FareZone:100"]
    # id verbatim from tag (OsmToNetexMapper.java:238), privateCode required
    assert z0.private_code == "600"
    assert z0.authority_ref == "VOT:Authority:VTFK_ID"
    assert z0.zone_topology == "tiled"
    assert z0.scoping_method == "explicitStops"
    assert z0.members == ["NSR:StopPlace:16800", "NSR:StopPlace:16900"]
    assert z0.key_list == {"tzMapping": "BRA:TariffZone:600"}
    # ValidBetween: z0 has from<to → both kept
    assert str(z0.valid_from) == "2021-02-01" and str(z0.valid_to) == "2031-02-01"
    # z1 has to<from (2020-01-01 < implicit none) → z%4==1 has only valid_to →
    # fromDate null → no ValidBetween at all
    z1 = zones["VOT:FareZone:101"]
    assert z1.valid_from is None and z1.valid_to is None

    groups = res.groups.collect()
    assert len(groups) == 3
    g0 = next(g for g in groups if g.group_id == "BRA:GroupOfTariffZones:0")
    assert g0.name == "Gruppe-0"
    assert g0.name_lang == "nor"
    assert g0.purpose_of_grouping_ref == "BRA:PurposeOfGrouping:farezone"
    # member refs resolve way ids → zone ids, order preserved
    assert g0.member_zone_refs == [f"VOT:FareZone:{100 + i}" for i in range(4)]


def test_tariffzone_and_topographic_share_generic_path(spark, corpus):
    tz = netex.convert_documents(corpus, "TariffZone").zones.collect()
    tp = netex.convert_documents(corpus, "TopographicPlace").zones.collect()
    assert {r.zone_id for r in tz} == {f"BRA:TariffZone:{100 + i}" for i in range(12)}
    assert {r.zone_id for r in tp} == {f"BRA:TopographicPlace:{100 + i}" for i in range(12)}
    # polygons identical across paths (zones copied, not recomputed)
    tz_pl = {r.polygon_id: r.pos_list for r in tz}
    tp_pl = {r.polygon_id: r.pos_list for r in tp}
    assert tz_pl == tp_pl
    # rings closed: generator emits first==last vertex
    for pl in tz_pl.values():
        assert pl[0] == pl[-2] and pl[1] == pl[-1]
        assert len(pl) >= 2 * 9  # >= 8 verts + closure


def test_poslist_order_is_nd_order(spark, corpus):
    """Shuffle-independence of ring order (SURVEY §7 hard part a): rerun the
    assembly at different shuffle partitioning and compare."""
    from osm_to_netex_spark.operators import assemble, extract

    nodes = extract.extract_nodes(corpus)
    ways = extract.extract_ways(corpus)
    a = assemble.assemble_poslist(ways, nodes, broadcast_nodes=True)
    b = assemble.assemble_poslist(
        ways.repartition(7), nodes.repartition(5), broadcast_nodes=False
    )
    am = {r.way_id: r.pos_list for r in a.collect()}
    bm = {r.way_id: r.pos_list for r in b.collect()}
    assert am == bm


def test_unknown_target_entity_rejected(spark, corpus):
    with pytest.raises(ValueError, match="unknown target entity"):
        netex.convert_documents(corpus, "StopPlace")


def test_xml_render_contains_golden_fields(spark):
    doc = docs_src.smallosm_document(spark)
    res = netex.convert_documents(doc, "TariffZone")
    xml = netex.render_netex_xml(res)
    assert '<TariffZone version="1" id="BRA:TariffZone:104">' in xml
    assert '<Name lang="nor">Kongsberg</Name>' in xml
    assert "<gml:posList>59.6714157 10.2251785 59.7304896 10.0912439</gml:posList>" in xml
