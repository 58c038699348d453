"""Explicit StructType schemas — the engine never infers.

Mirrors the reference's fixed-XSD posture
(reference: osm-to-netex/src/main/resources/xsd/OSMSchema.xsd:1-108,
OsmSchemaValidator.java:24-37): schemas are declared once here and applied on
every read.  OSM ids are *signed* int64 — JOSM exports use negative ids
(reference: smallosm.xml:2, id='-39122') even though the XSD says
unsignedLong.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input (BASELINE.json input_hint): interleaved document table
# ---------------------------------------------------------------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # text|media|osm_node|osm_way|osm_relation
        T.StructField("text", T.StringType(), True),        # payload; osm_*: JSON geometry record
        T.StructField("media_ref", T.StringType(), True),   # non-null iff kind='media'
        T.StructField("offset", T.IntegerType(), False),    # strictly increasing within a doc
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# ---------------------------------------------------------------------------
# Derived relational tables (reference entities → DataFrames; SURVEY §1.3)
# ---------------------------------------------------------------------------
TAGS = T.MapType(T.StringType(), T.StringType())

# OSM audit attributes (Node.java:71-101; shared by way/relation).  The
# reference never *consumes* them (SURVEY P1) but carries them on every
# element; the engine carries them as one nullable struct so arbitrary OSM
# round-trips preserve them.  Unconsumed, the JSON-expression optimizer
# prunes them out of from_json — zero cost on the hot paths.
AUDIT = T.StructType(
    [
        T.StructField("user", T.StringType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("visible", T.BooleanType(), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampNTZType(), True),  # ISO-8601, no zone
    ]
)

NODES = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), False),   # ∈ [-90, 90]  (OSMSchema.xsd:35-40)
        T.StructField("lon", T.DoubleType(), False),   # ∈ [-180, 180]
        T.StructField("tags", TAGS, True),
        T.StructField("audit", AUDIT, True),
    ]
)

WAYS = T.StructType(
    [
        T.StructField("way_id", T.LongType(), False),
        # ordered; 2..2000 per XSD (OSMSchema.xsd:50); order is semantic (ring winding)
        T.StructField("nd_refs", T.ArrayType(T.LongType()), False),
        T.StructField("tags", TAGS, True),
        T.StructField("audit", AUDIT, True),
    ]
)

MEMBER = T.StructType(
    [
        T.StructField("type", T.StringType(), False),  # node|way|relation (OSMSchema.xsd:95-103)
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

RELATIONS = T.StructType(
    [
        T.StructField("rel_id", T.LongType(), False),
        T.StructField("members", T.ArrayType(MEMBER), False),
        T.StructField("tags", TAGS, True),
        T.StructField("audit", AUDIT, True),
    ]
)

# JSON payload schemas for from_json over span.text
NODE_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("tags", TAGS),
        T.StructField("audit", AUDIT),
    ]
)
WAY_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("nd_refs", T.ArrayType(T.LongType())),
        T.StructField("tags", TAGS),
        T.StructField("audit", AUDIT),
    ]
)
RELATION_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("members", T.ArrayType(MEMBER)),
        T.StructField("tags", TAGS),
        T.StructField("audit", AUDIT),
    ]
)

# ---------------------------------------------------------------------------
# Zone output rows (row-oriented analogue of the NeTEx SiteFrame content;
# FIXTURES.md §5; reference golden files expected_result_*.xml)
# ---------------------------------------------------------------------------
ZONES = T.StructType(
    [
        T.StructField("zone_kind", T.StringType(), False),   # TariffZone|FareZone|TopographicPlace
        T.StructField("zone_id", T.StringType(), False),
        T.StructField("version", T.StringType(), False),     # always "1" (OsmToNetexMapper.java:106)
        T.StructField("name", T.StringType(), True),
        T.StructField("name_lang", T.StringType(), True),
        T.StructField("polygon_id", T.StringType(), False),  # "GEN-PolygonType"+wayId (:265)
        # flat lat,lon,lat,lon… in nd order (OsmToNetexMapper.java:251-267)
        T.StructField("pos_list", T.ArrayType(T.DoubleType()), False),
        T.StructField("key_list", TAGS, True),
        T.StructField("valid_from", T.DateType(), True),
        T.StructField("valid_to", T.DateType(), True),
        T.StructField("private_code", T.StringType(), True),
        T.StructField("authority_ref", T.StringType(), True),
        T.StructField("scoping_method", T.StringType(), True),
        T.StructField("zone_topology", T.StringType(), True),
        T.StructField("members", T.ArrayType(T.StringType()), True),
        T.StructField("neighbours", T.ArrayType(T.StringType()), True),
    ]
)

GROUPS = T.StructType(
    [
        T.StructField("group_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("name_lang", T.StringType(), True),
        T.StructField("private_code", T.StringType(), True),
        T.StructField("purpose_of_grouping_ref", T.StringType(), True),
        T.StructField("member_zone_refs", T.ArrayType(T.StringType()), True),
    ]
)
