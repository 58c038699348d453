"""OSM 0.6 XML source (reference operator S1).

The reference SAX-parses the whole file into a JAXB object graph
(reference: OsmUnmarshaller.java:36-75 with NamespaceFilter.java:15-26); here
the built-in Spark XML data source (Spark 4) scans it distributed, once per
element kind, with explicit schemas.  Tag lists become map<string,string> with
last-write-wins on duplicate keys, matching the reference's mapTags loop
semantics (OsmToNetexMapper.java:276-318).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

_TAG_ARR = T.ArrayType(
    T.StructType([T.StructField("_k", T.StringType()), T.StructField("_v", T.StringType())])
)

# audit attributes on every element (Node.java:71-101); carried, never consumed
_AUDIT_FIELDS = [
    T.StructField("_user", T.StringType()),
    T.StructField("_uid", T.LongType()),
    T.StructField("_visible", T.BooleanType()),
    T.StructField("_version", T.LongType()),
    T.StructField("_changeset", T.LongType()),
    T.StructField("_timestamp", T.StringType()),
]
_AUDIT_EXPR = (
    "named_struct('user', _user, 'uid', _uid, 'visible', _visible, "
    "'version', _version, 'changeset', _changeset, "
    "'timestamp', cast(_timestamp as timestamp_ntz))"
)

_NODE_XML = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("_lat", T.DoubleType()),
        T.StructField("_lon", T.DoubleType()),
        T.StructField("tag", _TAG_ARR),
        *_AUDIT_FIELDS,
    ]
)
_WAY_XML = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("nd", T.ArrayType(T.StructType([T.StructField("_ref", T.LongType())]))),
        T.StructField("tag", _TAG_ARR),
        *_AUDIT_FIELDS,
    ]
)
_REL_XML = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField(
            "member",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("_type", T.StringType()),
                        T.StructField("_ref", T.LongType()),
                        T.StructField("_role", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("tag", _TAG_ARR),
        *_AUDIT_FIELDS,
    ]
)

# last-write-wins duplicate handling: reverse + map_from_entries keeps the
# *last* occurrence (map_from_entries keeps the first key it sees in Spark 4
# would throw on dupes; build via aggregate to stay deterministic)
_TAGS_EXPR = (
    "aggregate(coalesce(tag, array()), cast(map() as map<string,string>), "
    "(acc, t) -> map_concat(map_filter(acc, (k, v) -> k != t._k), map(t._k, t._v)))"
)


def read_osm_nodes(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.format("xml").option("rowTag", "node").schema(_NODE_XML).load(path)
    return df.select(
        F.col("_id").alias("node_id"),
        F.col("_lat").alias("lat"),
        F.col("_lon").alias("lon"),
        F.expr(_TAGS_EXPR).alias("tags"),
        F.expr(_AUDIT_EXPR).alias("audit"),
    )


def read_osm_ways(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.format("xml").option("rowTag", "way").schema(_WAY_XML).load(path)
    return df.select(
        F.col("_id").alias("way_id"),
        F.expr("transform(nd, x -> x._ref)").alias("nd_refs"),
        F.expr(_TAGS_EXPR).alias("tags"),
        F.expr(_AUDIT_EXPR).alias("audit"),
    )


def read_osm_relations(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.format("xml").option("rowTag", "relation").schema(_REL_XML).load(path)
    return df.select(
        F.col("_id").alias("rel_id"),
        F.expr(
            "transform(coalesce(member, array()), m -> named_struct("
            "'type', m._type, 'ref', m._ref, 'role', m._role))"
        ).alias("members"),
        F.expr(_TAGS_EXPR).alias("tags"),
        F.expr(_AUDIT_EXPR).alias("audit"),
    )


def read_osm(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(nodes, ways, relations) from one OSM XML file/dir."""
    return (
        read_osm_nodes(spark, path),
        read_osm_ways(spark, path),
        read_osm_relations(spark, path),
    )
