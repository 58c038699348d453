"""Interleaved-documents source: readers, writers, and the deterministic
synthetic corpus generator.

The primary engine input is a table of interleaved text+media documents
carrying OSM geometries in ordered spans (BASELINE.json input_hint):

    documents(doc_id string, spans array<struct<kind, text, media_ref, offset>>)

The generator is **pure Catalyst** — every value derives from the row index
through md5-based portable hashes (functions.portable.phash60), so the same
(n_docs, seed) always yields byte-identical documents on any cluster size and
the corpus can be regenerated instead of shipped.  ``spark.range`` parallelizes
generation across executors; at the 10^12-doc design point generation is
embarrassingly parallel and never materializes on the driver.

Span-order invariant (FIXTURES.md §1): offsets strictly increase within a doc
and (kind, text, media_ref, order) must survive the pipeline bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..functions.portable import SPARK, flit, phash60

BBOX = (59.4, 60.2, 9.6, 10.6)  # Buskerud-like (FIXTURES.md §4)

SPAN_CAST = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _pr(key: str) -> str:
    """Deterministic uniform [0,1) from a string-expression key (spark dialect)."""
    return f"({phash60(key, SPARK)} / {flit(float(2**60))})"


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents table with the explicit schema (never infer)."""
    return spark.read.schema(schemas.DOCUMENTS).parquet(path)


def write_documents(df: DataFrame, path: str, partitions: int | None = None) -> None:
    if partitions:
        df = df.repartition(partitions, "doc_id")
    df.write.mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# synthetic corpus
# ---------------------------------------------------------------------------
def synthesize_corpus(
    spark: SparkSession,
    n_docs: int = 1000,
    n_zones: int = 32,
    n_groups: int = 4,
    n_points: int = 200,
    bbox: tuple[float, float, float, float] = BBOX,
    seed: int = 42,
    zone_radius_scale: float = 1.0,
) -> DataFrame:
    """Deterministic interleaved corpus (FIXTURES.md §§1-4,6).

    Layout by doc index i:
      [0, n_zones)                 zone docs: polygon vertices as osm_node
                                   spans + one closed osm_way span, tags
                                   carrying the union vocabulary of all three
                                   conversion paths (TariffZone / FareZone /
                                   TopographicPlace), interleaved with text +
                                   media filler spans;
      [n_zones, +n_groups)         relation docs grouping consecutive zones
                                   (GroupOfTariffZones vocabulary);
      [+n_groups, +n_points)       point docs: one osm_node span tagged as a
                                   StopPlace/Quay; 30% clustered into 3 dense
                                   hotspot cells to exercise skew handling;
      rest                         pure text/media filler docs.

    Every doc gets ≥1 text span and a media span on a deterministic subset so
    the span-sequence invariant is exercised on every class.  Node ids of
    every 7th zone are negative (JOSM-style, reference smallosm.xml:2).
    """
    lat_lo, lat_hi, lon_lo, lon_hi = bbox
    dlat, dlon = lat_hi - lat_lo, lon_hi - lon_lo
    s = str(seed)

    def zr(key: str) -> str:  # per-zone uniform
        return _pr(f"concat('{s}:z:{key}:', z)")

    # ---- zone docs --------------------------------------------------------
    zones = (
        spark.range(n_zones)
        .withColumnRenamed("id", "z")
        .selectExpr(
            "z",
            f"{flit(lat_lo)} + {zr('clat')} * {flit(dlat)} as clat",
            f"{flit(lon_lo)} + {zr('clon')} * {flit(dlon)} as clon",
            f"({flit(0.02)} + {zr('rad')} * {flit(0.10)}) * {flit(zone_radius_scale)} as rad",
            f"cast(8 + floor({zr('nv')} * 17) as int) as nv",  # 8..24 vertices
            "case when z % 7 = 0 then -1 else 1 end as idsign",
        )
        .selectExpr(
            "z", "clat", "clon", "rad", "nv", "idsign",
            "(1000000 + z * 100000) * idsign as node_base",
            "(500000000 + z) * idsign as way_id",
        )
    )
    vert_r = _pr(f"concat('{s}:vr:', z, ':', j)")
    zones = zones.withColumn(
        "verts",
        F.expr(
            f"""transform(sequence(0, nv - 1), j -> named_struct(
                 'nid', node_base + j * idsign,
                 'vlat', clat + rad * ({flit(0.6)} + {flit(0.8)} * {vert_r}) * cos(2.0e0 * pi() * j / nv),
                 'vlon', clon + rad * ({flit(0.6)} + {flit(0.8)} * {vert_r}) * sin(2.0e0 * pi() * j / nv)))"""
        ),
    )
    # union tag vocabulary for all three conversion paths (FIXTURES.md §3)
    zone_tags = """map_filter(map(
        'codespace', 'BRA',
        'reference', cast(100 + z as string),
        concat('name:', case when z % 3 = 0 then 'nor' else 'eng' end), concat('Zone-', z),
        'zone_type', 'tariffZone',
        'area', 'tariffZone',
        'valid_from', case when z % 4 = 0 then '2021-02-01' else null end,
        'valid_to',   case when z % 4 = 0 then '2031-02-01'
                           when z % 4 = 1 then '2020-01-01' else null end,
        'id', concat('VOT:FareZone:', 100 + z),
        'privateCode', cast(600 + z as string),
        'authorityRef', 'VOT:Authority:VTFK_ID',
        'zoneTopology', case when z % 2 = 0 then 'tiled' else 'annular' end,
        'scopingMethod', 'explicitStops',
        'members', case when z % 2 = 0
                        then concat('NSR:StopPlace:', 16800 + z, ';', 'NSR:StopPlace:', 16900 + z)
                        else null end,
        'neighbours', case when z % 5 = 0 then concat('VOT:FareZone:', 100 + ((z + 1) % """ + str(n_zones) + """))
                           else null end
    ), (k, v) -> v is not null)"""

    node_span = """named_struct(
        'kind', 'osm_node',
        'text', to_json(named_struct('id', v.nid, 'lat', v.vlat, 'lon', v.vlon,
                                     'tags', map('src', 'vert'))),
        'media_ref', cast(null as string),
        'offset', cast(10 + 10 * j as int))"""
    zone_docs = zones.selectExpr(
        "format_string('doc-%09d', z) as doc_id",
        f"""concat(
            array(named_struct('kind', 'text',
                               'text', concat('zone document ', z, ' header text'),
                               'media_ref', cast(null as string), 'offset', 0),
                  named_struct('kind', 'media', 'text', cast(null as string),
                               'media_ref', concat('media://img/zone/', z), 'offset', 5)),
            transform(sequence(0, nv - 1), j -> {node_span.replace('v.nid', 'verts[j].nid').replace('v.vlat', 'verts[j].vlat').replace('v.vlon', 'verts[j].vlon')}),
            array(named_struct('kind', 'osm_way',
                               'text', to_json(named_struct(
                                   'id', way_id,
                                   'nd_refs', concat(transform(verts, v -> v.nid), array(verts[0].nid)),
                                   'tags', {zone_tags})),
                               'media_ref', cast(null as string),
                               'offset', cast(10 + 10 * nv as int)),
                  named_struct('kind', 'text',
                               'text', concat('zone document ', z, ' footer'),
                               'media_ref', cast(null as string),
                               'offset', cast(20 + 10 * nv as int)))
        ) as spans""",
    )

    # ---- relation docs ----------------------------------------------------
    zper = max(1, n_zones // max(1, n_groups))
    rels = (
        spark.range(n_groups)
        .withColumnRenamed("id", "g")
        .selectExpr("g", f"{zper_members(zper, n_zones)} as member_zs")
    )
    rel_docs = rels.selectExpr(
        f"format_string('doc-%09d', {n_zones} + g) as doc_id",
        f"""array(
            named_struct('kind', 'text', 'text', concat('relation doc ', g),
                         'media_ref', cast(null as string), 'offset', 0),
            named_struct('kind', 'osm_relation',
                'text', to_json(named_struct(
                    'id', 900000000 + g,
                    'members', transform(member_zs, mz -> named_struct(
                        'type', 'way',
                        'ref', (500000000 + mz) * (case when mz % 7 = 0 then -1 else 1 end),
                        'role', 'zone')),
                    'tags', map(
                        'GroupOfTariffZoneId', concat('BRA:GroupOfTariffZones:', g),
                        'name:nor', concat('Gruppe-', g),
                        'privateCode', cast(g as string),
                        'PurposeOfGroupingRef', 'BRA:PurposeOfGrouping:farezone'))),
                'media_ref', cast(null as string), 'offset', 10),
            named_struct('kind', 'text', 'text', 'relation footer',
                         'media_ref', cast(null as string), 'offset', 20)
        ) as spans""",
    )

    # ---- point docs (StopPlace/Quay; 30% skewed into 3 hotspots) ----------
    p0 = n_zones + n_groups
    pr_hot = _pr(f"concat('{s}:hot:', p)")
    pr_cl = _pr(f"concat('{s}:cl:', p)")
    pr_la = _pr(f"concat('{s}:pla:', p)")
    pr_lo = _pr(f"concat('{s}:plo:', p)")
    points = (
        spark.range(n_points)
        .withColumnRenamed("id", "p")
        .selectExpr(
            "p",
            f"({pr_hot} < {flit(0.3)}) as hot",
            f"cast(floor({pr_cl} * 3) as int) as cl",
            f"{pr_la} as ula",
            f"{pr_lo} as ulo",
        )
        .selectExpr(
            "p",
            # hotspot centers are zone-like deterministic spots inside the bbox
            f"""case when hot
                 then {flit(lat_lo)} + ({flit(0.2)} + cl * {flit(0.3)}) * {flit(dlat)} + (ula - {flit(0.5)}) * {flit(0.01)}
                 else {flit(lat_lo)} + ula * {flit(dlat)} end as plat""",
            f"""case when hot
                 then {flit(lon_lo)} + ({flit(0.25)} + cl * {flit(0.25)}) * {flit(dlon)} + (ulo - {flit(0.5)}) * {flit(0.01)}
                 else {flit(lon_lo)} + ulo * {flit(dlon)} end as plon""",
            "case when p % 5 < 2 then 'StopPlace' else 'Quay' end as entity",
        )
    )
    point_docs = points.selectExpr(
        f"format_string('doc-%09d', {p0} + p) as doc_id",
        f"""array(
            named_struct('kind', 'text', 'text', concat('stop doc ', p),
                         'media_ref', cast(null as string), 'offset', 0),
            named_struct('kind', 'osm_node',
                'text', to_json(named_struct(
                    'id', 1000000000 + p,
                    'lat', plat, 'lon', plon,
                    'tags', map('entity', entity,
                                'id', concat('NSR:', entity, ':', p)))),
                'media_ref', cast(null as string), 'offset', 10),
            named_struct('kind', 'media', 'text', cast(null as string),
                         'media_ref', concat('media://img/stop/', p), 'offset', 20)
        ) as spans""",
    )

    # ---- filler docs -------------------------------------------------------
    f0 = p0 + n_points
    n_fill = max(0, n_docs - f0)
    wordpick = _pr(f"concat('{s}:w:', f, ':', w)")
    doclen = _pr(f"concat('{s}:len:', f)")
    vocab = (
        "array('the','quick','brown','fox','jumps','over','lazy','dog',"
        "'transit','zone','stop','fare','tile','norway','oslo','bergen')"
    )
    word = f"element_at({vocab}, cast(1 + floor({wordpick} * 16) as int))"
    sentence = f"concat_ws(' ', transform(sequence(0, cast(5 + floor({doclen} * 40) as int)), w -> {word}))"
    media_span = (
        "named_struct('kind', 'media', 'text', cast(null as string), "
        "'media_ref', concat('media://img/fill/', f), 'offset', 1)"
    )
    filler = (
        spark.range(n_fill)
        .withColumnRenamed("id", "f")
        .selectExpr(
            f"format_string('doc-%09d', {f0} + f) as doc_id",
            f"""concat(
                array(named_struct('kind', 'text', 'text', {sentence},
                                   'media_ref', cast(null as string), 'offset', 0)),
                case when f % 3 = 0 then array({media_span})
                     else array() end,
                array(named_struct('kind', 'text', 'text', concat('tail ', f),
                                   'media_ref', cast(null as string), 'offset', 2))
            ) as spans""",
        )
    )

    out = zone_docs.unionByName(rel_docs).unionByName(point_docs).unionByName(filler)
    # normalize to the declared span shape (cast target kept nullable: Spark
    # cannot cast into NOT NULL struct fields)
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("spans").cast(SPAN_CAST).alias("spans"),
    )


def zper_members(zper: int, n_zones: int) -> str:
    """SQL for the zone indexes of group g: consecutive block, clipped."""
    return f"filter(transform(sequence(0, {zper - 1}), i -> g * {zper} + i), mz -> mz < {n_zones})"


def smallosm_document(spark: SparkSession) -> DataFrame:
    """The reference's smallosm.xml (reference: smallosm.xml:1-17) encoded as
    one interleaved document — 2 nodes + 1 open 2-node way tagged as a
    TariffZone (micro parity fixture, FIXTURES.md §6)."""
    return spark.sql(
        """select 'doc-smallosm' as doc_id, array(
          named_struct('kind','text','text','smallosm header','media_ref',cast(null as string),'offset',0),
          named_struct('kind','osm_node','text',
            to_json(named_struct('id',-39122L,'lat',59.6714157e0,'lon',10.2251785e0,'tags',map('12','12'))),
            'media_ref',cast(null as string),'offset',10),
          named_struct('kind','osm_node','text',
            to_json(named_struct('id',-39124L,'lat',59.7304896e0,'lon',10.0912439e0,'tags',map('12','12'))),
            'media_ref',cast(null as string),'offset',20),
          named_struct('kind','osm_way','text',
            to_json(named_struct('id',-136284L,'nd_refs',array(-39122L,-39124L),
              'tags',map('area','tariffZone','codespace','BRA','name:nor','Kongsberg','reference','104'))),
            'media_ref',cast(null as string),'offset',30)
        ) as spans"""
    ).select(
        F.col("doc_id"),
        F.col("spans").cast(SPAN_CAST).alias("spans"),
    )
