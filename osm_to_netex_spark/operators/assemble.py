"""J2 — ordered polygon reassembly: way.nd_refs → packed pos_list.

Reference semantics (OsmToNetexMapper.java:251-267): for each way, look up
every nd ref in the node map **in nd order** and emit a flat
[lat, lon, lat, lon, …] list; a missing ref is an error (NPE ⇒ inner-join-
with-error), duplicate node ids upstream are an error (Collectors.toMap,
OsmToNetexTransformer.java:98-99).

Spark plan: posexplode(nd_refs) → equi-join to nodes → collect_list of
(pos, lat, lon) structs → array_sort by pos → flatten.  collect_list order is
NOT deterministic under shuffle, so the position is carried through the join
and restored with array_sort — the ordering guarantee lives in the data, not
the execution (SURVEY §4 caveat a).

Scale: the join key is node_id.  For planet-scale inputs both sides are huge
→ sort-merge join with AQE; when the node set fits the broadcast threshold,
pass broadcast_nodes=True to skip the shuffle entirely (the reference's
"whole node map in heap" case, distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assemble_poslist(
    ways: DataFrame,
    nodes: DataFrame,
    broadcast_nodes: bool = False,
    strict: bool = True,
    broadcast_ways: bool = False,
) -> DataFrame:
    """ways(way_id, nd_refs, tags…) × nodes(node_id, lat, lon)
    → (way_id, tags, pos_list array<double>).

    strict=True reproduces the reference's error semantics: any nd ref that
    resolves to no node fails the job (listing offenders), as does any
    duplicated node id among the referenced nodes.
    """
    node_side = nodes.select("node_id", "lat", "lon")
    if broadcast_nodes:
        node_side = F.broadcast(node_side)

    exploded = ways.select(
        "way_id", "tags", F.posexplode("nd_refs").alias("pos", "ref")
    )
    if broadcast_ways:
        # when ways are the small side (few zones, huge node table) broadcast
        # the exploded refs and stream the node table map-side — no driver
        # collect of the big side.  An outer join cannot broadcast its
        # preserved side, so use INNER (a dropped row == an unresolved ref;
        # strict mode detects that by count comparison instead of null scan).
        joined = node_side.join(
            F.broadcast(exploded), exploded.ref == node_side.node_id, "inner"
        )
        if strict:
            n_refs = exploded.count()
            n_matched = joined.count()
            if n_matched != n_refs:
                missing = exploded.join(
                    node_side, exploded.ref == node_side.node_id, "left_anti"
                ).select("way_id", "ref").limit(10).collect()
                raise ValueError(
                    f"unresolved nd refs (reference NPEs here, OsmToNetexMapper.java:255): {missing}"
                )
    else:
        joined = exploded.join(node_side, exploded.ref == node_side.node_id, "left")
        if strict:
            missing = joined.where(F.col("node_id").isNull()).select("way_id", "ref")
            offenders = missing.limit(10).collect()
            if offenders:
                raise ValueError(
                    f"unresolved nd refs (reference NPEs here, OsmToNetexMapper.java:255): {offenders}"
                )
        else:
            # lenient mode: drop unresolved vertices instead of erroring
            joined = joined.where(F.col("node_id").isNotNull())

    if strict:
        dupes = (
            node_side.groupBy("node_id").count().where(F.col("count") > 1).limit(10).collect()
        )
        if dupes:
            raise ValueError(
                f"duplicate node ids (reference throws, OsmToNetexTransformer.java:98): {dupes}"
            )

    return (
        joined.groupBy("way_id")
        .agg(
            F.first("tags").alias("tags"),
            F.array_sort(
                F.collect_list(F.struct("pos", "lat", "lon"))
            ).alias("pts"),  # sort by pos (first struct field) → nd order restored
        )
        .select(
            "way_id",
            "tags",
            F.expr("flatten(transform(pts, p -> array(p.lat, p.lon)))").alias("pos_list"),
        )
    )
