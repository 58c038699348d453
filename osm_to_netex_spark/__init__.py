"""osm_to_netex_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of the reference converter ``entur/osm-to-netex``
(single-process Java, see /root/reference) as a distributed Spark engine:

* data model: Iceberg-style tables of interleaved text+media documents carrying
  OSM node/way/relation geometries in ordered spans
  (``sources.documents``), extracted to relational ``nodes``/``ways``/
  ``relations`` tables (``operators.extract``);
* reference parity: ordered polygon reassembly (J2), tag→zone mapping
  (M1–M7), relation grouping (J3/M6), validation (V1) — ``operators.assemble``,
  ``operators.zones``;
* engine operators mandated by the north rule: hex ("H3-style") and quadtree
  ("S2-style") cell indexes, polygon covering, k-ring expansion
  (``operators.tiling``), point-in-polygon binding (``operators.pip``),
  kNN linking (``operators.knn``), raster↔vector lookup (``operators.raster``);
* training-data-pipeline operators: dedup (exact/minhash/simhash/jaccard/
  embedding), ANN similarity search, text analysis, multimodal plumbing
  (``operators.dedup``, ``operators.similarity``, ``operators.textstats``,
  ``operators.media``);
* lineage/checkpoint + idempotent resume (``plans.lineage``) and a streaming
  ingest path (``streaming.stream``).

Everything in the hot path is Catalyst-native (whole-stage-codegen) column
expressions; Python appears only as Arrow-vectorized pandas UDFs where the
built-ins cannot express the semantics (media decode plumbing).
"""

__version__ = "0.1.0"
