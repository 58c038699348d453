"""Coverage for the round-1 late additions: n-gram Jaccard pairs, IVF ANN
top-k, the multimodal media pipeline, and the Structured Streaming tile path
exposed through plans.queries."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osm_to_netex_spark.operators import dedup, media, similarity
from osm_to_netex_spark.plans import queries as Q
from osm_to_netex_spark.sources import documents as docs_src

SF = "/root/testdata/sf0.001"


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"create or replace view {t} as "
            f"select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).fetchall()


def test_ngram_jaccard_matches_duckdb_oracle(spark):
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in Q.q_ngram_jaccard(spark, SF).collect()
    }
    want = {tuple(r) for r in _duck(SF, Q.q_ngram_jaccard_oracle())}
    assert got == want


def test_ngram_jaccard_finds_planted_near_dup(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en"),
            (2, "alpha beta gamma delta epsilon eta", "en"),
            (3, "unrelated words entirely different text here", "en"),
            (4, "alpha beta gamma delta epsilon zeta", "no"),  # other block
        ],
        "doc_id long, text string, lang string",
    )
    pairs = dedup.ngram_jaccard_pairs(docs, n_shingle=3, threshold=0.3, prefilter_key="lang")
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(a != 4 and b != 4 for a, b in got)  # blocking respected


def test_ivf_topk_matches_duckdb_oracle(spark):
    got = {tuple(r) for r in Q.q_embed_topk_ivf(spark, SF).collect()}
    want = {tuple(r) for r in _duck(SF, Q.q_embed_topk_ivf_oracle())}
    assert got == want


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.where("vec_id % 50 = 0")
    brute = similarity.topk_cosine_brute(queries, emb, k=5)
    ivf = similarity.topk_cosine_ivf(queries, emb, k=5, n_centroids=16, n_probe=8)
    b = {(r.query_id, r.vec_id) for r in brute.collect()}
    a = {(r.query_id, r.vec_id) for r in ivf.collect()}
    assert len(a & b) / len(b) >= 0.5  # ANN recall floor at generous n_probe


def test_media_pipeline_deterministic_across_partitionings(spark):
    corpus = docs_src.synthesize_corpus(
        spark, n_docs=200, n_zones=8, n_groups=2, n_points=60
    )
    refs = media.extract_media_refs(corpus)
    f1 = media.decode_media(refs.repartition(2)).collect()
    f2 = media.decode_media(refs.repartition(13)).collect()
    key = lambda r: (r.doc_id, r.media_ref)  # noqa: E731
    assert sorted(map(key, f1)) == sorted(map(key, f2))
    d1 = {key(r): (r.format, r.width, r.height, r.n_frames, list(r.features)) for r in f1}
    d2 = {key(r): (r.format, r.width, r.height, r.n_frames, list(r.features)) for r in f2}
    assert d1 == d2
    assert all(len(v[4]) == media.FEATURE_DIM for v in d1.values())


def test_media_real_decode_falls_back_to_stub_for_non_pnm(spark):
    corpus = docs_src.synthesize_corpus(spark, n_docs=50, n_zones=4, n_groups=2, n_points=20)
    refs = media.extract_media_refs(corpus).limit(3)
    real = sorted(tuple(r) for r in media.decode_media(refs, real_decode=True).collect())
    stub = sorted(tuple(r) for r in media.decode_media(refs).collect())
    assert real == stub and len(real) > 0


def test_streaming_tiles_matches_batch(spark):
    out = Q.q_streaming_tiles(spark, SF)
    rows = {r.quad_cell: r.n_docs for r in out.collect()}
    assert rows and sum(rows.values()) > 0
    # batch equivalent over the same deterministic corpus
    from osm_to_netex_spark.functions import geo
    from osm_to_netex_spark.functions.portable import SPARK
    from osm_to_netex_spark.operators import extract

    from osm_to_netex_spark.plans.convert_queries import FIXTURE_CORPUS

    # the query streams the committed fixture corpus since it became
    # oracle-gated; the batch side must read the same fixture
    corpus = spark.read.parquet(FIXTURE_CORPUS)
    nodes = extract.extract_nodes(corpus)
    batch = (
        nodes.select("doc_id", F.expr(geo.quad_cell("lat", "lon", 8, SPARK)).alias("quad_cell"))
        .groupBy("quad_cell")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    assert rows == {r.quad_cell: r.n_docs for r in batch.collect()}


def test_asof_join_semantics(spark):
    """Merge-form as-of join: <= visibility, left-outer nulls, strict mode."""
    from osm_to_netex_spark.operators import temporal

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "w", 50)],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(100, "u", 10, 1.0), (101, "u", 15, 2.0), (102, "v", 1, 9.0)],
        ["rid", "k", "ts", "val"],
    )
    out = {
        r["id"]: (r["asof_rid"], r["asof_val"])
        for r in temporal.asof_join(
            left, right, keys=["k"], ts_col="ts",
            payload_cols=["rid", "val"], right_order_cols=["rid"],
        ).collect()
    }
    assert out[1] == (100, 1.0)      # equal ts visible (<=)
    assert out[2] == (101, 2.0)      # most recent prior
    assert out[3] == (None, None)    # nothing at or before ts=5
    assert out[4] == (None, None)    # no right rows for key w
    strict = {
        r["id"]: r["asof_rid"]
        for r in temporal.asof_join(
            left, right, keys=["k"], ts_col="ts",
            payload_cols=["rid", "val"], strict=True,
            right_order_cols=["rid"],
        ).collect()
    }
    assert strict[1] is None         # equal ts invisible (<)
    assert strict[2] == 101


def test_asof_join_payload_row_atomic(spark):
    """A right row with a NULL payload field must not be patched from an
    older right row column-wise."""
    from osm_to_netex_spark.operators import temporal

    left = spark.createDataFrame([(1, "u", 30)], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(100, "u", 10, 7.0), (101, "u", 20, None)],
        ["rid", "k", "ts", "val"],
    )
    row = temporal.asof_join(
        left, right, keys=["k"], ts_col="ts",
        payload_cols=["rid", "val"], right_order_cols=["rid"],
    ).collect()[0]
    assert row["asof_rid"] == 101 and row["asof_val"] is None


def test_date_interval_join_equals_naive(spark):
    """Bucketed equi-join + refine must equal the naive BETWEEN theta-join,
    including intervals spanning multiple buckets and boundary dates."""
    from osm_to_netex_spark.operators import temporal

    pts = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-08"), (3, "2024-02-15"), (4, "2023-12-31")],
        ["pid", "d"],
    )
    iv = spark.createDataFrame(
        [
            (10, "2024-01-01", "2024-01-08"),    # exactly bucket-width, both boundaries
            (11, "2024-01-05", "2024-02-20"),    # spans many buckets
            (12, "2024-03-01", "2024-03-02"),    # matches nothing
        ],
        ["iid", "s", "e"],
    )
    fast = temporal.date_interval_join(pts, iv, "d", "s", "e", bucket_days=7)
    naive = pts.crossJoin(iv).where(
        F.col("d").cast("date").between(F.col("s").cast("date"), F.col("e").cast("date"))
    )
    got = {(r["pid"], r["iid"]) for r in fast.collect()}
    want = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert got == want == {(1, 10), (2, 10), (2, 11), (3, 11)}


def test_cms_overestimates_and_bounds(spark):
    """CMS property: estimate >= exact for every key, and error bounded in
    practice on the fixture (4x256 registers, 10k events, ~150 users)."""
    rows = Q.q_cms_frequencies(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_n"]
    # with width 256 >> 150 users, most estimates are exact
    exact_frac = sum(1 for r in rows if r["cms_est"] == r["exact_n"]) / len(rows)
    assert exact_frac > 0.5


def test_resize_media_matches_numpy_reference(spark):
    import hashlib

    import numpy as np

    from osm_to_netex_spark.operators import media

    from osm_to_netex_spark.plans.convert_queries import FIXTURE_CORPUS

    corpus = spark.read.parquet(FIXTURE_CORPUS).limit(40)
    feats = media.decode_media(media.extract_media_refs(corpus))
    resized = media.resize_media(feats, target_w=128, target_h=96)
    rows = {r.media_ref: r for r in resized.collect()}
    assert rows and all(r.width == 128 and r.height == 96 for r in rows.values())
    # reference: re-derive one row end-to-end from the payload hash
    ref, row = next(iter(rows.items()))
    h = hashlib.sha256(f"blob:{ref}".encode()).digest()
    base = (
        np.frombuffer(h[: media.FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / np.float32(65535.0)
    )
    expect = np.interp(
        np.linspace(0.0, 1.0, num=media.FEATURE_DIM),
        np.linspace(0.0, 1.0, num=len(base)),
        base.astype(np.float64),
    ).astype(np.float32)
    assert np.array_equal(np.asarray(row.features, dtype=np.float32), expect)


def test_resize_partition_invariant(spark):
    from osm_to_netex_spark.operators import media
    from osm_to_netex_spark.plans.convert_queries import FIXTURE_CORPUS

    corpus = spark.read.parquet(FIXTURE_CORPUS).limit(60)
    feats = media.decode_media(media.extract_media_refs(corpus))
    a = {(r.media_ref, tuple(r.features)) for r in media.resize_media(feats).collect()}
    b = {(r.media_ref, tuple(r.features))
         for r in media.resize_media(feats.repartition(7)).collect()}
    assert a == b and len(a) > 0
