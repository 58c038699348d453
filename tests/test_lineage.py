"""Checkpoint / lineage / idempotent-resume tests (FIXTURES.md §5 resume test:
kill after unit k, re-run, assert idempotent output)."""

import pytest
from pyspark.sql import functions as F

from osm_to_netex_spark.plans import lineage
from osm_to_netex_spark.sources.catalog import SnapshotCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "warehouse"))


def _seed_input(spark, catalog, n=100):
    df = spark.range(n).selectExpr("concat('doc-', id) as doc_id", "id as payload")
    snap = catalog.commit(df, "docs_in", mode="overwrite")
    return snap


def _transform(df):
    return df.select("doc_id", (F.col("payload") * 2).alias("doubled"))


def test_full_run_then_resume_is_noop(spark, catalog):
    _seed_input(spark, catalog)
    r1 = lineage.run_with_resume(catalog, "docs_in", "docs_out", _transform, n_units=6)
    assert len(r1["processed"]) == 6 and r1["skipped"] == []
    r2 = lineage.run_with_resume(catalog, "docs_in", "docs_out", _transform, n_units=6)
    assert r2["processed"] == [] and len(r2["skipped"]) == 6
    out = catalog.read("docs_out")
    assert out.count() == 100
    assert out.select("doc_id").distinct().count() == 100


def test_crash_and_resume_idempotent(spark, catalog):
    _seed_input(spark, catalog)
    with pytest.raises(RuntimeError, match="simulated crash"):
        lineage.run_with_resume(
            catalog, "docs_in", "docs_out", _transform, n_units=6, fail_after_units=2
        )
    partial = catalog.read("docs_out")
    n_partial = partial.count()
    assert 0 < n_partial < 100
    done_units = {r.unit_id for r in partial.select("unit_id").distinct().collect()}
    assert len(done_units) == 2

    r = lineage.run_with_resume(catalog, "docs_in", "docs_out", _transform, n_units=6)
    assert sorted(r["skipped"]) == sorted(done_units)
    assert len(r["processed"]) == 4
    out = catalog.read("docs_out")
    assert out.count() == 100
    assert out.groupBy("doc_id").count().where("count > 1").count() == 0  # no double-count
    # lineage columns present on every row
    assert out.where(
        F.col("unit_id").isNull()
        | F.col("input_snapshot_id").isNull()
        | F.col("run_tag").isNull()
    ).count() == 0


def test_snapshot_pinning_isolates_appends(spark, catalog):
    snap1 = _seed_input(spark, catalog, n=50)
    more = spark.range(50, 80).selectExpr("concat('doc-', id) as doc_id", "id as payload")
    snap2 = catalog.commit(more, "docs_in", mode="append")
    assert catalog.read("docs_in", snap1).count() == 50
    assert catalog.read("docs_in", snap2).count() == 80
    assert catalog.read("docs_in").count() == 80


def test_unit_assignment_partitioning_invariant(spark, catalog):
    df = spark.range(200).selectExpr("concat('d', id) as doc_id")
    a = {r.doc_id: r.unit_id for r in lineage.with_unit_id(df, 8).collect()}
    b = {
        r.doc_id: r.unit_id
        for r in lineage.with_unit_id(df.repartition(17), 8).collect()
    }
    assert a == b


def test_batched_units_equivalent_and_resumable(spark, catalog):
    """unit_batch_size>1 = one Spark job per batch (scan count n_units/batch)
    with identical output and per-row unit lineage derived from the key."""
    _seed_input(spark, catalog)
    with pytest.raises(RuntimeError, match="simulated crash"):
        lineage.run_with_resume(
            catalog, "docs_in", "docs_out", _transform, n_units=6,
            unit_batch_size=2, fail_after_units=2,
        )
    partial = catalog.read("docs_out")
    assert {r.unit_id for r in partial.select("unit_id").distinct().collect()} == set(
        partial.selectExpr("pmod(xxhash64(doc_id), 6) as u").distinct().toPandas()["u"]
    )
    r = lineage.run_with_resume(
        catalog, "docs_in", "docs_out", _transform, n_units=6, unit_batch_size=4
    )
    assert len(r["processed"]) == 4 and len(r["skipped"]) == 2
    out = catalog.read("docs_out")
    assert out.count() == 100
    assert out.groupBy("doc_id").count().where("count > 1").count() == 0
    assert out.where("unit_id != pmod(xxhash64(doc_id), 6)").count() == 0


def test_compaction_preserves_rows_and_time_travel(spark, catalog):
    for i in range(4):  # 4 appends -> 4 data dirs of small files
        catalog.commit(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id * 2 as v"),
            "events_c", mode="append",
        )
    pre = catalog.current_snapshot("events_c")
    assert len(pre["data_dirs"]) == 4
    res = catalog.compact("events_c")
    assert res["compacted"] and res["in_dirs"] == 4 and res["out_files"] == 1
    post = catalog.read("events_c")
    assert sorted(r["id"] for r in post.collect()) == list(range(40))
    # time travel to the pre-compaction snapshot still reads original files
    old = catalog.read("events_c", snapshot_id=pre["snapshot_id"])
    assert old.count() == 40
    # second compaction is a no-op
    res2 = catalog.compact("events_c")
    assert res2["compacted"] is False


def test_compaction_with_layout_clusters_ranges(spark, catalog):
    catalog.commit(
        spark.range(0, 100).selectExpr("cast(id * 37 % 100 as bigint) as k", "id"),
        "layout_c", mode="append",
    )
    catalog.commit(
        spark.range(100, 200).selectExpr("cast(id * 37 % 100 as bigint) as k", "id"),
        "layout_c", mode="append",
    )
    res = catalog.compact("layout_c", target_file_bytes=2048, layout_col="k")
    assert res["compacted"] and res["out_files"] >= 2
    assert catalog.read("layout_c").count() == 200
    # range layout: every output file is internally sorted on k, and file
    # [min,max] ranges don't interleave (scan pruning via footer stats works)
    import glob
    import os

    new_dir = catalog.current_snapshot("layout_c")["data_dirs"][0]
    ranges = []
    for f in sorted(glob.glob(os.path.join(new_dir, "*.parquet"))):
        ks = [r["k"] for r in spark.read.parquet(f).collect()]
        if not ks:
            continue
        assert ks == sorted(ks)
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    assert len(ranges) >= 2
    assert all(ranges[i][1] <= ranges[i + 1][0] for i in range(len(ranges) - 1))


# --- positional deletes (deletion vectors) ----------------------------------
def test_positional_delete_hides_rows_without_rewrite(spark, catalog):
    _seed_input(spark, catalog, n=100)
    before = catalog.current_snapshot("docs_in")
    res = catalog.delete_where("docs_in", "payload % 10 = 3")
    assert res["n_deleted"] == 10
    after = catalog.current_snapshot("docs_in")
    # zero data rewrite: same data dirs, one delete vector added
    assert after["data_dirs"] == before["data_dirs"]
    assert len(after["delete_dirs"]) == 1
    live = catalog.read("docs_in")
    assert live.count() == 90
    assert live.where("payload % 10 = 3").count() == 0
    # time travel to the parent still sees every row
    assert catalog.read("docs_in", before["snapshot_id"]).count() == 100


def test_deletes_survive_append_and_stack(spark, catalog):
    _seed_input(spark, catalog, n=50)
    catalog.delete_where("docs_in", "payload < 5")            # -5
    extra = spark.range(50, 60).selectExpr(
        "concat('doc-', id) as doc_id", "id as payload"
    )
    catalog.commit(extra, "docs_in", mode="append")           # +10 new rows
    assert catalog.read("docs_in").count() == 55
    catalog.delete_where("docs_in", "payload >= 55")          # -5 (new files)
    assert catalog.read("docs_in").count() == 50
    assert len(catalog.current_snapshot("docs_in")["delete_dirs"]) == 2
    # deleting an already-deleted row is a no-op (vectors apply before match)
    res = catalog.delete_where("docs_in", "payload < 5")
    assert res["n_deleted"] == 0


def test_compact_materializes_deletes_and_expire_drops_vectors(spark, catalog):
    _seed_input(spark, catalog, n=100)
    catalog.delete_where("docs_in", "payload >= 90")
    out = catalog.compact("docs_in")
    assert out["compacted"]
    meta = catalog.current_snapshot("docs_in")
    assert meta["delete_dirs"] == [] and catalog.read("docs_in").count() == 90
    import os

    gone = catalog.expire_snapshots("docs_in", keep_last=1)
    assert gone["expired_versions"] >= 2
    # the delete-vector dir is unreferenced after expiry and physically gone
    assert not os.path.isdir(os.path.join(catalog.root, "docs_in", "deletes")) or not any(
        os.scandir(os.path.join(catalog.root, "docs_in", "deletes"))
    )


# --- write-audit-publish ------------------------------------------------------
def test_wap_staged_invisible_until_published(spark, catalog):
    _seed_input(spark, catalog, n=20)
    bad = spark.range(5).selectExpr("concat('doc-', id) as doc_id", "id - 100 as payload")
    sid = catalog.stage(bad, "docs_in", mode="append")
    # production reads keep serving the published version
    assert catalog.read("docs_in").count() == 20
    # the audit reads the candidate explicitly
    audit = catalog.read("docs_in", sid)
    assert audit.count() == 25
    assert audit.where("payload < 0").count() == 5  # audit FAILS
    catalog.abandon("docs_in", sid)
    assert catalog.staged_snapshots("docs_in") == []
    assert catalog.read("docs_in").count() == 20


def test_wap_publish_promotes_atomically_and_rebases(spark, catalog):
    _seed_input(spark, catalog, n=20)
    good = spark.range(100, 105).selectExpr(
        "concat('doc-', id) as doc_id", "id as payload"
    )
    sid = catalog.stage(good, "docs_in", mode="append")
    # a concurrent append publishes while the candidate is under audit
    other = spark.range(200, 203).selectExpr(
        "concat('doc-', id) as doc_id", "id as payload"
    )
    catalog.commit(other, "docs_in", mode="append")
    assert catalog.read("docs_in").count() == 23
    catalog.publish("docs_in", sid)
    # published candidate rebased on the concurrent append: 20 + 3 + 5
    assert catalog.read("docs_in").count() == 28
    assert catalog.current_snapshot("docs_in")["snapshot_id"] == sid
    assert catalog.staged_snapshots("docs_in") == []


# --- schema evolution ---------------------------------------------------------
def test_schema_evolution_add_column(spark, catalog):
    _seed_input(spark, catalog, n=10)
    wider = spark.range(10, 15).selectExpr(
        "concat('doc-', id) as doc_id", "id as payload", "id * 10 as score"
    )
    catalog.commit(wider, "docs_in", mode="append")
    live = catalog.read("docs_in")
    assert set(live.columns) == {"doc_id", "payload", "score"}
    # old rows surface the new column as null; new rows carry it
    assert live.where("score is null").count() == 10
    assert live.where("score is not null").count() == 5
    # merged reads persist through further same-schema appends
    catalog.commit(wider, "docs_in", mode="append")
    assert set(catalog.read("docs_in").columns) == {"doc_id", "payload", "score"}


def test_schema_evolution_rejects_type_change(spark, catalog):
    _seed_input(spark, catalog, n=5)
    bad = spark.range(5).selectExpr(
        "concat('doc-', id) as doc_id", "cast(id as string) as payload"
    )
    with pytest.raises(ValueError, match="changes type"):
        catalog.commit(bad, "docs_in", mode="append")
    # table unharmed: the rejected write never reached the snapshot log
    assert catalog.read("docs_in").count() == 5
