"""Incremental CDC read between snapshots: append/delete windows, eq-delete
windows, overwrite surfaces as replace, net semantics inside the window."""

import pyspark.sql.functions as F

from osm_to_netex_spark.sources.catalog import SnapshotCatalog


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_append_window_inserts_only(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(spark.range(5).toDF("id"), "t", mode="overwrite")
    cat.commit(spark.range(5, 8).toDF("id"), "t", mode="append")
    ch = cat.changes("t", s1)
    assert _rows(ch, "id", "_change_type") == [
        (5, "insert"), (6, "insert"), (7, "insert")
    ]


def test_positional_delete_window(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(spark.range(6).toDF("id"), "t", mode="overwrite")
    cat.delete_where("t", "id in (1, 4)")
    ch = cat.changes("t", s1)
    assert _rows(ch, "id", "_change_type") == [(1, "delete"), (4, "delete")]


def test_eq_delete_window(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id: long, k: string"),
        "t", mode="overwrite",
    )
    cat.delete_keys("t", spark.createDataFrame([("a",)], "k: string"))
    ch = cat.changes("t", s1)
    assert _rows(ch, "id", "_change_type") == [(1, "delete"), (3, "delete")]


def test_merge_window_emits_both(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(
        spark.createDataFrame([("a", 1), ("b", 2)], "k: string, v: long"),
        "t", mode="overwrite",
    )
    cat.merge_into(
        spark.createDataFrame([("b", 20), ("c", 3)], "k: string, v: long"),
        "t", ["k"],
    )
    ch = cat.changes("t", s1)
    assert _rows(ch, "k", "v", "_change_type") == [
        ("b", 2, "delete"), ("b", 20, "insert"), ("c", 3, "insert")
    ]


def test_net_semantics_append_then_delete(spark, tmp_path):
    """A row appended AND deleted inside the window must not appear."""
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(spark.range(3).toDF("id"), "t", mode="overwrite")
    cat.commit(spark.range(10, 13).toDF("id"), "t", mode="append")
    cat.delete_where("t", "id = 11")
    ch = cat.changes("t", s1)
    assert _rows(ch, "id", "_change_type") == [(10, "insert"), (12, "insert")]


def test_overwrite_window_is_full_replace(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(spark.range(2).toDF("id"), "t", mode="overwrite")
    cat.commit(spark.range(100, 102).toDF("id"), "t", mode="overwrite")
    ch = cat.changes("t", s1)
    assert _rows(ch, "id", "_change_type") == [
        (0, "delete"), (1, "delete"), (100, "insert"), (101, "insert")
    ]


def test_empty_window(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(spark.range(2).toDF("id"), "t", mode="overwrite")
    ch = cat.changes("t", s1, s1)
    assert ch.count() == 0
    assert "_change_type" in ch.columns
