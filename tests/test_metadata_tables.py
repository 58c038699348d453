"""history() and files() metadata tables."""

from osm_to_netex_spark.sources.catalog import SnapshotCatalog


def test_history_rows(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.commit(spark.range(4).toDF("id"), "t", mode="overwrite")
    cat.commit(spark.range(4, 6).toDF("id"), "t", mode="append")
    cat.delete_where("t", "id = 1")
    h = cat.history("t").orderBy("sequence").collect()
    assert [r["mode"] for r in h] == ["overwrite", "append", "delete"]
    assert [r["sequence"] for r in h] == [0, 1, 2]
    assert h[1]["n_data_dirs"] == 2 and h[2]["n_delete_files"] == 1


def test_files_matches_footers(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.commit(spark.range(10).coalesce(2).toDF("id"), "t", mode="overwrite")
    f = cat.files("t")
    rows = f.collect()
    assert sum(r["row_count"] for r in rows) == 10
    assert all(r["size_bytes"] > 0 for r in rows)
    assert all(r["file_path"].endswith(".parquet") for r in rows)
