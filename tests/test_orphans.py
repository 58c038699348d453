"""remove_orphans: crash debris goes, every referenced dir stays."""

import os

from osm_to_netex_spark.sources.catalog import SnapshotCatalog


def test_orphan_removed_referenced_kept(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.commit(spark.range(5).toDF("id"), "t", mode="overwrite")
    cat.commit(spark.range(5, 8).toDF("id"), "t", mode="append")
    cat.delete_where("t", "id = 6")
    staged = cat.stage(spark.range(100).toDF("id"), "t")

    # simulate a writer that crashed before its metadata rename
    orphan = os.path.join(str(tmp_path), "t", "snapshots", "9999999-dead")
    spark.range(3).toDF("id").write.parquet(orphan)
    orphan_del = os.path.join(str(tmp_path), "t", "deletes", "9999999-dead")
    spark.range(0).selectExpr(
        "cast('x' as string) as file_path", "id as row_index"
    ).write.parquet(orphan_del)

    res = cat.remove_orphans("t")
    assert res["orphan_dirs_removed"] == 2
    assert not os.path.exists(orphan) and not os.path.exists(orphan_del)
    # nothing visible changed; staged snapshot still readable
    assert cat.read("t").count() == 7
    # staged append = parent's 7 live rows + the 100 staged rows
    assert cat.read("t", snapshot_id=staged).count() == 107
    # idempotent
    assert cat.remove_orphans("t")["orphan_dirs_removed"] == 0


def test_tagged_snapshot_dirs_survive(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    s1 = cat.commit(spark.range(4).toDF("id"), "t", mode="overwrite")
    cat.create_tag("t", "v1", s1)
    cat.commit(spark.range(9).toDF("id"), "t", mode="overwrite")
    cat.expire_snapshots("t", keep_last=1)
    res = cat.remove_orphans("t")
    assert res["orphan_dirs_removed"] == 0
    assert cat.read_ref("t", "v1").count() == 4
