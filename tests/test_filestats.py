"""Manifest-style file stats + range-scan file skipping: disjoint appends
prune to one file set, results equal the unpruned filter, conservative on
null stats, delete vectors still apply."""

from osm_to_netex_spark.sources.catalog import SnapshotCatalog


def _table(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    # three appends with disjoint id ranges, one file each
    cat.commit(spark.range(0, 100).coalesce(1).toDF("id"), "t", mode="overwrite")
    cat.commit(spark.range(100, 200).coalesce(1).toDF("id"), "t", mode="append")
    cat.commit(spark.range(200, 300).coalesce(1).toDF("id"), "t", mode="append")
    return cat


def test_prune_selects_only_overlapping_files(spark, tmp_path):
    cat = _table(spark, tmp_path)
    stats = cat.collect_file_stats("t", ["id"])
    assert len(stats["files"]) == 3
    files, total = cat.prune_files("t", "id", 120, 130)
    assert total == 3 and len(files) == 1
    # boundary-straddling range touches two files
    files2, _ = cat.prune_files("t", "id", 95, 105)
    assert len(files2) == 2
    # out-of-range probe prunes everything
    files3, _ = cat.prune_files("t", "id", 1000, 2000)
    assert files3 == []


def test_scan_equals_unpruned_filter(spark, tmp_path):
    cat = _table(spark, tmp_path)
    got = sorted(r.id for r in cat.scan("t", "id", 120, 130).collect())
    want = sorted(
        r.id for r in cat.read("t").where("id between 120 and 130").collect()
    )
    assert got == want == list(range(120, 131))
    # empty result keeps the schema and returns zero rows
    assert cat.scan("t", "id", 1000, 2000).count() == 0


def test_scan_applies_delete_vectors(spark, tmp_path):
    cat = _table(spark, tmp_path)
    cat.delete_where("t", "id in (125, 126)")
    got = sorted(r.id for r in cat.scan("t", "id", 120, 130).collect())
    assert got == [120, 121, 122, 123, 124, 127, 128, 129, 130]


def test_null_stats_are_conservative(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(None,), (None,)], "v: int"
    ).coalesce(1)
    cat.commit(df, "t", mode="overwrite")
    cat.commit(
        spark.createDataFrame([(5,), (7,)], "v: int").coalesce(1), "t", mode="append"
    )
    files, total = cat.prune_files("t", "v", 100, 200)
    # the all-null file cannot be ruled out; the [5,7] file can
    assert total == 2 and len(files) == 1
