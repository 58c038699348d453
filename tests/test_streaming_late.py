"""Watermark late-data contract: a window that closed emits exactly once,
rows arriving after the watermark passed are dropped AND the drop is
visible in the engine's own metrics (numRowsDroppedByWatermark)."""

import datetime
import json

import pyspark.sql.functions as F

from osm_to_netex_spark.streaming import stream as st


def _write_batch(spark, path, seconds):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + datetime.timedelta(seconds=s),) for s in seconds],
        "ts: timestamp",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_available(spark, src, sink_dir, ckpt):
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = st.windowed_event_counts(stream, watermark="30 seconds", window="1 minute")
    q = (
        counts.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    progresses = []
    q.awaitTermination(120)
    for j in q.recentProgress:
        progresses.append(j if isinstance(j, dict) else json.loads(j.json) if hasattr(j, "json") else {})
    return progresses


def test_late_rows_dropped_and_counted(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # run 1: on-time data at t = 0..10 s and t = 200 s — watermark advances
    # to 170 s; the [0, 60) window closes and emits
    _write_batch(spark, src, [0, 5, 10, 200])
    _run_available(spark, src, sink, ckpt)

    # run 2 (same checkpoint): a straggler at t = 20 s — its window closed
    # long ago, the row must be DROPPED, not merged or re-emitted
    _write_batch(spark, src, [20, 205])
    prog = _run_available(spark, src, sink, ckpt)

    out = spark.read.parquet(sink)
    first_window = out.where("n is not null").where(
        F.col("win_start") == datetime.datetime(2024, 1, 1)
    )
    rows = first_window.collect()
    # the [0, 60) window emitted exactly once, with the 3 on-time rows only
    assert len(rows) == 1 and rows[0]["n"] == 3
    # the engine's own metric saw the dropped straggler
    assert st.dropped_by_watermark(prog) >= 1


def test_no_drops_without_stragglers(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [0, 10, 20])
    prog = _run_available(spark, src, sink, ckpt)
    assert st.dropped_by_watermark(prog) == 0
