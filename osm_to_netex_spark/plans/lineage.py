"""Checkpoint / lineage / idempotent resume (north rule, SURVEY §2.2).

A long pipeline over a pinned input snapshot processes work in *units*
(hash-buckets of doc_id — stable under any partitioning).  Each completed
unit commits its output tagged with lineage columns:

    (unit_id, input_snapshot_id, run_tag)

Resume = recompute the unit list, anti-join the lineage of already-committed
units for the same (snapshot, run_tag), and process only the remainder.
Because units are deterministic functions of the data and the output commit
is a snapshot append (sources.catalog — atomic metadata rename), a crashed
run never double-counts: re-running a partially-committed unit overwrites
nothing and its second commit is a no-op filtered by the anti-join.

With a real Iceberg catalog the same flow maps to MERGE/append + snapshot
reads; the parquet SnapshotCatalog implements identical semantics locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from ..sources.catalog import SnapshotCatalog

LINEAGE_COLS = ("unit_id", "input_snapshot_id", "run_tag")


def with_unit_id(df: DataFrame, n_units: int, key: str = "doc_id") -> DataFrame:
    """Stable unit assignment: unit_id = pmod(xxhash64(key), n_units).
    Hash-based (not partition-index-based) so it is invariant to
    repartitioning and cluster size — the property resume depends on."""
    return df.withColumn("unit_id", F.expr(f"pmod(xxhash64({key}), {n_units})"))


def completed_units(catalog: SnapshotCatalog, table: str, snapshot_id: str, run_tag: str) -> DataFrame:
    """Distinct unit_ids already committed for this (input snapshot, run)."""
    try:
        existing = catalog.read(table)
    except FileNotFoundError:
        return None
    return (
        existing.where(
            (F.col("input_snapshot_id") == snapshot_id) & (F.col("run_tag") == run_tag)
        )
        .select("unit_id")
        .distinct()
    )


def run_with_resume(
    catalog: SnapshotCatalog,
    input_table: str,
    output_table: str,
    transform: Callable[[DataFrame], DataFrame],
    n_units: int = 16,
    run_tag: str = "r0",
    key: str = "doc_id",
    snapshot_id: str | None = None,
    fail_after_units: int | None = None,
    unit_batch_size: int = 1,
) -> dict:
    """Process input in units with per-unit commit; resumes idempotently.

    transform: units subset of the input → output rows (must carry `key`).
    fail_after_units: test hook — simulate a crash after N unit commits.
    unit_batch_size: units per Spark job/commit.  1 = finest resume
    granularity but one source scan per unit — fine as a control plane for
    tens of units; when n_units grows into the hundreds+, raise the batch
    size so scan count stays n_units/batch (each batch is ONE job filtering
    `unit_id IN (...)`, committed atomically, lineage still tagged per
    row-derived unit so resume granularity is unchanged on re-read).
    Returns {'processed': [...], 'skipped': [...], 'snapshot_id': ...}.
    """
    meta = catalog.current_snapshot(input_table)
    snap = snapshot_id or meta["snapshot_id"]
    src = with_unit_id(catalog.read(input_table, snap), n_units, key)

    done_df = completed_units(catalog, output_table, snap, run_tag)
    done = (
        {r["unit_id"] for r in done_df.collect()} if done_df is not None else set()
    )

    todo = sorted(
        r["unit_id"]
        for r in src.select("unit_id").distinct().collect()
        if r["unit_id"] not in done
    )
    processed = []
    batch = max(1, unit_batch_size)
    for b0 in range(0, len(todo), batch):
        if fail_after_units is not None and len(processed) >= fail_after_units:
            raise RuntimeError(f"simulated crash before unit {todo[b0]}")
        units = todo[b0: b0 + batch]
        in_list = ", ".join(str(u) for u in units)
        subset = src.where(F.expr(f"unit_id IN ({in_list})"))
        out = transform(subset).withColumns(
            {
                # derive from the key, not a literal: rows in a multi-unit
                # batch carry their own unit's lineage
                "unit_id": F.expr(f"pmod(xxhash64({key}), {n_units})"),
                "input_snapshot_id": F.lit(snap),
                "run_tag": F.lit(run_tag),
            }
        )
        catalog.commit(out, output_table, mode="append")
        processed.extend(units)
    return {"processed": processed, "skipped": sorted(done), "snapshot_id": snap}
