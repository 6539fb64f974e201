"""Resumable partitioned parquet output with per-partition lineage manifest.

North_rule requirement (BASELINE.json): jobs checkpoint per-partition lineage
(partition id, row ranges/counts, feature hashes, throughput counters) and
resume exactly. The reference's analog is the crude save-every-10-pairs JSON
(05_dtw_alignment_experiment/dtw_alignment.py:1323-1325) which re-runs
everything on restart; here completed partitions are skipped.

Layout under ``out_dir``:
    part-{pid:05d}.parquet      — one file per hash partition of the key
    _manifest/{pid:05d}.json    — commit marker, written AFTER the data file
                                  (write-tmp → fsync-free rename on the same
                                  filesystem ⇒ atomic visibility)

Writer protocol per partition (idempotent):
    1. committed marker exists → skip (return its manifest row, counted as
       ``skipped``)
    2. write data to part-*.parquet.tmp-{uuid} → rename over part-*.parquet
    3. write manifest json to tmp → rename

A crash between 2 and 3 leaves an uncommitted data file that is simply
rewritten on resume — output content is deterministic, so the rewrite is
byte-identical.

Rows are hashed with a canonical order-insensitive digest so resume equality
is checkable without comparing files.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _partition_of(col: pa.ChunkedArray | pa.Array, n_partitions: int) -> np.ndarray:
    """Deterministic hash partition of a key column (crc32 of utf-8/bytes)."""
    vals = col.to_pylist()
    return np.array(
        [zlib.crc32(str(v).encode("utf-8")) % n_partitions for v in vals], dtype=np.int32
    )


def _content_hash(table: pa.Table, sort_keys: list[str]) -> str:
    """Order-insensitive content digest: canonical sort, then row digests."""
    if table.num_rows == 0:
        return "empty"
    idx = pa.compute.sort_indices(
        table, sort_keys=[(k, "ascending") for k in sort_keys if k in table.column_names]
    )
    t = table.take(idx)
    h = hashlib.sha256()
    for batch in t.to_batches():
        for col in sorted(t.column_names):
            arr = batch.column(batch.schema.get_field_index(col))
            h.update(str(arr.to_pylist()).encode("utf-8"))
    return h.hexdigest()


class _PartitionWriter:
    """Per-group writer actor fn: writes one partition atomically, emits its
    manifest row. ``fail_partitions`` injects crashes for resume testing."""

    def __init__(self, out_dir: str, sort_keys: list[str], fail_partitions=()):
        self.out_dir = out_dir
        self.sort_keys = sort_keys
        self.fail_partitions = set(fail_partitions)
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group.column("__part")[0].as_py())
        t0 = time.time()
        marker = os.path.join(self.out_dir, "_manifest", f"{pid:05d}.json")
        if os.path.exists(marker):
            with open(marker) as f:
                row = json.load(f)
            row["skipped"] = True
            return pa.Table.from_pylist([row])
        if pid in self.fail_partitions:
            raise RuntimeError(f"injected failure for partition {pid}")
        data = group.drop_columns(["__part"])
        path = os.path.join(self.out_dir, f"part-{pid:05d}.parquet")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(data, tmp)
        os.replace(tmp, path)  # atomic on same filesystem
        row = {
            "partition_id": pid,
            "rows": data.num_rows,
            "content_hash": _content_hash(data, self.sort_keys),
            "path": path,
            "write_seconds": round(time.time() - t0, 4),
            "rows_per_sec": round(data.num_rows / max(time.time() - t0, 1e-9), 1),
            "skipped": False,
        }
        mtmp = f"{marker}.tmp-{uuid.uuid4().hex[:8]}"
        with open(mtmp, "w") as f:
            json.dump(row, f)
        os.replace(mtmp, marker)
        return pa.Table.from_pylist([row])


def write_partitioned_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    key: str,
    n_partitions: int = 32,
    sort_keys: list[str] | None = None,
    fail_partitions: tuple[int, ...] = (),
) -> pa.Table:
    """Write ``ds`` as ``n_partitions`` hash-partitioned parquet files with a
    lineage manifest; re-running after a failure skips committed partitions.

    Returns the manifest table (one row per partition). The shuffle key is
    ``key`` (entities never split across partitions → per-entity window state
    stays local on downstream reads).
    """
    sort_keys = sort_keys or [key]
    os.makedirs(out_dir, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(_partition_of(t.column(key), n_partitions)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    writer = _PartitionWriter(out_dir, sort_keys, fail_partitions)

    def write_group(group: pa.Table) -> pa.Table:
        return writer(group)

    manifest_ds = tagged.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    tables = list(manifest_ds.iter_batches(batch_format="pyarrow", batch_size=None))
    manifest = pa.concat_tables(tables) if tables else None
    # driver-side manifest summary (small)
    if manifest is not None:
        summary = {
            "partitions": manifest.num_rows,
            "rows": int(pa.compute.sum(manifest.column("rows")).as_py() or 0),
            "completed_at": time.time(),
        }
        tmp = os.path.join(out_dir, "_manifest", "_summary.json.tmp")
        with open(tmp, "w") as f:
            json.dump(summary, f)
        os.replace(tmp, os.path.join(out_dir, "_manifest", "_summary.json"))
    return manifest


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Read a resumable-partitioned output with ONE block per partition file,
    preserving the entity-partitioning contract (every entity's rows in one
    block) so downstream window ops may use ``assume_partitioned=True``.

    Plain ``read_parquet`` may split a file into several blocks mid-entity —
    this reader pins block count to file count.
    """
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {out_dir}")
    return ray.data.read_parquet(files, override_num_blocks=len(files))


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    if not os.path.isdir(mdir):
        return rows
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json") and not name.startswith("_"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
    return rows
