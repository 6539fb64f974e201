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

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

import ray.data

# Partitioning-scheme tag recorded in every output's manifest. Exact resume
# depends on rows hashing to the SAME partition across runs; if the hash
# scheme ever changes (it did once: crc32 → FNV-1a), resuming a directory
# written under the old scheme would silently mix two layouts. The writers
# record this tag and refuse to resume on mismatch.
PARTITION_SCHEME = "fnv1a-v1"


def _check_scheme(out_dir: str, n_partitions: int | None) -> None:
    """Write (first run) or verify (resume) the partitioning-scheme marker."""
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, "_scheme.json")
    want = {"scheme": PARTITION_SCHEME, "n_partitions": n_partitions}
    if os.path.exists(path):
        with open(path) as f:
            have = json.load(f)
        if have != want:
            raise ValueError(
                f"checkpoint dir {out_dir!r} was written with partitioning "
                f"{have}, this writer uses {want}; resuming would mix two "
                f"partition layouts — delete the directory (or rerun with the "
                f"matching scheme) instead"
            )
        return
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(want, f)
    os.replace(tmp, path)


def _write_table(table: pa.Table, path: str, file_format: str) -> None:
    if file_format == "parquet":
        pq.write_table(table, path)
    elif file_format == "csv":
        # K1–K3 CSV sink parity (the reference exports per-category CSVs,
        # 04_feature_extraction_experiment/feature_extractor.py:747-787)
        pacsv.write_csv(table, path)
    else:
        raise ValueError(f"unsupported file_format {file_format!r}")


def _partition_of(col: pa.ChunkedArray | pa.Array, n_partitions: int) -> np.ndarray:
    """Deterministic hash partition of a key column.

    Vectorized FNV-1a over each key's decimal/utf-8 string bytes — explicit
    arithmetic (no library row-hash) so partition assignment is stable across
    processes AND library versions, which exact resume depends on. The only
    Python-level loop is over the MAX KEY LENGTH (≈10–20 iterations), never
    over rows.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    s = pa.compute.cast(arr, pa.large_string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    off = np.frombuffer(s.buffers()[1], dtype=np.int64)[s.offset : s.offset + n + 1]
    data = (
        np.frombuffer(s.buffers()[2], dtype=np.uint8)
        if s.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    lens = np.diff(off)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    P = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max()) if n else 0):
            active = lens > j
            b = data[off[:-1][active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * P
    return (h % np.uint64(n_partitions)).astype(np.int32)


def _canonical_order(table: pa.Table, sort_keys: list[str]) -> pa.Array:
    """Total-order sort indices: the caller's sort_keys first, then every
    remaining column as tiebreak — the same row multiset always yields the
    same row sequence, however blocks arrived (upstream operators do not
    guarantee arrival order; byte-identical output must not depend on it)."""
    keys = [k for k in sort_keys if k in table.column_names]
    keys += [c for c in sorted(table.column_names) if c not in keys]
    sortable = [
        k for k in keys
        if not pa.types.is_nested(table.schema.field(k).type)
        and not pa.types.is_binary(table.schema.field(k).type)
        and not pa.types.is_large_binary(table.schema.field(k).type)
    ]
    return pa.compute.sort_indices(table, sort_keys=[(k, "ascending") for k in sortable])


def _content_hash(table: pa.Table, sort_keys: list[str]) -> str:
    """Order-insensitive content digest: canonical sort, then sha256 of the
    Arrow IPC stream bytes (columnar — no python value materialization)."""
    if table.num_rows == 0:
        return "empty"
    idx = _canonical_order(table, sort_keys)
    t = table.take(idx).select(sorted(table.column_names)).combine_chunks()
    import io

    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return hashlib.sha256(sink.getvalue()).hexdigest()


class _PartitionWriter:
    """Per-group writer actor fn: writes one partition atomically, emits its
    manifest row. ``fail_partitions`` injects crashes for resume testing."""

    def __init__(self, out_dir: str, sort_keys: list[str], fail_partitions=(),
                 file_format: str = "parquet", group_transform=None):
        self.out_dir = out_dir
        self.sort_keys = sort_keys
        self.fail_partitions = set(fail_partitions)
        self.file_format = file_format
        self.group_transform = group_transform
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
        if self.group_transform is not None:
            # runs AFTER the commit-marker skip, so resumed partitions never
            # pay the transform; the manifest hash covers transformed rows
            data = self.group_transform(data)
        # canonical row order INSIDE the file: upstream arrival order is
        # scheduling-dependent; byte-identical resume/rerun requires the
        # file bytes to be a pure function of the row multiset
        data = data.take(_canonical_order(data, self.sort_keys)).combine_chunks()
        ext = "parquet" if self.file_format == "parquet" else self.file_format
        path = os.path.join(self.out_dir, f"part-{pid:05d}.{ext}")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        _write_table(data, tmp, self.file_format)
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
    file_format: str = "parquet",
    group_transform=None,
) -> pa.Table:
    """Write ``ds`` as ``n_partitions`` hash-partitioned parquet files with a
    lineage manifest; re-running after a failure skips committed partitions.

    Returns the manifest table (one row per partition). The shuffle key is
    ``key`` (entities never split across partitions → per-entity window state
    stays local on downstream reads).

    ``group_transform`` (optional, deterministic ``pa.Table -> pa.Table``)
    runs inside each partition's write task, after the commit-marker skip
    and before the canonical sort — FUSING an expensive per-partition
    transform (e.g. decode + pack) into the write so its OUTPUT never enters
    a second exchange; only the pre-transform rows cross the wire. The
    partition key must be a column of the PRE-transform rows that the
    transform preserves per row-group.
    """
    sort_keys = sort_keys or [key]
    os.makedirs(out_dir, exist_ok=True)
    _check_scheme(out_dir, n_partitions)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__part", pa.array(_partition_of(t.column(key), n_partitions)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    writer = _PartitionWriter(out_dir, sort_keys, fail_partitions, file_format,
                              group_transform=group_transform)

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


def write_value_partitioned_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    category_col: str,
    sort_keys: list[str] | None = None,
    fail_categories: tuple[str, ...] = (),
    file_format: str = "parquet",
) -> pa.Table:
    """K3 per-group splits: one output file PER CATEGORY VALUE (the
    reference's per-category CSV exports,
    04_feature_extraction_experiment/feature_extractor.py:747-787), with the
    same atomic-commit + skip-on-resume manifest protocol as the hash-
    partitioned writer.

    Partition id = stable hash of the category value; the manifest row also
    records the category value itself. The data file is named
    ``cat-<digest>-<value>.parquet`` where ``digest`` is a stable hash of the
    FULL category value — the sanitized/truncated value suffix is cosmetic,
    so categories like ``'a/b'`` vs ``'a_b'`` (or long values sharing an
    80-char prefix) can never collide onto one file or manifest marker.
    Unknown/unbounded category cardinality is the caller's risk — each
    distinct value is one file, the natural layout when a downstream consumer
    reads one category at a time.
    """
    sort_keys = sort_keys or [category_col]
    _check_scheme(out_dir, None)
    fail = set(str(v) for v in fail_categories)

    def write_group(group: pa.Table) -> pa.Table:
        val = group.column(category_col)[0].as_py()
        digest = hashlib.md5(str(val).encode("utf-8")).hexdigest()[:12]
        safe = digest + "-" + "".join(
            ch if ch.isalnum() or ch in "-_." else "_" for ch in str(val)
        )[:64]
        pid = int(_partition_of(pa.array([str(val)]), 1 << 30)[0])
        marker = os.path.join(out_dir, "_manifest", f"cat-{safe}.json")
        t0 = time.time()
        if os.path.exists(marker):
            with open(marker) as f:
                row = json.load(f)
            row["skipped"] = True
            return pa.Table.from_pylist([row])
        if str(val) in fail:
            raise RuntimeError(f"injected failure for category {val!r}")
        ext = "parquet" if file_format == "parquet" else file_format
        path = os.path.join(out_dir, f"cat-{safe}.{ext}")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        # canonical sort BEFORE writing — group row order is scheduling-
        # dependent, and the resume contract promises a byte-identical
        # rewrite (the hash-partitioned writer sorts identically; hashing
        # sorted rows while writing unsorted ones broke that promise)
        group = group.take(_canonical_order(group, sort_keys))
        _write_table(group, tmp, file_format)
        os.replace(tmp, path)
        row = {
            "partition_id": pid,
            "category": str(val),
            "rows": group.num_rows,
            "content_hash": _content_hash(group, sort_keys),
            "path": path,
            "write_seconds": round(time.time() - t0, 4),
            "rows_per_sec": round(group.num_rows / max(time.time() - t0, 1e-9), 1),
            "skipped": False,
        }
        mtmp = f"{marker}.tmp-{uuid.uuid4().hex[:8]}"
        with open(mtmp, "w") as f:
            json.dump(row, f)
        os.replace(mtmp, marker)
        return pa.Table.from_pylist([row])

    # null-safe: a NULL category forms ONE partition (written as the
    # str(None) = "None" category file) instead of crashing the sort-based
    # groupby — partition columns in real corpora are nullable
    from ..stages.util import null_safe_map_groups

    manifest_ds = null_safe_map_groups(ds, category_col, write_group)
    tables = list(manifest_ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(tables) if tables else None


def read_partitioned(out_dir: str, validate_key: str | None = None) -> "ray.data.Dataset":
    """Read a resumable-partitioned output with ONE block per partition file,
    preserving the entity-partitioning contract (every entity's rows in one
    block) so downstream window ops may use ``assume_partitioned=True``.

    ``override_num_blocks`` pins the READ task count to the file count, but
    Ray Data's dynamic block splitting may still split a large file's output
    mid-entity (silently breaking the contract once partition files exceed
    the target block size). Pass ``validate_key`` to VERIFY the invariant
    instead of trusting it: a streaming per-block distinct-key scan asserts
    no key occupies more than one block and raises otherwise — callers then
    fall back to the ``groupby`` shuffle path (``assume_partitioned=False``).
    The check moves one row per (block, distinct key) to the driver — bounded
    by entity count, never row count.
    """
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {out_dir}")
    ds = ray.data.read_parquet(files, override_num_blocks=len(files))
    if validate_key is not None:
        import uuid as _uuid

        def block_keys(block: pa.Table) -> pa.Table:
            bid = _uuid.uuid4().hex  # one id per physical block
            uniq = pa.compute.unique(block.column(validate_key))
            return pa.table(
                {"__key": uniq, "__block": pa.array([bid] * len(uniq), pa.string())}
            )

        per_block = ds.map_batches(
            block_keys, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        seen: dict = {}
        for batch in per_block.iter_batches(batch_format="pyarrow", batch_size=None):
            for k, b in zip(batch.column("__key").to_pylist(), batch.column("__block").to_pylist()):
                if seen.setdefault(k, b) != b:
                    raise ValueError(
                        f"entity-locality violated: key {k!r} spans multiple blocks "
                        f"(dynamic block splitting?) — use the shuffle path "
                        f"(assume_partitioned=False) for this input"
                    )
    return ds


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


def partition_of(col: pa.ChunkedArray | pa.Array, n_partitions: int) -> np.ndarray:
    """Public alias of the stable partition hash — sources use it to push a
    committed-partition filter down to generation/read time on resume."""
    return _partition_of(col, n_partitions)


def completed_partitions(out_dir: str, n_partitions: int) -> set[int]:
    """Partition ids already committed under ``out_dir`` (empty when no
    manifest yet). Verifies the partitioning-scheme marker first — pruning a
    source with partition ids computed under a DIFFERENT scheme would
    silently drop wrong data, the exact corruption the scheme marker exists
    to prevent."""
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done: set[int] = set()
    for name in os.listdir(mdir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            done.add(int(stem))
    if done:
        if not os.path.exists(os.path.join(mdir, "_scheme.json")):
            # commit markers without a scheme marker: the layout they were
            # written under is unknowable — refusing beats pruning sources
            # against a possibly different partition hash/count
            raise RuntimeError(
                f"{mdir} has {len(done)} commit marker(s) but no "
                f"_scheme.json — cannot verify they used the same "
                f"partitioning scheme (n_partitions={n_partitions}); "
                f"delete the manifest or restore its _scheme.json"
            )
        _check_scheme(out_dir, n_partitions)  # raises on mismatch
    return done
