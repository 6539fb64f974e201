"""Parquet table source with pushed-down column pruning.

Replaces the reference's directory-glob sources (S1/S2, SURVEY.md §2.1): rows
in a columnar table, not files on disk. A thin indirection so the storage
format (parquet today; Lance when available) is a one-line switch.
"""

from __future__ import annotations

import functools
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


@functools.lru_cache(maxsize=256)
def _clean_schema(path: str) -> pa.Schema:
    """Footer schema with key-value metadata stripped.

    The driver-generated parquet carries a ``pandas`` metadata blob; a
    pa.Schema with metadata is unhashable, which defeats Ray Data's
    schema-deduplication fast path and floods worker logs with
    "Failed to hash the schemas" warnings. One footer read per path,
    memoized on the driver.
    """
    return pq.read_schema(path).remove_metadata()


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read ``{sf_dir}/{name}.parquet`` as a Dataset.

    Always pass ``columns`` in pipelines — a read that loads all columns for a
    two-column transform ships needless bytes out of storage at 100 TB scale.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if "schema" not in kwargs:
        full = _clean_schema(path)
        kwargs["schema"] = (
            pa.schema([full.field(c) for c in columns]) if columns else full
        )
    if pq.ParquetFile(path).metadata.num_rows == 0:
        # a ZERO-ROW table read through read_parquet loses its schema at
        # iteration (Ray drops 0-row blocks), which breaks every
        # schema-dependent downstream operator; hand back a typed empty
        # dataset from the footer schema instead (row filters are vacuous
        # on 0 rows)
        return ray.data.from_arrow(kwargs["schema"].empty_table())
    if "override_num_blocks" not in kwargs:
        kwargs["override_num_blocks"] = _default_blocks(path)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


@functools.lru_cache(maxsize=256)
def _default_blocks(path: str) -> int:
    """Block count sized to the DATA, not the cluster: Ray's default splits a
    tiny file into ~64+ blocks, and every downstream map/shuffle stage then
    pays ~64 task dispatches (~3 ms each) per operator — measured as 2-3x
    wall-clock on small-scale-factor shuffle queries at 32 CPUs. One footer
    read gives rows+bytes; ≥8 keeps small tables parallel enough for
    compute-heavy per-row stages, the byte term takes over at real scale
    (~64 MiB compressed per block)."""
    md = pq.ParquetFile(path).metadata
    by_rows = md.num_rows // 10_000
    by_bytes = sum(
        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
    ) // (128 << 20)
    return max(8, min(2048, max(by_rows, by_bytes)))


def read_table_any(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    file_format: str = "parquet",
    **kwargs,
) -> ray.data.Dataset:
    """Format-pluggable table read: ``parquet`` (delegates to
    :func:`read_table` — footer-pruned columns, data-sized blocks), ``csv``
    or ``json`` (newline-delimited JSONL, the standard text-corpus
    interchange format). Non-parquet formats have no footer to push column
    pruning into, so the projection applies immediately after the read —
    pruned before the first exchange, which is what matters for wire bytes;
    the scan itself still reads whole records (inherent to row-oriented
    formats, and the reason the engine's canonical storage is columnar).
    """
    if file_format == "parquet":
        return read_table(sf_dir, name, columns=columns, **kwargs)
    path = os.path.join(sf_dir, f"{name}.{file_format}")
    if file_format == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif file_format == "json":
        ds = ray.data.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported file_format: {file_format!r}")
    return ds.select_columns(columns) if columns else ds
