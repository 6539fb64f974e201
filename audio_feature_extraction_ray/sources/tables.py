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
    return ray.data.read_parquet(path, columns=columns, **kwargs)
