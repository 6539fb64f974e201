"""Shared stage utilities."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def arrow_schema_of(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, pa.Schema]:
    """Return ``(ds, arrow schema)``, normalizing pandas-backed blocks.

    Parquet-sourced datasets are already Arrow; ``from_pandas`` datasets carry
    numpy dtypes in ``schema().types``, so those are converted through a no-op
    pyarrow ``map_batches`` (only the first block is materialized to infer the
    schema).
    """
    s = ds.schema()
    try:
        return ds, pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
    except TypeError:
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
        s = ds.schema()
        return ds, pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
