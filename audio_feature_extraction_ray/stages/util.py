"""Shared stage utilities."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def topk(
    ds: ray.data.Dataset,
    sort_keys: list[str],
    k: int,
    descending: bool | list[bool] = False,
) -> ray.data.Dataset:
    """Global top-k WITHOUT a global sort: per-block partial top-k (each block
    keeps only its k best rows), coalesce the ≤ blocks×k survivors into one
    block, final top-k there. Equivalent to ``ds.sort(...).limit(k)`` whenever
    ``sort_keys`` is a total order (add a tiebreak column, as the SQL oracles
    do) — pinned by the gate queries that use it. At 100 TB the all-to-all
    sort this replaces moves every row for a k-row answer.
    """
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    order = [(c, "descending" if d else "ascending") for c, d in zip(sort_keys, descending)]

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            # still sort so the final pass sees ordered runs (cheap: ≤ k rows)
            return t.take(pa.compute.sort_indices(t, sort_keys=order))
        idx = pa.compute.sort_indices(t, sort_keys=order)
        return t.take(idx.slice(0, k))

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)
    return parts.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )


def grouped_topk(
    ds: ray.data.Dataset,
    key: str,
    sort_keys: list[str],
    k: int,
    descending: bool | list[bool] = True,
) -> ray.data.Dataset:
    """Top-k rows PER GROUP (e.g. each user's k highest-value events) with a
    map-side combine: every batch keeps at most k rows per key it sees
    (vectorized run-boundary selection over a local sort), then one
    ``groupby(key)`` merge takes the global per-group top-k — the shuffle
    moves ≤ blocks×k rows per key, never the group's full history.
    ``sort_keys`` should total-order within a group (add a tiebreak)."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    order = [(key, "ascending")] + [
        (c, "descending" if d else "ascending") for c, d in zip(sort_keys, descending)
    ]

    def local(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return t
        idx = pa.compute.sort_indices(t, sort_keys=order)
        t = t.take(idx)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        # rank within each key run (runs are contiguous after the sort)
        starts = np.flatnonzero(np.concatenate(([True], kv[1:] != kv[:-1])))
        run_id = np.cumsum(np.concatenate(([False], kv[1:] != kv[:-1])))
        rank = np.arange(len(kv)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    partial = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby(key).map_groups(
        lambda g: local(g), batch_format="pyarrow"
    )


def arrow_schema_of(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, pa.Schema]:
    """Return ``(ds, arrow schema)``, normalizing pandas-backed blocks.

    Parquet-sourced datasets are already Arrow; ``from_pandas`` datasets carry
    numpy dtypes in ``schema().types``, so those are converted through a no-op
    pyarrow ``map_batches`` (only the first block is materialized to infer the
    schema).
    """
    s = ds.schema()
    if s is None:
        # a fully-empty dataset whose schema was erased by a schema-less
        # transform (e.g. map_batches over zero blocks) — no output schema
        # can be inferred. Empty datasets with KNOWN schemas (filtered reads,
        # from_arrow) pass through fine.
        raise ValueError(
            "dataset is empty with no known schema; schema-dependent operators "
            "cannot infer their output — materialize a typed empty input instead"
        )
    try:
        return ds, pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
    except TypeError:
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
        s = ds.schema()
        return ds, pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
