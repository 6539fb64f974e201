"""Shared stage utilities."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def null_safe_group_codes(col):
    """Dictionary codes for a group-key column with SQL GROUP BY null
    semantics: all NULL keys form ONE extra group (code = len(dictionary))
    instead of the INT64_MIN garbage ``to_numpy().astype(int64)`` produces
    from null indices (which crashes scatter/take indexing downstream).

    Returns ``(codes, labels_of, n_groups)``: an int64 code per row, a
    ``labels_of(code_array) -> pa.Array`` mapping codes back to key values
    (the null-group sentinel maps to a null), and the group count
    (``len(dictionary)`` + 1 when nulls are present).
    """
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    de = arr.dictionary_encode()
    nd = len(de.dictionary)
    idx = de.indices
    has_null = bool(idx.null_count)
    if has_null:
        codes = idx.fill_null(nd).to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)

    def labels_of(code_arr) -> pa.Array:
        a = np.asarray(code_arr, dtype=np.int64)
        mask = a >= nd
        return de.dictionary.take(
            pa.array(np.where(mask, 0, a), pa.int64(), mask=mask))

    return codes, labels_of, nd + (1 if has_null else 0)


def _null_fill_sentinel(t: pa.DataType):
    """A same-type constant usable as ``pc.fill_null`` padding. The value
    never leaks into results — a parallel is-null flag column disambiguates
    real sentinels from filled nulls."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_floating(t):
        return pa.scalar(0.0, t)
    if pa.types.is_integer(t):
        return pa.scalar(0, t)
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_boolean(t):
        return pa.scalar(0, pa.int64()).cast(t)
    if pa.types.is_decimal(t):
        import decimal

        return pa.scalar(decimal.Decimal(0), t)
    return None


def null_filled_key(arr: "pa.Array", key_name: str) -> "pa.Array":
    """``arr`` with nulls replaced by the type's sentinel — the shared
    null-safe-groupby filler. Dictionary keys are decoded first (their
    sentinel is the value type's). Raises instead of silently passing
    nulls through for a type with no sentinel: a null key reaching the
    grouper re-exposes the duplicate-null-group bug this layer exists to
    prevent, so an unsupported nullable key type must be loud."""
    import pyarrow.compute as pc

    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()
    if arr.null_count == 0:
        return arr
    sent = _null_fill_sentinel(arr.type)
    if sent is None:
        raise TypeError(
            f"group key {key_name!r} has nulls and type {arr.type} has no "
            f"null-fill sentinel — cast the key to a supported type "
            f"(string/int/float/timestamp/date/bool/binary/decimal) or "
            f"filter nulls first"
        )
    return pc.fill_null(arr, sent)


def _null_safe_key_encode(keys: list[str]):
    """Shared surrogate-key encoder for null-tolerant Ray groupby: returns
    ``(encode_fn, flag_cols, val_cols)`` where ``encode_fn`` appends, per
    key, an int8 is-null flag plus the key filled with a same-type sentinel.
    Grouping on the (flag, filled) pairs is exactly SQL GROUP BY (one NULL
    group) while keeping every shuffle key column non-null — which both
    Ray's sort-based groupby (numpy object-sort crash on None) and pyarrow
    16's Table.group_by (duplicate null groups after hash-table growth)
    require."""
    import pyarrow.compute as pc

    flag_cols = [f"__nsk_n{i}" for i in range(len(keys))]
    val_cols = [f"__nsk_v{i}" for i in range(len(keys))]

    def encode(t: pa.Table) -> pa.Table:
        for i, k in enumerate(keys):
            col = t.column(k)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            t = t.append_column(flag_cols[i], pc.cast(pc.is_null(arr), pa.int8()))
            t = t.append_column(val_cols[i], null_filled_key(arr, k))
        return t

    return encode, flag_cols, val_cols


def null_safe_map_groups(
    ds: ray.data.Dataset,
    keys: str | list[str],
    fn,
    batch_format: str = "pyarrow",
) -> ray.data.Dataset:
    """``ds.groupby(keys).map_groups(fn)`` that tolerates NULL group keys.

    Groups on the non-null surrogate pairs from :func:`_null_safe_key_encode`
    and hands ``fn`` the original columns (null keys intact) with the
    surrogates stripped — SQL GROUP BY null semantics, no Ray sort crash.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    encode, flag_cols, val_cols = _null_safe_key_encode(keys)
    surrogates = [c for pair in zip(flag_cols, val_cols) for c in pair]

    def strip_then(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(surrogates))

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(surrogates).map_groups(strip_then, batch_format=batch_format)


def null_safe_groupby_aggregate(
    ds: ray.data.Dataset,
    keys: str | list[str],
    *aggs,
) -> ray.data.Dataset:
    """``ds.groupby(keys).aggregate(*aggs)`` that tolerates NULL group keys:
    aggregate over the non-null surrogates, then restore the original key
    columns (nulls reconstructed from the flag) in key-first column order."""
    import pyarrow.compute as pc

    keys = [keys] if isinstance(keys, str) else list(keys)
    encode, flag_cols, val_cols = _null_safe_key_encode(keys)
    surrogates = [c for pair in zip(flag_cols, val_cols) for c in pair]
    out = ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(surrogates).aggregate(*aggs)

    def decode(t: pa.Table) -> pa.Table:
        for i, k in enumerate(keys):
            val = t.column(val_cols[i])
            val = val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val
            isnull = pc.cast(t.column(flag_cols[i]), pa.bool_())
            t = t.append_column(k, pc.if_else(isnull, pa.scalar(None, val.type), val))
        rest = [c for c in t.column_names if c not in keys and c not in surrogates]
        return t.select(keys + rest)

    return out.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


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
        # null-safe run codes: NULL keys are ONE group (SQL PARTITION BY) —
        # a raw to_numpy would NaN-degrade them and make every null row its
        # own run (NaN != NaN); arrow sorts nulls at_end, so they're
        # contiguous and adjacency on codes is exact
        kv, _, _ = null_safe_group_codes(t.column(key))
        # rank within each key run (runs are contiguous after the sort)
        starts = np.flatnonzero(np.concatenate(([True], kv[1:] != kv[:-1])))
        run_id = np.cumsum(np.concatenate(([False], kv[1:] != kv[:-1])))
        rank = np.arange(len(kv)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    partial = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    # final merge: `local` already vectorizes ACROSS keys (sorted run
    # selection), so one call per coarse partition replaces one Ray dispatch
    # per key — the per-group overhead would dominate at real key cardinality
    return coarse_partitioned(partial, key, local)


def widen_blocks(ds: ray.data.Dataset, n: int | None = None) -> ray.data.Dataset:
    """Split blocks so a downstream sort/groupby gets ≥``n``-way task
    parallelism. Ray's sort-based ``groupby().map_groups`` emits roughly as
    many tasks as its INPUT has blocks — a narrow upstream (e.g. an 8-block
    small-table read) collapses the grouped stage to a handful of tasks no
    matter the hash-partition count (measured: the MinHash candidate stage
    ran 4-way on a 32-CPU node, 8.9 s → 5.4 s after widening). No-op when
    the plan already has ≥ n blocks, so at real scale — where the byte-sized
    read blocking yields thousands of blocks — this never collapses or
    reshuffles anything; rows are NOT moved by key (the downstream exchange
    owns that), the split is a cheap even re-slice."""
    import ray as _ray

    if n is None:
        n = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    try:
        cur = ds._plan.initial_num_blocks()
    except Exception:
        return ds
    if cur is not None and cur >= n:
        return ds
    return ds.repartition(n)


def coarse_partitioned(
    ds: ray.data.Dataset,
    key: str | list[str],
    fn,
    n_partitions: int = 64,
    seed: int = 29,
) -> ray.data.Dataset:
    """Co-locate every row of each ``key`` value and run ``fn`` ONCE per
    coarse hash partition (not once per key): keys hash into ``n_partitions``
    buckets via polars ``hash_rows`` (columnar, cross-process deterministic),
    so ``fn`` sees whole partitions and can vectorize ACROSS keys with
    segment scans — the pattern that replaced per-group ``map_groups``
    dispatch (a measured ~0.2 ms of Python per group) in the as-of joins.
    ``fn`` receives the partition table without the partition column.
    """
    import numpy as np

    key_cols = [key] if isinstance(key, str) else list(key)

    def add_part(t: pa.Table) -> pa.Table:
        import polars as _pl

        h = _pl.from_arrow(t.select(key_cols)).hash_rows(seed=seed).to_numpy()
        return t.append_column("__gs_part", pa.array((h % n_partitions).astype(np.int32)))

    return (
        widen_blocks(ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("__gs_part")
        .map_groups(
            lambda t: fn(t.drop_columns(["__gs_part"])), batch_format="pyarrow"
        )
    )


def grouped_segments(
    ds: ray.data.Dataset,
    key: str,
    fn,
    out_schema: pa.Schema,
    n_partitions: int = 64,
    seed: int = 29,
) -> ray.data.Dataset:
    """``groupby(key).map_groups(fn)`` without the per-group dispatch
    overhead: one :func:`coarse_partitioned` task per partition sorts by key
    code and hands ``fn`` each key's rows as a zero-copy table slice — same
    per-group inputs, much cheaper dispatch (though a ``fn`` doing heavy
    per-call pyarrow work still pays that per group; fully cross-key
    vectorized partition functions go through :func:`coarse_partitioned`
    directly).

    ``fn`` must return tables of exactly ``out_schema`` (or empty tables);
    group order within a partition is not defined, matching ``groupby``.
    """
    import numpy as np

    def run_part(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        # null-safe codes: NULL keys form ONE group (SQL GROUP BY) instead
        # of the undefined NaN→int64 cast the raw indices would produce
        codes, _, _ = null_safe_group_codes(t.column(key))
        order = np.argsort(codes, kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        codes = codes[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(codes)) + 1, [n]))
        parts = [
            fn(t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])))
            for i in range(len(bounds) - 1)
        ]
        parts = [p for p in parts if p.num_rows > 0]
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    return coarse_partitioned(ds, key, run_part, n_partitions=n_partitions, seed=seed)


def key_bucketer(key_type: "pa.DataType", num_buckets: int, seed: int = 7):
    """Columnar key→bucket hash shared by the bucketed exchanges
    (bucket_hash_join, distributed_anti_join): polars ``hash_rows`` over the
    key cast to one common type, modulo ``num_buckets``. One definition so
    the two sides of any bucketed exchange can never drift apart."""

    def bucket_of(col) -> pa.Array:
        import numpy as np
        import polars as _pl

        if len(col) == 0:
            return pa.array([], pa.int32())
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        h = _pl.from_arrow(pa.table({"k": arr.cast(key_type)})) \
            .hash_rows(seed=seed).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int32))

    return bucket_of


def bounded_table(ds: ray.data.Dataset, schema: pa.Schema) -> pa.Table:
    """Collect a BOUNDED result into one Arrow table, schema intact even
    when empty. Ray Data drops 0-row blocks at iteration, so an empty
    Dataset ``to_pandas()``-es to a COLUMN-LESS frame no matter what schema
    the pipeline carried — a gate/driver result that can legitimately be
    empty (heavy hitters above a threshold, verified near-dup pairs) must
    therefore be returned as a Table with an explicit schema. Only for
    outputs with a proven bound (≤1/φ hitters, probe-bounded pair sets);
    corpus-scale results stay Datasets."""
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(tables).cast(schema)


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


def round_half_away(x, digits: int = 6):
    """Round-half-away-from-zero — bit-exact with DuckDB ROUND (numpy/pyarrow
    round are half-even and disagree with SQL on .5 ties)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    return np.where(x >= 0, np.floor(x * scale + 0.5), np.ceil(x * scale - 0.5)) / scale
