"""Point-in-time (as-of) join — the Ray-Data recast of the reference's DTW
pairwise temporal alignment (J4, SURVEY.md §2.5).

The reference aligns two frame-indexed time series per pair with a monotone
cursor (05_dtw_alignment_experiment/dtw_alignment.py:532-1090, monotonic
enforcement :1087-1088). Relationally that is: for every probe row
``(key, left_ts)`` take the build row with the greatest ``right_ts <=
left_ts`` (direction='backward'; zero temporal leakage), nulls when none —
including probe keys absent from the build side (anti-join coverage, the
``missing_student_audio`` analog, 05/dtw_alignment.py:1466-1468).

Execution strategy (one shuffle, reused layout):
  tag side → schema-align → union → groupby(key) [hash shuffle that never
  splits an entity's timeline] → per-group vectorized sorted-merge
  (np.searchsorted over the time axis).

The per-group function emits Arrow tables cast to one precomputed output
schema so block schemas are identical across groups regardless of null
patterns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .util import arrow_schema_of

_SIDE = "__side"
_RTS = "__rts"
_RPREFIX = "__r_"


def _ts_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/int column → int64 numpy (us)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.timestamp("us", tz=a.type.tz), safe=False).cast(pa.int64())
    return a.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _append_null_cols(schema_cols: list[tuple[str, pa.DataType]]):
    def fn(t: pa.Table) -> pa.Table:
        for name, typ in schema_cols:
            t = t.append_column(pa.field(name, typ), pa.nulls(t.num_rows, typ))
        return t

    return fn


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
    matched_ts_col: str = "matched_ts",
) -> ray.data.Dataset:
    """As-of join ``left`` (probe) with ``right`` (build) on ``on``.

    Returns all left rows + ``{c}{suffix}`` for each build value column +
    ``matched_ts_col`` (null when no build row qualifies). ``tolerance_us``
    bounds the lookback (backward) / lookahead (forward) window.

    Scale notes: the groupby hash-partitions by entity so a partition never
    splits a timeline (SURVEY.md §7.6); for hot entities combine with
    :func:`salt_hot_keys` on the *probe* side and replicate the build side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    left, lschema = arrow_schema_of(left)
    right, rschema = arrow_schema_of(right)
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    rts_type = rtypes[right_ts]
    for c in value_cols:
        if c not in rtypes:
            raise ValueError(f"right side missing value column {c!r}")

    # schema-align both sides: left cols + __rts + __r_<c> + __side
    left_cols = list(zip(lschema.names, lschema.types))
    extra_cols = [(_RTS, rts_type)] + [(_RPREFIX + c, rtypes[c]) for c in value_cols]

    left_tagged = left.map_batches(
        _append_null_cols(extra_cols), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: t.append_column(_SIDE, pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def prep_right(t: pa.Table) -> pa.Table:
        out: dict[str, pa.Array | pa.ChunkedArray] = {}
        for name, typ in left_cols:
            if name == on:
                out[name] = t.column(on)
            else:
                out[name] = pa.nulls(t.num_rows, typ)
        out[_RTS] = t.column(right_ts)
        for c in value_cols:
            out[_RPREFIX + c] = t.column(c)
        out[_SIDE] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(out)

    right_tagged = right.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)
    ordered = [n for n, _ in left_cols] + [n for n, _ in extra_cols] + [_SIDE]
    unioned = left_tagged.select_columns(ordered).union(right_tagged.select_columns(ordered))

    out_fields = (
        [pa.field(n, t) for n, t in left_cols]
        + [pa.field(c + suffix, rtypes[c]) for c in value_cols]
        + [pa.field(matched_ts_col, rts_type)]
    )
    out_schema = pa.schema(out_fields)
    fwd = direction == "forward"

    def merge(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy(zero_copy_only=False)
        lmask = side == 1
        lt = group.filter(pa.array(lmask))
        rt = group.filter(pa.array(~lmask))
        n = lt.num_rows
        if n == 0:
            return out_schema.empty_table()
        lts = _ts_i64(lt.column(left_ts))
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            name: lt.column(name) for name, _ in left_cols
        }
        if rt.num_rows == 0:
            for c in value_cols:
                cols[c + suffix] = pa.nulls(n, rtypes[c])
            cols[matched_ts_col] = pa.nulls(n, rts_type)
            return pa.table(cols, schema=out_schema)
        rts = _ts_i64(rt.column(_RTS))
        order = np.argsort(rts, kind="stable")
        rts_sorted = rts[order]
        if fwd:
            idx = np.searchsorted(rts_sorted, lts, side="left")
            valid = idx < len(rts_sorted)
            idx_c = np.minimum(idx, len(rts_sorted) - 1)
            if tolerance_us is not None:
                valid &= (rts_sorted[idx_c] - lts) <= tolerance_us
        else:
            idx = np.searchsorted(rts_sorted, lts, side="right") - 1
            valid = idx >= 0
            idx_c = np.maximum(idx, 0)
            if tolerance_us is not None:
                valid &= (lts - rts_sorted[idx_c]) <= tolerance_us
        safe_idx = pa.array(
            np.where(valid, order[idx_c], 0).astype(np.int64), pa.int64()
        )
        validity = pa.array(valid)
        for c in value_cols:
            taken = pc.take(rt.column(_RPREFIX + c).combine_chunks(), safe_idx)
            cols[c + suffix] = pc.if_else(validity, taken, pa.nulls(n, rtypes[c]))
        taken_ts = pc.take(rt.column(_RTS).combine_chunks(), safe_idx)
        cols[matched_ts_col] = pc.if_else(validity, taken_ts, pa.nulls(n, rts_type))
        return pa.table(cols, schema=out_schema)

    return unioned.groupby(on).map_groups(merge, batch_format="pyarrow")


def asof_join_broadcast(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
    matched_ts_col: str = "matched_ts",
) -> ray.data.Dataset:
    """Zero-shuffle as-of join for a SMALL probe side over an ENTITY-LOCAL
    build side.

    When probes are small (an online feature-lookup batch: thousands against
    billions of build rows) the shuffle-based :func:`asof_join` moves the
    whole build side through a sort for nothing. Here the probe table is
    broadcast (``ray.put`` once), every build block merges the probes whose
    entities it owns locally, and probes whose entity exists in NO build
    block get their null rows from one distributed ``unique(on)`` — the
    anti-join coverage without a shuffle.

    REQUIRES every entity's build rows to live in one block (the
    ``assume_partitioned`` contract — entity-partitioned sources or
    ``read_partitioned`` checkpoints); each probe entity is then handled by
    exactly one task, the build side is consumed exactly ONCE (no second
    pass for anti coverage — handled probes are tracked by a carried probe
    index and the difference yields the null rows), and the output — probe-
    sized by the operator's own contract — is assembled on the driver.
    Equivalence with :func:`asof_join` is pinned in tests.
    """
    import ray as _ray

    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    left, lschema = arrow_schema_of(left)
    right, rschema = arrow_schema_of(right)
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    rts_type = rtypes[right_ts]
    left_cols = list(zip(lschema.names, lschema.types))
    out_schema = pa.schema(
        [pa.field(n, t) for n, t in left_cols]
        + [pa.field(c + suffix, rtypes[c]) for c in value_cols]
        + [pa.field(matched_ts_col, rts_type)]
    )
    mid_schema = pa.schema(list(out_schema) + [pa.field("__pidx", pa.int64())])
    _lbatches = list(left.iter_batches(batch_format="pyarrow", batch_size=None))
    probes_t = (
        pa.concat_tables(_lbatches).combine_chunks()
        if _lbatches
        else pa.schema([pa.field(n, t) for n, t in left_cols]).empty_table()
    )
    probes_t = probes_t.append_column(
        "__pidx", pa.array(np.arange(probes_t.num_rows, dtype=np.int64))
    )
    ref = _ray.put(probes_t)
    fwd = direction == "forward"

    def merge_block(block: pa.Table) -> pa.Table:
        probes: pa.Table = _ray.get(ref)
        ents = pc.unique(block.column(on))
        local = probes.filter(pc.is_in(probes.column(on), value_set=ents))
        n = local.num_rows
        if n == 0:
            return mid_schema.empty_table()
        # per-entity vectorized sorted merges; the loop is over the probe
        # side's DISTINCT LOCAL ENTITIES (small by contract), never rows
        bts = _ts_i64(block.column(right_ts))
        bent = block.column(on)
        out_parts = []
        for ent in pc.unique(local.column(on)).to_pylist():
            lt = local.filter(pc.equal(local.column(on), ent))
            bmask = pc.equal(bent, ent)
            rt = block.filter(bmask)
            rts = bts[bmask.to_numpy(zero_copy_only=False)]
            order = np.argsort(rts, kind="stable")
            rts_sorted = rts[order]
            lts = _ts_i64(lt.column(left_ts))
            cols = {name: lt.column(name) for name, _ in left_cols}
            if fwd:
                idx = np.searchsorted(rts_sorted, lts, side="left")
                valid = idx < len(rts_sorted)
                idx_c = np.minimum(idx, len(rts_sorted) - 1)
                if tolerance_us is not None:
                    valid &= (rts_sorted[idx_c] - lts) <= tolerance_us
            else:
                idx = np.searchsorted(rts_sorted, lts, side="right") - 1
                valid = idx >= 0
                idx_c = np.maximum(idx, 0)
                if tolerance_us is not None:
                    valid &= (lts - rts_sorted[idx_c]) <= tolerance_us
            safe_idx = pa.array(np.where(valid, order[idx_c], 0).astype(np.int64), pa.int64())
            validity = pa.array(valid)
            for c in value_cols:
                taken = pc.take(rt.column(c).combine_chunks(), safe_idx)
                cols[c + suffix] = pc.if_else(validity, taken, pa.nulls(len(lts), rtypes[c]))
            taken_ts = pc.take(rt.column(right_ts).combine_chunks(), safe_idx)
            cols[matched_ts_col] = pc.if_else(validity, taken_ts, pa.nulls(len(lts), rts_type))
            cols["__pidx"] = lt.column("__pidx")
            out_parts.append(pa.table(cols, schema=mid_schema))
        return pa.concat_tables(out_parts)

    _mbatches = list(
        right.map_batches(
            merge_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    matched_t = pa.concat_tables(_mbatches) if _mbatches else mid_schema.empty_table()
    handled = matched_t.column("__pidx").to_numpy(zero_copy_only=False)
    miss_mask = np.ones(probes_t.num_rows, dtype=bool)
    miss_mask[handled] = False
    miss = probes_t.filter(pa.array(miss_mask))
    cols = {name: miss.column(name) for name, _ in left_cols}
    for c in value_cols:
        cols[c + suffix] = pa.nulls(miss.num_rows, rtypes[c])
    cols[matched_ts_col] = pa.nulls(miss.num_rows, rts_type)
    null_t = pa.table(cols, schema=out_schema)
    import ray.data as _rd

    out = pa.concat_tables([matched_t.drop_columns(["__pidx"]).cast(out_schema), null_t])
    return _rd.from_arrow(out)


def asof_join_bucketed(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    bucket_us: int,
    suffix: str = "_asof",
    matched_ts_col: str = "matched_ts",
) -> ray.data.Dataset:
    """Bounded-memory as-of join for giant entities (backward direction).

    :func:`asof_join` materializes each entity's full timeline in one
    ``map_groups`` call — fine until one hot ``image_id`` holds millions of
    rows (SURVEY.md §7.6; the 1-teacher:N-students skew at small scale,
    05_dtw_alignment_experiment/dtw_alignment.py:1410-1414). This variant
    co-partitions BOTH sides by ``(entity, time-bucket)`` so no task ever
    holds more than one bucket of one entity:

    A. bucket both sides; per ``(on, bucket)`` group run the local backward
       merge — probes with an in-bucket predecessor are final;
    B. reduce the build side to one summary row per ``(on, bucket)`` (the
       bucket's last build row) — bounded at one row per bucket;
    C. resolve still-unmatched probes with a recursive :func:`asof_join` on
       the bucket axis against the summaries (probe bucket - 1, backward),
       i.e. "the last build row in any strictly earlier bucket".

    Equivalent to :func:`asof_join` (see test_asof_window); choose
    ``bucket_us`` so one bucket of the hottest entity fits a worker's heap.
    """
    left, lschema = arrow_schema_of(left)
    right, rschema = arrow_schema_of(right)
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    rts_type = rtypes[right_ts]
    lcols = list(lschema.names)

    def bucket_col(ts_col: str):
        def fn(t: pa.Table) -> pa.Table:
            b = _ts_i64(t.column(ts_col)) // bucket_us
            return t.append_column("__b", pa.array(b, pa.int64()))

        return fn

    lb = left.map_batches(bucket_col(left_ts), batch_format="pyarrow", zero_copy_batch=True)
    rb = right.map_batches(bucket_col(right_ts), batch_format="pyarrow", zero_copy_batch=True)

    # ---- phase A: in-bucket merge; composite (entity, bucket) key keeps
    # every group to one bucket of one entity
    def composite(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column(on), pa.string()),
            pc.cast(t.column("__b"), pa.string()),
            "\x1f",
        )
        return t.append_column("__kb", k)

    lbk = lb.map_batches(composite, batch_format="pyarrow")
    rbk = rb.map_batches(composite, batch_format="pyarrow")
    phase_a = asof_join(
        lbk.drop_columns(["__b"]),
        rbk.drop_columns(["__b"]),
        on="__kb",
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=value_cols,
        suffix=suffix,
        matched_ts_col=matched_ts_col,
    )

    def keep_matched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(matched_ts_col))).drop_columns(["__kb"])

    def keep_unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(matched_ts_col))).drop_columns(
            ["__kb", matched_ts_col] + [c + suffix for c in value_cols]
        )

    matched = phase_a.map_batches(keep_matched, batch_format="pyarrow", zero_copy_batch=True)
    unmatched = phase_a.map_batches(keep_unmatched, batch_format="pyarrow", zero_copy_batch=True)

    # ---- phase B: one summary row (last build row) per (entity, bucket)
    def last_of_group(group: pa.Table) -> pa.Table:
        ts = _ts_i64(group.column(right_ts))
        i = int(np.argmax(ts))
        return group.slice(i, 1)

    summaries = (
        rbk.groupby("__kb").map_groups(last_of_group, batch_format="pyarrow").drop_columns(["__kb"])
    )

    # ---- phase C: unmatched probes look back to strictly earlier buckets
    def prev_bucket(t: pa.Table) -> pa.Table:
        b = _ts_i64(t.column(left_ts)) // bucket_us - 1
        return t.append_column("__qb", pa.array(b, pa.int64()))

    un_b = unmatched.map_batches(prev_bucket, batch_format="pyarrow", zero_copy_batch=True)
    filled = asof_join(
        un_b,
        summaries,
        on=on,
        left_ts="__qb",
        right_ts="__b",
        value_cols=value_cols + [right_ts] if right_ts not in value_cols else value_cols,
        suffix=suffix,
        matched_ts_col="__mb",
    )

    out_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(lschema.names, lschema.types)]
        + [pa.field(c + suffix, rtypes[c]) for c in value_cols]
        + [pa.field(matched_ts_col, rts_type)]
    )

    def finish_filled(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n) for n in lcols}
        for c in value_cols:
            cols[c + suffix] = t.column(c + suffix)
        cols[matched_ts_col] = t.column(right_ts + suffix)
        return pa.table(cols, schema=out_schema)

    filled = filled.map_batches(finish_filled, batch_format="pyarrow", zero_copy_batch=True)
    matched = matched.map_batches(
        lambda t: t.select(out_schema.names).cast(out_schema), batch_format="pyarrow"
    )
    return matched.union(filled)


def salt_hot_keys(
    ds: ray.data.Dataset,
    key: str,
    hot_keys: list[str],
    salt_buckets: int = 8,
    salt_by: str | None = None,
) -> ray.data.Dataset:
    """Append a ``__salt`` column that spreads listed hot keys over
    ``salt_buckets`` pseudo-keys (two-phase aggregation / skew mitigation,
    SURVEY.md §7.5). Non-hot keys get salt 0.

    The salt derives from ROW CONTENT (a columnar hash of ``salt_by``, or of
    every column when unset) — never from batch-local position — so a row's
    salt is identical across cluster sizes, block layouts and reruns
    (layout-independence invariant; never the process-salted builtin
    ``hash()``).
    """
    hot = set(hot_keys)

    def fn(t: pa.Table) -> pa.Table:
        import polars as _pl

        if t.num_rows == 0:
            return t.append_column("__salt", pa.array([], pa.int32()))
        cols = [salt_by] if salt_by is not None else t.column_names
        h = _pl.from_arrow(t.select(cols)).hash_rows(seed=11).to_numpy()
        salt = (h % np.uint64(salt_buckets)).astype(np.int32)
        is_hot = pc.is_in(t.column(key), value_set=pa.array(sorted(hot))) \
            .to_numpy(zero_copy_only=False)
        return t.append_column("__salt", pa.array(np.where(is_hot, salt, 0)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
