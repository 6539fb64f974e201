"""Interval (range-containment) join — ALL points inside each interval.

The temporal-join family's third member next to the as-of joins: where
``asof_join`` pairs each probe with its single nearest build row, the
interval join pairs every interval ``[start, end]`` with EVERY point whose
timestamp falls inside it — the "all events within the window after each
anchor" shape (attribution windows, session containment, co-occurrence
scans). The reference's closest analog is the pairwise teacher/student
alignment scan that considers every frame inside a tolerance window
(05_dtw_alignment_experiment/dtw_alignment.py:1410-1460); here the window
is data-driven per interval row and the join is key-partitioned.

Scale shape (SURVEY.md §7.6): neither side is ever collected. Intervals are
replicated to every fixed-width time bucket they overlap (replication factor
``ceil(len / bucket_us) + 1`` — choose ``bucket_us`` at or above the typical
interval length so the factor stays ~2), points map to exactly one bucket,
and both sides meet in a single ``(key, bucket)`` co-partitioned exchange:
one union + one coarse-hash shuffle, then a zero-copy Acero hash join per
partition followed by the exact ``start <= ts <= end`` filter. A task holds
~1/n_partitions of the replicated data, never a whole hot key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .asof import _ts_i64
from .util import arrow_schema_of, coarse_partitioned

_SIDE = "__iv_side"
_BKT = "__iv_b"
_PPREFIX = "__p_"


def interval_join(
    intervals: ray.data.Dataset,
    points: ray.data.Dataset,
    on: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    value_cols: list[str],
    bucket_us: int,
    suffix: str = "_pt",
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Inner interval join: one output row per (interval row, point row)
    pair with ``intervals.on == points.on`` and ``start <= ts <= end``
    (both ends inclusive).

    Output columns: every ``intervals`` column, then ``ts_col + suffix``
    and ``{c}{suffix}`` for each point value column. Rows with a null key,
    null bound, or null timestamp never match (SQL join semantics).

    ``bucket_us`` is the co-partition bucket width: per-task memory is
    bounded by one coarse partition of (points + intervals x replication),
    and intervals longer than many buckets pay proportional replication —
    the caller's trade, exactly like ``asof_join_bucketed``'s ``bucket_us``.
    Acero executes the per-partition equi-join, so point value columns must
    be non-nested (pack lists to binary as the dedup stages do).
    """
    if bucket_us <= 0:
        # s // bucket_us would ZeroDivisionError deep inside a worker (or
        # produce negative replication counts) — fail at call time instead
        raise ValueError(f"bucket_us must be a positive width, got {bucket_us}")
    intervals, ischema = arrow_schema_of(intervals)
    points, pschema = arrow_schema_of(points)
    ptypes = {n: t for n, t in zip(pschema.names, pschema.types)}
    for c in [ts_col, *value_cols]:
        if c not in ptypes:
            raise ValueError(f"points side missing column {c!r}")
    icols = list(zip(ischema.names, ischema.types))
    inames = set(ischema.names)
    out_point_cols = [(ts_col, ptypes[ts_col])] + [(c, ptypes[c]) for c in value_cols]
    # suffix every point column (they all ride next to the full interval
    # row); refuse silent collisions like bucket_hash_join does
    renamed = [n + suffix for n, _ in out_point_cols]
    clashes = sorted(set(renamed) & inames | {n for n in renamed if renamed.count(n) > 1})
    if clashes:
        raise ValueError(
            f"suffixed point column(s) {clashes} collide with interval columns; "
            f"pick a different suffix"
        )

    union_fields = (
        icols
        + [(_PPREFIX + n, t) for n, t in out_point_cols]
        + [(_BKT, pa.int64()), (_SIDE, pa.int8())]
    )
    union_names = [n for n, _ in union_fields]

    def prep_intervals(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        valid = (
            t.column(start_col).is_valid().to_numpy(zero_copy_only=False)
            & t.column(end_col).is_valid().to_numpy(zero_copy_only=False)
            & t.column(on).is_valid().to_numpy(zero_copy_only=False)
        )
        t = t.filter(pa.array(valid))
        s = _ts_i64(t.column(start_col))
        e = _ts_i64(t.column(end_col))
        keep = np.flatnonzero(e >= s)
        s, e = s[keep], e[keep]
        b0 = s // bucket_us
        reps = (e // bucket_us - b0 + 1).astype(np.int64)
        row_idx = np.repeat(keep, reps)
        # offset of each replica within its row's bucket run
        ends = np.cumsum(reps)
        offs = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - reps, reps
        )
        bucket = np.repeat(b0, reps) + offs
        taken = t.take(pa.array(row_idx, pa.int64()))
        out = {n: taken.column(n) for n, _ in icols}
        for n, typ in out_point_cols:
            out[_PPREFIX + n] = pa.nulls(len(row_idx), typ)
        out[_BKT] = pa.array(bucket, pa.int64())
        out[_SIDE] = pa.array(np.zeros(len(row_idx), dtype=np.int8))
        return pa.table({n: out[n] for n in union_names})

    def prep_points(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        valid = (
            t.column(ts_col).is_valid().to_numpy(zero_copy_only=False)
            & pa.compute.is_valid(t.column(on)).to_numpy(zero_copy_only=False)
        )
        t = t.filter(pa.array(valid))
        b = _ts_i64(t.column(ts_col)) // bucket_us
        out: dict = {}
        for n, typ in icols:
            out[n] = t.column(on) if n == on else pa.nulls(t.num_rows, typ)
        for n, _typ in out_point_cols:
            out[_PPREFIX + n] = t.column(n)
        out[_BKT] = pa.array(b, pa.int64())
        out[_SIDE] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table({n: out[n] for n in union_names})

    unioned = intervals.map_batches(
        prep_intervals, batch_format="pyarrow", zero_copy_batch=True
    ).union(points.map_batches(prep_points, batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema(
        [pa.field(n, t) for n, t in icols]
        + [pa.field(n + suffix, t) for n, t in out_point_cols]
    )

    def join_part(part: pa.Table) -> pa.Table:
        part = part.combine_chunks()
        if part.num_rows == 0:
            return out_schema.empty_table()
        side = part.column(_SIDE).to_numpy(zero_copy_only=False)
        iv = part.filter(pa.array(side == 0)).drop_columns([_SIDE])
        pt = part.filter(pa.array(side == 1)).drop_columns([_SIDE])
        if iv.num_rows == 0 or pt.num_rows == 0:
            return out_schema.empty_table()
        left = iv.drop_columns([_PPREFIX + n for n, _ in out_point_cols])
        right = pt.select([on, _BKT] + [_PPREFIX + n for n, _ in out_point_cols])
        joined = left.join(
            right, keys=[on, _BKT], join_type="inner", use_threads=False
        )
        if joined.num_rows == 0:
            return out_schema.empty_table()
        s = _ts_i64(joined.column(start_col))
        e = _ts_i64(joined.column(end_col))
        ts = _ts_i64(joined.column(_PPREFIX + ts_col))
        joined = joined.filter(pa.array((ts >= s) & (ts <= e)))
        cols = {n: joined.column(n) for n, _ in icols}
        for n, _typ in out_point_cols:
            cols[n + suffix] = joined.column(_PPREFIX + n)
        return pa.table(cols, schema=out_schema)

    return coarse_partitioned(
        unioned, [on, _BKT], join_part, n_partitions=n_partitions
    )
