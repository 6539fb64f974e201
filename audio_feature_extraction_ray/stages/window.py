"""Windowed per-entity feature engineering: lag/lead, Δ/Δ², forward/backward
fill, gap-based sessionization, time-bucket projection.

Recasts of the reference's frame-sequence operators (SURVEY.md §2.8):
- Δ and Δ² over the frame axis (core/feature_extractor.py:136-138) → lag/delta
- CubicSpline F0 gap fill (audio_feature_extraction 2/.../feature_extractor.py:224-232)
  → forward/backward fill with a per-partition monotone cursor
- VAD segment merge (merge gaps <= min_silence, keep >= min_speech,
  04_feature_extraction_experiment/process_audio.py:117-132) → sessionize(gap)
- 10-way segment stats (05_dtw_alignment_experiment/dtw_alignment.py:1116-1125)
  → time_bucket projection + groupby aggregate

All window ops for one entity run in ONE ``groupby(key).map_groups`` pass over
the time-sorted group — one shuffle pays for every window column (SURVEY.md
§7.5 "one shuffle, many window ops"). Outputs are cast to a precomputed Arrow
schema so group blocks always agree.

Window columns are emitted as float64 (SQL ``LAG(double)`` semantics; nulls at
partition edges). The watermark analog: each group is processed with a single
monotone cursor and never buffers more than the group — bounding memory is the
partitioning's job (hash by entity; salt hot entities upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .util import arrow_schema_of


def _f64(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False).astype(np.float64)


def _ts_i64(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.timestamp("us", tz=a.type.tz), safe=False).cast(pa.int64())
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


def _shift(x: np.ndarray, k: int) -> np.ndarray:
    """Shift with NaN fill (k>0: lag, k<0: lead)."""
    out = np.full_like(x, np.nan)
    if k > 0:
        out[k:] = x[:-k]
    elif k < 0:
        out[:k] = x[-k:]
    else:
        out[:] = x
    return out


def _ffill(x: np.ndarray) -> np.ndarray:
    mask = np.isnan(x)
    idx = np.where(~mask, np.arange(len(x)), 0)
    np.maximum.accumulate(idx, out=idx)
    out = x[idx]
    # rows before the first non-null stay NaN
    if (~mask).any():
        first = np.argmax(~mask)
        out[:first] = np.nan
    else:
        out[:] = np.nan
    return out


def _bfill(x: np.ndarray) -> np.ndarray:
    return _ffill(x[::-1])[::-1]


def _interp_time(x: np.ndarray, tsv: np.ndarray) -> np.ndarray:
    """Linear interpolation of interior null gaps over the TIME axis (the
    reference's CubicSpline F0 gap fill recast linear, F4 —
    04_feature_extraction_experiment/audio_feature_extraction 2/
    audio_feature_extraction/feature_extractor.py:224-232). Non-null rows
    keep their value; leading/trailing nulls (no bracketing sample) stay
    null."""
    valid = ~np.isnan(x)
    out = x.copy()
    if valid.sum() < 1:
        return out
    n = len(x)
    idx = np.arange(n)
    prev_i = np.where(valid, idx, 0)
    np.maximum.accumulate(prev_i, out=prev_i)
    has_prev = np.zeros(n, dtype=bool)
    first = int(np.argmax(valid))
    has_prev[first:] = True
    next_i = np.where(valid[::-1], idx, 0)
    np.maximum.accumulate(next_i, out=next_i)
    next_i = (n - 1) - next_i[::-1]
    has_next = np.zeros(n, dtype=bool)
    last = n - 1 - int(np.argmax(valid[::-1]))
    has_next[: last + 1] = True
    gap = ~valid & has_prev & has_next
    if gap.any():
        pv, nv = x[prev_i[gap]], x[next_i[gap]]
        pt = tsv[prev_i[gap]].astype(np.float64)
        nt = tsv[next_i[gap]].astype(np.float64)
        t = tsv[gap].astype(np.float64)
        dt = nt - pt
        frac = np.where(dt > 0, (t - pt) / np.maximum(dt, 1.0), 0.0)
        out[gap] = pv + (nv - pv) * frac
    return out


def window_features(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    value_cols: list[str],
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (1,),
    deltas: bool = True,
    fill_cols: list[str] | None = None,
    interp_cols: list[str] | None = None,
    session_gap_us: int | None = None,
    tiebreak: str | None = None,
    assume_partitioned: bool = False,
    rolling: dict[str, int] | None = None,
    rolling_time_us: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """Add per-entity window columns in one shuffle.

    For each ``c`` in value_cols: ``{c}_lag_k`` / ``{c}_lead_k`` (float64,
    null at edges) and, when ``deltas``, ``{c}_delta`` / ``{c}_delta2``.
    ``fill_cols`` get ``{c}_ffill`` / ``{c}_bfill``. ``session_gap_us`` adds
    ``session_id`` (int64, 0-based per entity, new session when the gap to the
    previous event exceeds the threshold).

    Rows come back sorted by (key, ts[, tiebreak]) within each entity.

    ``assume_partitioned=True`` skips the groupby shuffle entirely and windows
    within each block — ONLY valid when every entity's rows already live in
    one block (e.g. the entity-partitioned synthetic source, or a dataset
    read back from :func:`...state.checkpoint.write_partitioned_resumable`
    partitions). This is the reuse-one-partitioning-across-stages path
    (SURVEY.md §7.5); the caller owns the partitioning guarantee.
    """
    fill_cols = fill_cols or []
    interp_cols = interp_cols or []
    ds, schema = arrow_schema_of(ds)
    fields = list(zip(schema.names, schema.types))
    out_fields = [pa.field(n, t) for n, t in fields]
    for c in value_cols:
        for k in lags:
            out_fields.append(pa.field(f"{c}_lag_{k}", pa.float64()))
        for k in leads:
            out_fields.append(pa.field(f"{c}_lead_{k}", pa.float64()))
        if deltas:
            out_fields.append(pa.field(f"{c}_delta", pa.float64()))
            out_fields.append(pa.field(f"{c}_delta2", pa.float64()))
    for c in fill_cols:
        out_fields.append(pa.field(f"{c}_ffill", pa.float64()))
        out_fields.append(pa.field(f"{c}_bfill", pa.float64()))
    for c in interp_cols:
        out_fields.append(pa.field(f"{c}_interp", pa.float64()))
    for c, k in (rolling or {}).items():
        out_fields.append(pa.field(f"{c}_rollmean_{k}", pa.float64()))
    for c, w in (rolling_time_us or {}).items():
        out_fields.append(pa.field(f"{c}_rollmean_t{w}", pa.float64()))
    if session_gap_us is not None:
        out_fields.append(pa.field("session_id", pa.int64()))
    out_schema = pa.schema(out_fields)

    def per_group(group: pa.Table) -> pa.Table:
        tsv = _ts_i64(group.column(ts))
        if tiebreak is not None:
            tb = _f64(group.column(tiebreak))
            order = np.lexsort((tb, tsv))
        else:
            order = np.argsort(tsv, kind="stable")
        group = group.take(pa.array(order, pa.int64()))
        tsv = tsv[order]
        cols: dict[str, object] = {n: group.column(n) for n, _ in fields}
        for c in value_cols:
            x = _f64(group.column(c))
            for k in lags:
                cols[f"{c}_lag_{k}"] = pa.array(_shift(x, k), pa.float64())
            for k in leads:
                cols[f"{c}_lead_{k}"] = pa.array(_shift(x, -k), pa.float64())
            if deltas:
                d = x - _shift(x, 1)
                cols[f"{c}_delta"] = pa.array(d, pa.float64())
                cols[f"{c}_delta2"] = pa.array(d - _shift(d, 1), pa.float64())
        for c in fill_cols:
            x = _f64(group.column(c))
            cols[f"{c}_ffill"] = pa.array(_ffill(x.copy()), pa.float64())
            cols[f"{c}_bfill"] = pa.array(_bfill(x.copy()), pa.float64())
        for c in interp_cols:
            x = _f64(group.column(c))
            cols[f"{c}_interp"] = pa.array(_interp_time(x, tsv), pa.float64())
        for c, k in (rolling or {}).items():
            # trailing k-row mean ignoring nulls (SQL AVG OVER ROWS k-1
            # PRECEDING AND CURRENT ROW), via prefix sums — O(n) per group
            x = _f64(group.column(c))
            valid = ~np.isnan(x)
            cs = np.concatenate(([0.0], np.cumsum(np.where(valid, x, 0.0))))
            cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
            i = np.arange(len(x))
            lo = np.maximum(0, i - k + 1)
            sums = cs[i + 1] - cs[lo]
            cnts = cc[i + 1] - cc[lo]
            cols[f"{c}_rollmean_{k}"] = pa.array(
                np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan), pa.float64()
            )
        for c, w in (rolling_time_us or {}).items():
            # time-range trailing mean: rows with ts in [t - w, t] (SQL RANGE
            # BETWEEN INTERVAL w PRECEDING AND CURRENT ROW); two-pointer via
            # searchsorted over the sorted time axis, O(n log n) per group
            x = _f64(group.column(c))
            valid = ~np.isnan(x)
            cs = np.concatenate(([0.0], np.cumsum(np.where(valid, x, 0.0))))
            cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
            i = np.arange(len(x))
            lo = np.searchsorted(tsv, tsv - w, side="left")
            # RANGE frames include ALL rows at the current ts (peer rows)
            hi = np.searchsorted(tsv, tsv, side="right")
            sums = cs[hi] - cs[lo]
            cnts = cc[hi] - cc[lo]
            cols[f"{c}_rollmean_t{w}"] = pa.array(
                np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan), pa.float64()
            )
        if session_gap_us is not None:
            gaps = np.diff(tsv, prepend=tsv[0] if len(tsv) else 0)
            new_sess = gaps > session_gap_us
            cols["session_id"] = pa.array(np.cumsum(new_sess).astype(np.int64), pa.int64())
        # NaN → null for Arrow float columns
        for name in list(cols):
            if isinstance(cols[name], pa.Array) and pa.types.is_float64(cols[name].type):
                arr = cols[name].to_numpy(zero_copy_only=False)
                cols[name] = pa.array(arr, pa.float64(), from_pandas=True)
        return pa.table(cols, schema=out_schema)

    if assume_partitioned:

        def per_block(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return out_schema.empty_table()
            keys = block.column(key).to_numpy(zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            block = block.take(pa.array(order, pa.int64()))
            keys = keys[order]
            bounds = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
            bounds = np.append(bounds, len(keys))
            parts = [
                per_group(block.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])))
                for i in range(len(bounds) - 1)
            ]
            return pa.concat_tables(parts)

        return ds.map_batches(
            per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    return ds.groupby(key).map_groups(per_group, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    gap_us: int,
    min_events: int = 1,
    min_duration_us: int = 0,
) -> ray.data.Dataset:
    """Gap-based sessionization with VAD-merge semantics: events whose gap to
    the previous event is <= gap_us share a session; sessions shorter than
    ``min_events`` / ``min_duration_us`` are dropped (reference: merge gap <=
    min_silence_duration, keep length >= min_speech_duration,
    04/process_audio.py:117-132)."""
    ds, schema = arrow_schema_of(ds)
    out_schema = pa.schema(list(schema) + [pa.field("session_id", pa.int64())])

    def per_group(group: pa.Table) -> pa.Table:
        tsv = _ts_i64(group.column(ts))
        order = np.argsort(tsv, kind="stable")
        group = group.take(pa.array(order, pa.int64()))
        tsv = tsv[order]
        gaps = np.diff(tsv, prepend=tsv[0] if len(tsv) else 0)
        sess = np.cumsum(gaps > gap_us).astype(np.int64)
        out = group.append_column("session_id", pa.array(sess, pa.int64()))
        if (min_events > 1 or min_duration_us > 0) and len(tsv):
            # sessions are contiguous runs of the (sorted) time axis —
            # per-run length/duration via run boundaries, no per-session loop
            starts = np.flatnonzero(np.concatenate(([True], np.diff(sess) != 0)))
            counts = np.diff(np.append(starts, len(sess)))
            ends = starts + counts - 1
            durs = tsv[ends] - tsv[starts]
            ok_runs = (counts >= min_events) & (durs >= min_duration_us)
            keep = np.repeat(ok_runs, counts)
            if not keep.all():
                return out.filter(pa.array(keep))
        return out

    out = ds.groupby(key).map_groups(per_group, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.cast(out_schema), batch_format="pyarrow", zero_copy_batch=True
    )


def time_bucket(
    ds: ray.data.Dataset, ts: str, width_us: int, origin_us: int = 0, out_col: str = "bucket"
) -> ray.data.Dataset:
    """Stateless projection: integer bucket index of ``ts`` (floor division).
    Compose with groupby for segment/binned stats (A8)."""

    def fn(t: pa.Table) -> pa.Table:
        tsv = _ts_i64(t.column(ts))
        return t.append_column(out_col, pa.array((tsv - origin_us) // width_us, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
