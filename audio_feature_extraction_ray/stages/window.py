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

from .util import arrow_schema_of, coarse_partitioned


def _f64(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False).astype(np.float64)


def _ts_i64(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.timestamp("us", tz=a.type.tz), safe=False).cast(pa.int64())
    # null slots surface as NaN and cast to an arbitrary int — callers that
    # pass nullable ts (the bucketed-window state rows) order those rows by
    # a higher-priority key, so the value never matters; silence the numpy
    # cast warning rather than paying a null-scan on every hot path
    with np.errstate(invalid="ignore"):
        return a.to_numpy(zero_copy_only=False).astype(np.int64)


_NULL_BUCKET = np.int64(2**61)  # sorts after every real time bucket


def _sorted_entity_block(block: pa.Table, key: str, ts: str,
                         tiebreak: str | None = None):
    """Shared null-safe prologue of the per-partition vectorized operators:
    sort by (entity, ts[, tiebreak]) with SQL semantics — NULL keys form ONE
    segment (null-safe dictionary codes, no NaN→int64 cast), NULL ts sorts
    LAST (INT64_MAX sentinel, DuckDB ASC default). Returns
    ``(sorted_block, g, tsv, ts_null)`` where ``g``/``tsv``/``ts_null`` are
    row-aligned with the sorted block."""
    from .util import null_safe_group_codes

    block = block.combine_chunks()
    g, _, _ = null_safe_group_codes(block.column(key))
    ts_arr = block.column(ts).combine_chunks()
    ts_null = ts_arr.is_null().to_numpy(zero_copy_only=False)
    tsv = _ts_i64_bucketed(ts_arr)
    if ts_null.any():
        tsv[ts_null] = np.iinfo(np.int64).max
    if tiebreak is not None:
        order = np.lexsort((_f64(block.column(tiebreak)), tsv, g))
    else:
        order = np.lexsort((tsv, g))
    block = block.take(pa.array(order, pa.int64()))
    return block, g[order], tsv[order], ts_null[order]


def _ts_i64_bucketed(col) -> np.ndarray:
    """ts → int64 with nulls filled to 0 — callers mask/override null slots
    explicitly (bucket sentinel, INT64_MAX ordering), so no arbitrary-cast
    garbage ever participates in a comparison."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.timestamp("us", tz=a.type.tz), safe=False).cast(pa.int64())
    return a.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)



def _null_safe_kb(key_col, b_col) -> pa.Array:
    """Composite (key, bucket) string for the bucketed-window exchanges with
    SQL PARTITION BY null semantics: a NULL key gets a flagged sentinel slot
    (prefix-disambiguated so no real key can collide) instead of nulling the
    whole composite — which would collapse every (NULL-key, bucket) group
    into one."""
    import pyarrow.compute as pc

    ks = pc.cast(key_col, pa.string())
    ks = pc.if_else(pc.is_valid(ks),
                    pc.binary_join_element_wise(
                        pa.array(["v"] * len(ks), pa.string()),
                        ks.combine_chunks() if isinstance(ks, pa.ChunkedArray) else ks,
                        ""),
                    pa.scalar("n", pa.string()))
    return pc.binary_join_element_wise(ks, pc.cast(b_col, pa.string()), "\x1f")


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


def _interp_time_cubic(x: np.ndarray, tsv: np.ndarray) -> np.ndarray:
    """Natural-cubic-spline interpolation of interior null gaps over the TIME
    axis — the F4 cubic option matching the reference's CubicSpline gap fill
    over voiced points (04_feature_extraction_experiment/
    audio_feature_extraction 2/audio_feature_extraction/
    feature_extractor.py:224-232; boundary condition here is *natural*
    — zero second derivative at the ends — where scipy defaults to
    not-a-knot; documented semantic choice, no scipy in the engine).

    Non-null rows keep their value; leading/trailing nulls stay null (no
    extrapolation — matches :func:`_interp_time`). Duplicate-timestamp valid
    rows collapse to their first occurrence for the spline knots. The
    tridiagonal solve is the Thomas algorithm — O(m) sequential per entity
    (inherent data dependence); the vectorized linear path stays the default.
    """
    valid = ~np.isnan(x)
    out = x.copy()
    if valid.sum() < 2:
        return out
    t_all = tsv[valid].astype(np.float64)
    y_all = x[valid]
    # collapse duplicate knot times (keep first) — h_i == 0 breaks the solve
    keep = np.concatenate(([True], np.diff(t_all) > 0))
    t, y = t_all[keep], y_all[keep]
    m = len(t)
    first_t, last_t = t_all[0], t_all[-1]
    gap = ~valid & (tsv > first_t) & (tsv < last_t)
    if not gap.any():
        return out
    tg = tsv[gap].astype(np.float64)
    if m == 2:
        frac = (tg - t[0]) / (t[1] - t[0])
        out[gap] = y[0] + (y[1] - y[0]) * frac
        return out
    h = np.diff(t)
    slope = np.diff(y) / h
    # natural BC: M[0] = M[m-1] = 0; interior M from the tridiagonal system
    # h[i-1]*M[i-1] + 2*(h[i-1]+h[i])*M[i] + h[i]*M[i+1] = 6*(slope[i]-slope[i-1])
    n_int = m - 2
    diag = 2.0 * (h[:-1] + h[1:])
    lower = h[1:-1].copy()  # sub-diagonal (rows 1..n_int-1)
    upper = h[1:-1].copy()  # super-diagonal (rows 0..n_int-2)
    rhs = 6.0 * (slope[1:] - slope[:-1])
    # Thomas forward sweep + back substitution
    cp = np.empty(n_int)
    dp = np.empty(n_int)
    cp[0] = upper[0] / diag[0] if n_int > 1 else 0.0
    dp[0] = rhs[0] / diag[0]
    for i in range(1, n_int):
        denom = diag[i] - lower[i - 1] * cp[i - 1]
        cp[i] = upper[i] / denom if i < n_int - 1 else 0.0
        dp[i] = (rhs[i] - lower[i - 1] * dp[i - 1]) / denom
    M = np.zeros(m)
    M[n_int] = dp[n_int - 1]
    for i in range(n_int - 2, -1, -1):
        M[i + 1] = dp[i] - cp[i] * M[i + 2]
    # evaluate on the owning interval
    seg = np.clip(np.searchsorted(t, tg, side="right") - 1, 0, m - 2)
    hs = h[seg]
    ta, tb = t[seg], t[seg + 1]
    out[gap] = (
        M[seg] * (tb - tg) ** 3 / (6.0 * hs)
        + M[seg + 1] * (tg - ta) ** 3 / (6.0 * hs)
        + (y[seg] / hs - M[seg] * hs / 6.0) * (tb - tg)
        + (y[seg + 1] / hs - M[seg + 1] * hs / 6.0) * (tg - ta)
    )
    return out


def window_out_schema(
    in_schema: pa.Schema,
    value_cols: list[str],
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (1,),
    deltas: bool = True,
    fill_cols: list[str] | None = None,
    interp_cols: list[str] | None = None,
    cumulative: list[str] | None = None,
    trailing: list[str] | None = None,
    rolling: dict[str, int] | None = None,
    rolling_time_us: dict[str, int] | None = None,
    session_gap_us: int | None = None,
    **_ignored,
) -> pa.Schema:
    """Output schema of :func:`window_features` for a given input schema —
    computable WITHOUT executing the input pipeline, so schema-dependent
    downstream operators (e.g. the broadcast as-of join) can skip their
    ``ds.schema()`` probe. Extra kwargs matching :func:`window_features`'s
    non-schema parameters (key/ts/assume_partitioned/...) are ignored so a
    caller can splat one shared kwargs dict into both functions."""
    out_fields = [pa.field(n, t) for n, t in zip(in_schema.names, in_schema.types)]
    for c in value_cols:
        for k in lags:
            out_fields.append(pa.field(f"{c}_lag_{k}", pa.float64()))
        for k in leads:
            out_fields.append(pa.field(f"{c}_lead_{k}", pa.float64()))
        if deltas:
            out_fields.append(pa.field(f"{c}_delta", pa.float64()))
            out_fields.append(pa.field(f"{c}_delta2", pa.float64()))
    for c in fill_cols or []:
        out_fields.append(pa.field(f"{c}_ffill", pa.float64()))
        out_fields.append(pa.field(f"{c}_bfill", pa.float64()))
    for c in interp_cols or []:
        out_fields.append(pa.field(f"{c}_interp", pa.float64()))
    for c in cumulative or []:
        out_fields.append(pa.field(f"{c}_cumsum", pa.float64()))
        out_fields.append(pa.field(f"{c}_cummean", pa.float64()))
        out_fields.append(pa.field(f"{c}_cummax", pa.float64()))
        out_fields.append(pa.field(f"{c}_cumcount", pa.int64()))
    for c in trailing or []:
        out_fields.append(pa.field(f"{c}_trail_sum", pa.float64()))
        out_fields.append(pa.field(f"{c}_trail_mean", pa.float64()))
        out_fields.append(pa.field(f"{c}_trail_std", pa.float64()))
        out_fields.append(pa.field(f"{c}_trail_count", pa.int64()))
    for c, k in (rolling or {}).items():
        out_fields.append(pa.field(f"{c}_rollmean_{k}", pa.float64()))
    for c, w in (rolling_time_us or {}).items():
        out_fields.append(pa.field(f"{c}_rollmean_t{w}", pa.float64()))
    if session_gap_us is not None:
        out_fields.append(pa.field("session_id", pa.int64()))
    return pa.schema(out_fields)


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
    cumulative: list[str] | None = None,
    trailing: list[str] | None = None,
    interp_method: str = "linear",
    in_schema: pa.Schema | None = None,
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
    cumulative = cumulative or []
    trailing = trailing or []
    if interp_method not in ("linear", "cubic"):
        raise ValueError(f"interp_method must be 'linear' or 'cubic', got {interp_method!r}")
    if in_schema is not None:
        # caller-supplied input schema: skips the ds.schema() probe, which on
        # a lazy map_batches pipeline costs a full partial EXECUTION (executor
        # + actor-pool spin-up) before the real run even starts
        schema = in_schema
    else:
        ds, schema = arrow_schema_of(ds)
    fields = list(zip(schema.names, schema.types))
    out_schema = window_out_schema(
        schema,
        value_cols=value_cols,
        lags=lags,
        leads=leads,
        deltas=deltas,
        fill_cols=fill_cols,
        interp_cols=interp_cols,
        cumulative=cumulative,
        trailing=trailing,
        rolling=rolling,
        rolling_time_us=rolling_time_us,
        session_gap_us=session_gap_us,
    )

    def vector_block(block: pa.Table) -> pa.Table:
        """ALL entities of a co-located block in ONE vectorized pass (round
        3): per-entity ``map_groups`` paid a measured ~0.2 ms of Python per
        group, which dominates the stage at real entity cardinality.
        Selection-style kernels (lag/lead/delta, ffill/bfill, linear interp,
        sessionize) run as whole-block numpy expressions with
        segment-bounded shifts/scans — bit-identical to the per-entity
        kernels (same element selections, same elementwise arithmetic).
        Order-sensitive accumulations (cumulative family, rolling means,
        cubic spline) run per segment on numpy slices so their float
        accumulation order — which the SQL oracle reproduces — is unchanged;
        the per-segment python overhead is a slice + a few array ops, ~50x
        cheaper than a map_groups call."""
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        from .util import null_safe_group_codes

        # NULL entity keys form ONE partition (SQL PARTITION BY); NULL
        # timestamps sort LAST within it (DuckDB ORDER BY ... ASC default),
        # mapped to INT64_MAX so every positional kernel below — lag/lead,
        # fills, expanding sums, row frames — sees them as ordinary rows at
        # the partition end, exactly like the SQL window. The null mask is
        # kept for the kernels whose SEMANTICS read the timestamp value
        # (session gaps, time interpolation).
        g, _, _ = null_safe_group_codes(block.column(key))
        ts_arr = block.column(ts).combine_chunks()
        ts_null_all = ts_arr.is_null().to_numpy(zero_copy_only=False)
        tsv_all = _ts_i64(ts_arr)
        if ts_null_all.any():
            tsv_all = tsv_all.copy()
            tsv_all[ts_null_all] = np.iinfo(np.int64).max
        if tiebreak is not None:
            tb = _f64(block.column(tiebreak))
            order = np.lexsort((tb, tsv_all, g))
        else:
            order = np.lexsort((tsv_all, g))
        block = block.take(pa.array(order, pa.int64()))
        tsv = tsv_all[order]
        ts_null = ts_null_all[order]
        g = g[order]
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        seg_start_of = np.repeat(seg_first, seg_sizes)
        seg_end_of = np.repeat(seg_first + seg_sizes - 1, seg_sizes)

        def seg_shift(x: np.ndarray, k: int) -> np.ndarray:
            idx = pos - k
            ok = (idx >= seg_start_of) & (idx <= seg_end_of)
            out = np.full(n, np.nan)
            out[ok] = x[idx[ok]]
            return out

        cols: dict[str, object] = {nm: block.column(nm) for nm, _ in fields}
        for c in value_cols:
            x = _f64(block.column(c))
            for k in lags:
                cols[f"{c}_lag_{k}"] = pa.array(seg_shift(x, k), pa.float64(),
                                                from_pandas=True)
            for k in leads:
                cols[f"{c}_lead_{k}"] = pa.array(seg_shift(x, -k), pa.float64(),
                                                 from_pandas=True)
            if deltas:
                d = x - seg_shift(x, 1)
                cols[f"{c}_delta"] = pa.array(d, pa.float64(), from_pandas=True)
                cols[f"{c}_delta2"] = pa.array(d - seg_shift(d, 1), pa.float64(),
                                               from_pandas=True)
        for c in fill_cols:
            x = _f64(block.column(c))
            valid = ~np.isnan(x)
            lv = np.maximum.accumulate(np.where(valid, pos, -1))
            okf = lv >= seg_start_of
            nv = np.minimum.accumulate(np.where(valid, pos, n)[::-1])[::-1]
            okb = nv <= seg_end_of
            cols[f"{c}_ffill"] = pa.array(
                np.where(okf, x[np.maximum(lv, 0)], np.nan), pa.float64(),
                from_pandas=True)
            cols[f"{c}_bfill"] = pa.array(
                np.where(okb, x[np.minimum(nv, n - 1)], np.nan), pa.float64(),
                from_pandas=True)
        for c in interp_cols:
            # time interpolation READS the timestamp: an observation needs
            # BOTH value and ts non-null, and a null-ts gap row has no
            # position on the time axis → NULL out (SQL epoch arithmetic)
            x = _f64(block.column(c))
            if interp_method == "cubic":
                obs_x = np.where(ts_null, np.nan, x)
                out = np.empty(n)
                for st, size in zip(seg_first, seg_sizes):
                    sl = slice(st, st + size)
                    out[sl] = _interp_time_cubic(obs_x[sl].copy(), tsv[sl])
                # a null-ts row keeps its own value but is never filled
                out = np.where(ts_null, x, out)
            else:
                valid = ~np.isnan(x) & ~ts_null
                lv = np.maximum.accumulate(np.where(valid, pos, -1))
                nv = np.minimum.accumulate(np.where(valid, pos, n)[::-1])[::-1]
                gap = np.isnan(x) & ~ts_null & (lv >= seg_start_of) & (nv <= seg_end_of)
                out = x.copy()
                if gap.any():
                    pv, nvv = x[lv[gap]], x[nv[gap]]
                    ptf = tsv[lv[gap]].astype(np.float64)
                    ntf = tsv[nv[gap]].astype(np.float64)
                    tf = tsv[gap].astype(np.float64)
                    dt = ntf - ptf
                    frac = np.where(dt > 0, (tf - ptf) / np.maximum(dt, 1.0), 0.0)
                    out[gap] = pv + (nvv - pv) * frac
            cols[f"{c}_interp"] = pa.array(out, pa.float64(), from_pandas=True)
        for c in cumulative:
            # expanding aggregates accumulate strictly IN FRAME ORDER so the
            # SQL oracle reproduces them bitwise — original kernel per
            # segment (a global cumsum + base-subtract would re-associate
            # the floats)
            x = _f64(block.column(c))
            cs_out = np.empty(n)
            mean_out = np.empty(n)
            mx_out = np.empty(n)
            cnt_out = np.empty(n, dtype=np.int64)
            for st, size in zip(seg_first, seg_sizes):
                sl = slice(st, st + size)
                xs = x[sl]
                valid = ~np.isnan(xs)
                cnt = np.cumsum(valid.astype(np.int64))
                cs = np.cumsum(np.where(valid, xs, 0.0))
                none_yet = cnt == 0
                cs_out[sl] = np.where(none_yet, np.nan, cs)
                mean_out[sl] = np.where(none_yet, np.nan, cs / np.maximum(cnt, 1))
                mx_out[sl] = np.fmax.accumulate(xs)
                cnt_out[sl] = cnt
            cols[f"{c}_cumsum"] = pa.array(cs_out, pa.float64(), from_pandas=True)
            cols[f"{c}_cummean"] = pa.array(mean_out, pa.float64(), from_pandas=True)
            cols[f"{c}_cummax"] = pa.array(mx_out, pa.float64(), from_pandas=True)
            cols[f"{c}_cumcount"] = pa.array(cnt_out, pa.int64())
        for c in trailing:
            # STRICTLY-PRIOR expanding aggregates — the zero-temporal-leakage
            # point-in-time feature (SQL frame ROWS BETWEEN UNBOUNDED
            # PRECEDING AND 1 PRECEDING): row i sees only rows < i of its
            # entity, never itself. Same in-frame accumulation order as the
            # cumulative family, shifted one row.
            x = _f64(block.column(c))
            ts_out = np.empty(n)
            tm_out = np.empty(n)
            tsd_out = np.empty(n)
            tc_out = np.empty(n, dtype=np.int64)
            for st, size in zip(seg_first, seg_sizes):
                sl = slice(st, st + size)
                xs = x[sl]
                valid = ~np.isnan(xs)
                cnt = np.concatenate(([0], np.cumsum(valid.astype(np.int64))[:-1]))
                cs = np.concatenate(([0.0], np.cumsum(np.where(valid, xs, 0.0))[:-1]))
                cs2 = np.concatenate(
                    ([0.0], np.cumsum(np.where(valid, xs * xs, 0.0))[:-1]))
                none_yet = cnt == 0
                ts_out[sl] = np.where(none_yet, np.nan, cs)
                tm_out[sl] = np.where(none_yet, np.nan, cs / np.maximum(cnt, 1))
                with np.errstate(invalid="ignore", divide="ignore"):
                    m2 = cs2 - cs * cs / np.maximum(cnt, 1)
                    sd = np.sqrt(np.maximum(m2, 0.0) / np.maximum(cnt - 1, 1))
                # SQL STDDEV_SAMP: NULL until 2 prior samples exist
                tsd_out[sl] = np.where(cnt >= 2, sd, np.nan)
                tc_out[sl] = cnt
            cols[f"{c}_trail_sum"] = pa.array(ts_out, pa.float64(), from_pandas=True)
            cols[f"{c}_trail_mean"] = pa.array(tm_out, pa.float64(), from_pandas=True)
            cols[f"{c}_trail_std"] = pa.array(tsd_out, pa.float64(), from_pandas=True)
            cols[f"{c}_trail_count"] = pa.array(tc_out, pa.int64())
        for c, k in (rolling or {}).items():
            # trailing k-row mean ignoring nulls (SQL AVG OVER ROWS k-1
            # PRECEDING AND CURRENT ROW) — prefix sums stay segment-local
            # for oracle-exact float order
            x = _f64(block.column(c))
            out = np.empty(n)
            for st, size in zip(seg_first, seg_sizes):
                sl = slice(st, st + size)
                xs = x[sl]
                valid = ~np.isnan(xs)
                cs = np.concatenate(([0.0], np.cumsum(np.where(valid, xs, 0.0))))
                cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
                i = np.arange(size)
                lo = np.maximum(0, i - k + 1)
                sums = cs[i + 1] - cs[lo]
                cnts = cc[i + 1] - cc[lo]
                out[sl] = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
            cols[f"{c}_rollmean_{k}"] = pa.array(out, pa.float64(), from_pandas=True)
        for c, w in (rolling_time_us or {}).items():
            # time-range trailing mean (SQL RANGE INTERVAL PRECEDING frame,
            # peer rows at the current ts included)
            x = _f64(block.column(c))
            out = np.empty(n)
            for st, size in zip(seg_first, seg_sizes):
                sl = slice(st, st + size)
                xs = x[sl]
                tss = tsv[sl]
                valid = ~np.isnan(xs)
                cs = np.concatenate(([0.0], np.cumsum(np.where(valid, xs, 0.0))))
                cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
                lo = np.searchsorted(tss, tss - w, side="left")
                hi = np.searchsorted(tss, tss, side="right")
                sums = cs[hi] - cs[lo]
                cnts = cc[hi] - cc[lo]
                out[sl] = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
            cols[f"{c}_rollmean_t{w}"] = pa.array(out, pa.float64(), from_pandas=True)
        if session_gap_us is not None:
            gaps = np.diff(tsv, prepend=tsv[0] if n else 0)
            # SQL: ts - lag(ts) with a NULL ts is NULL, and NULL > gap is
            # false — a null-ts row (sorted last) never starts a session;
            # nulls-last ordering makes the previous row's validity implied
            new_sess = (gaps > session_gap_us) & (pos != seg_start_of) & ~ts_null
            incl = np.cumsum(new_sess.astype(np.int64))
            cols["session_id"] = pa.array(incl - incl[seg_start_of], pa.int64())
        return pa.table(cols, schema=out_schema)

    if assume_partitioned:
        return ds.map_batches(
            vector_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    n_partitions = 64

    return coarse_partitioned(ds, key, vector_block,
                              n_partitions=n_partitions)


def window_features_bucketed(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    value_cols: list[str],
    bucket_us: int,
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (1,),
    deltas: bool = True,
    fill_cols: list[str] | None = None,
    interp_cols: list[str] | None = None,
    session_gap_us: int | None = None,
    rolling: dict[str, int] | None = None,
    rolling_time_us: dict[str, int] | None = None,
    tiebreak: str | None = None,
) -> ray.data.Dataset:
    """Bounded-memory :func:`window_features` for giant entities (SURVEY
    §7.6) — the windowed mirror of ``asof_join_bucketed``.

    ``window_features`` materializes one whole entity per ``map_groups``
    call; a million-row hot ``image_id`` lands in one task. This variant
    co-partitions by ``(entity, time-bucket)`` so no task ever holds more
    than one bucket of one entity:

    A. per ``(key, bucket)`` group, emit a SUMMARY row — the bucket's first/
       last K boundary rows (K = the largest window reach), first/last
       non-null per fill column, in-bucket session-start count. One row per
       bucket, independent of bucket size.
    B. per ``key``, scan the (tiny) summary rows in bucket order and derive
       each bucket's carry-in state: the true previous/next K rows across
       bucket gaps, the running last/first non-null for ffill/bfill/interp,
       and the cumulative session-start count (monotone cursors over
       summaries — the watermark analog at the bucket level).
    C. per ``(key, bucket)`` group again, windows compute over the bucket
       extended with its carried boundary rows, then the extension is sliced
       off. Lag/lead/delta/rolling reach across buckets through the carried
       rows; ffill/bfill/interp fall back to the carried non-null scalars;
       ``session_id`` adds the carried start count.

    Equivalent to :func:`window_features` (pinned by tests, including a
    giant-hot-entity case); costs one extra shuffle of the data — the price
    of the per-task memory bound. ``rolling_time_us`` works via bounded
    CONTEXT-ROW duplication: rows within the window reach of a later
    bucket's frames are co-shipped to that bucket (tagged, used for the
    time-window sums, never re-emitted), chained ``ceil(w / bucket_us)``
    buckets ahead — per-task memory grows to ``1 + ceil(w/bucket_us)``
    buckets, the caller's bucket-size/window trade.
    """
    import pyarrow.compute as pc

    fill_cols = fill_cols or []
    interp_cols = interp_cols or []
    rolling = rolling or {}
    rolling_time_us = rolling_time_us or {}
    max_w = max(rolling_time_us.values(), default=0)
    # chained context duplication: a time window reaching R buckets back
    # ships each row to up to R subsequent buckets — per-task memory grows
    # to (1 + R) buckets, the caller's bucket_us/window trade
    ctx_reach = -(-max_w // bucket_us) if max_w > 0 else 0
    ds, schema = arrow_schema_of(ds)
    fields = list(zip(schema.names, schema.types))
    # largest backward/forward reach in ROWS
    K = max(
        [0] + list(lags) + list(leads)
        + ([2] if deltas else [])
        + [k - 1 for k in rolling.values()]
    )
    carry_cols = sorted(set(value_cols) | set(rolling))
    nn_cols = sorted(set(fill_cols) | set(interp_cols))

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
    for c, k in rolling.items():
        out_fields.append(pa.field(f"{c}_rollmean_{k}", pa.float64()))
    for c, w in rolling_time_us.items():
        out_fields.append(pa.field(f"{c}_rollmean_t{w}", pa.float64()))
    if session_gap_us is not None:
        out_fields.append(pa.field("session_id", pa.int64()))
    out_schema = pa.schema(out_fields)

    def kb_of(t: pa.Table) -> pa.Table:
        # null-ts rows live in ONE sentinel bucket per entity that sorts
        # after every real bucket — the bucketed mirror of the plain
        # variant's NULLS-LAST ordering. They are never context for a real
        # bucket (a real time frame can't reach them) and their own time
        # frames cover exactly the null peer group (DuckDB RANGE nulls).
        ts_arr = t.column(ts).combine_chunks()
        ts_valid = ts_arr.is_valid().to_numpy(zero_copy_only=False)
        tsv = _ts_i64_bucketed(ts_arr)
        b = np.where(ts_valid, tsv // bucket_us, _NULL_BUCKET)
        t = t.append_column("__b", pa.array(b, pa.int64())) \
            .append_column("__ctx", pa.array(np.zeros(len(tsv), np.int8)))
        if ctx_reach > 0:
            # context duplication: rows within max_w of a LATER bucket's
            # window serve that bucket's trailing time frames (chained up
            # to ctx_reach buckets ahead for windows spanning buckets)
            parts = [t]
            for j in range(1, ctx_reach + 1):
                near = ts_valid & (tsv >= (b + j) * bucket_us - max_w)
                if near.any():
                    dup = t.filter(pa.array(near))
                    dup = dup.set_column(
                        dup.column_names.index("__b"), "__b",
                        pc.add(dup.column("__b"), j),
                    ).set_column(
                        dup.column_names.index("__ctx"), "__ctx",
                        pa.array(np.ones(dup.num_rows, np.int8)),
                    )
                    parts.append(dup)
            if len(parts) > 1:
                t = pa.concat_tables(parts)
        kb = _null_safe_kb(t.column(key), t.column("__b"))
        return t.append_column("__kb", kb)

    bucketed = ds.map_batches(kb_of, batch_format="pyarrow", zero_copy_batch=True)

    # ---- phase A: one summary row per (key, bucket)
    key_type = schema.types[schema.names.index(key)]
    summary_fields = [
        pa.field(key, key_type), pa.field("__b", pa.int64()), pa.field("__n", pa.int64()),
        pa.field("__first_ts", pa.int64()), pa.field("__last_ts", pa.int64()),
        pa.field("__tail_ts", pa.list_(pa.int64())), pa.field("__head_ts", pa.list_(pa.int64())),
    ]
    for c in carry_cols:
        summary_fields.append(pa.field(f"__tail_{c}", pa.list_(pa.float64())))
        summary_fields.append(pa.field(f"__head_{c}", pa.list_(pa.float64())))
    for c in nn_cols:
        summary_fields += [
            pa.field(f"__lastnn_v_{c}", pa.float64()), pa.field(f"__lastnn_t_{c}", pa.int64()),
            pa.field(f"__firstnn_v_{c}", pa.float64()), pa.field(f"__firstnn_t_{c}", pa.int64()),
        ]
    for c in interp_cols:
        # interp-variant first-non-null: an interpolation OBSERVATION needs
        # both value and ts (fills are positional and keep null-ts values;
        # the prev direction needs no variant — null-ts rows only ever live
        # in the LAST, sentinel bucket, so earlier-bucket carries agree)
        summary_fields += [
            pa.field(f"__firstnnI_v_{c}", pa.float64()),
            pa.field(f"__firstnnI_t_{c}", pa.int64()),
        ]
    if session_gap_us is not None:
        summary_fields.append(pa.field("__starts", pa.int64()))
    summary_schema = pa.schema(summary_fields)

    def _list_col(lengths: np.ndarray, values: np.ndarray, typ: pa.DataType) -> pa.ListArray:
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
        return pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(values, typ), pa.list_(typ)
        )

    def summarize_part(t: pa.Table) -> pa.Table:
        """Phase A over a whole coarse partition: ONE vectorized segment scan
        summarizes every (key, bucket) group at once — per-group dispatch
        (map_groups or even a plain per-slice call doing pyarrow work) costs
        ~0.1–0.2 ms, and at real scale the group count approaches the row
        count (buckets hold few rows for sparse entities)."""
        if max_w > 0:
            t = t.filter(pc.equal(t.column("__ctx"), 0))
        n = t.num_rows
        if n == 0:
            # a partition holding only CONTEXT duplicates — contributes nothing
            return summary_schema.empty_table()
        t = t.combine_chunks()
        kb = (
            t.column("__kb").combine_chunks().dictionary_encode().indices
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ts_arr = t.column(ts).combine_chunks()
        ts_null = ts_arr.is_null().to_numpy(zero_copy_only=False)
        tsv = _ts_i64_bucketed(ts_arr)
        if ts_null.any():
            # the sentinel bucket's rows order NULLS-LAST-consistently and
            # produce zero in-bucket gaps (no session starts among nulls)
            tsv[ts_null] = np.iinfo(np.int64).max
        if tiebreak is not None:
            order = np.lexsort((_f64(t.column(tiebreak)), tsv, kb))
        else:
            order = np.lexsort((tsv, kb))
        t = t.take(pa.array(order, pa.int64()))
        kb = kb[order]
        tsv = tsv[order]
        ts_null = ts_null[order]
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(kb)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        seg_last = seg_first + seg_sizes - 1
        seg_start_of = np.repeat(seg_first, seg_sizes)
        first_idx = pa.array(seg_first, pa.int64())
        out: dict[str, object] = {
            key: t.column(key).take(first_idx),
            "__b": t.column("__b").take(first_idx),
            "__n": pa.array(seg_sizes, pa.int64()),
            "__first_ts": pa.array(tsv[seg_first], pa.int64()),
            "__last_ts": pa.array(tsv[seg_last], pa.int64()),
        }
        if K:
            tail_len = np.minimum(seg_sizes, K)
            head_len = tail_len
            # flat gather indices: each segment's last/first `len` positions,
            # ascending — identical to the per-group [-K:] / [:K] slices
            tail_idx = np.repeat(seg_last - tail_len + 1, tail_len) + (
                np.arange(int(tail_len.sum()))
                - np.repeat(np.concatenate(([0], np.cumsum(tail_len)[:-1])), tail_len)
            )
            head_idx = np.repeat(seg_first, head_len) + (
                np.arange(int(head_len.sum()))
                - np.repeat(np.concatenate(([0], np.cumsum(head_len)[:-1])), head_len)
            )
        else:
            tail_len = head_len = np.zeros(len(seg_first), np.int64)
            tail_idx = head_idx = np.empty(0, np.int64)
        out["__tail_ts"] = _list_col(tail_len, tsv[tail_idx], pa.int64())
        out["__head_ts"] = _list_col(head_len, tsv[head_idx], pa.int64())
        col_cache: dict[str, np.ndarray] = {}

        def _colv(c: str) -> np.ndarray:
            if c not in col_cache:
                col_cache[c] = _f64(t.column(c))
            return col_cache[c]

        for c in carry_cols:
            x = _colv(c)
            out[f"__tail_{c}"] = _list_col(tail_len, x[tail_idx], pa.float64())
            out[f"__head_{c}"] = _list_col(head_len, x[head_idx], pa.float64())
        for c in nn_cols:
            x = _colv(c)
            valid = ~np.isnan(x)
            lv = np.maximum.accumulate(np.where(valid, pos, -1))[seg_last]
            has_last = lv >= seg_first
            nv = np.minimum.accumulate(np.where(valid, pos, n)[::-1])[::-1][seg_first]
            has_first = nv <= seg_last
            out[f"__lastnn_v_{c}"] = pa.array(
                np.where(has_last, x[np.maximum(lv, 0)], np.nan), pa.float64(),
                from_pandas=True)
            # ts values < 2^53 are exact in float64, so NaN-as-null + cast
            # stays lossless
            out[f"__lastnn_t_{c}"] = pa.array(
                np.where(has_last, tsv[np.maximum(lv, 0)].astype(np.float64), np.nan),
                pa.float64(), from_pandas=True).cast(pa.int64())
            out[f"__firstnn_v_{c}"] = pa.array(
                np.where(has_first, x[np.minimum(nv, n - 1)], np.nan), pa.float64(),
                from_pandas=True)
            out[f"__firstnn_t_{c}"] = pa.array(
                np.where(has_first, tsv[np.minimum(nv, n - 1)].astype(np.float64), np.nan),
                pa.float64(), from_pandas=True).cast(pa.int64())
        for c in interp_cols:
            x = _colv(c)
            valid_i = ~np.isnan(x) & ~ts_null
            nv_i = np.minimum.accumulate(np.where(valid_i, pos, n)[::-1])[::-1][seg_first]
            has_first_i = nv_i <= seg_last
            out[f"__firstnnI_v_{c}"] = pa.array(
                np.where(has_first_i, x[np.minimum(nv_i, n - 1)], np.nan),
                pa.float64(), from_pandas=True)
            out[f"__firstnnI_t_{c}"] = pa.array(
                np.where(has_first_i,
                         tsv[np.minimum(nv_i, n - 1)].astype(np.float64), np.nan),
                pa.float64(), from_pandas=True).cast(pa.int64())
        if session_gap_us is not None:
            gaps_flag = (
                (np.diff(tsv, prepend=0) > session_gap_us) & (pos != seg_start_of)
            )
            out["__starts"] = pa.array(
                np.add.reduceat(gaps_flag.astype(np.int64), seg_first), pa.int64()
            )
        return pa.table({nm: out[nm] for nm in summary_schema.names}).cast(summary_schema)

    summaries = coarse_partitioned(bucketed, "__kb", summarize_part)

    # ---- phase B: per-key scan over bucket summaries → carry-in state rows
    state_names: list[str] = ["__prev_ts", "__next_ts", "__sess_carry", "__prev_last_ts"]
    state_types: dict[str, pa.DataType] = {
        "__prev_ts": pa.list_(pa.int64()),
        "__next_ts": pa.list_(pa.int64()),
        "__sess_carry": pa.int64(),
        "__prev_last_ts": pa.int64(),
    }
    for c in carry_cols:
        for side in ("prev", "next"):
            state_names.append(f"__{side}_{c}")
            state_types[f"__{side}_{c}"] = pa.list_(pa.float64())
    for c in nn_cols:
        for pref, typ in ((f"__prevnn_v_{c}", pa.float64()), (f"__prevnn_t_{c}", pa.int64()),
                          (f"__nextnn_v_{c}", pa.float64()), (f"__nextnn_t_{c}", pa.int64())):
            state_names.append(pref)
            state_types[pref] = typ
    for c in interp_cols:
        for pref, typ in ((f"__nextnnI_v_{c}", pa.float64()),
                          (f"__nextnnI_t_{c}", pa.int64())):
            state_names.append(pref)
            state_types[pref] = typ
    state_row_schema = pa.schema(
        [pa.field(key, key_type), pa.field("__b", pa.int64())]
        + [pa.field(nm, state_types[nm]) for nm in state_names]
    )
    states_schema = state_row_schema.append(pa.field("__kb", pa.string()))

    def scan_part(t: pa.Table) -> pa.Table:
        """Phase B over a whole coarse partition: every key's bucket-summary
        scan runs as ONE vectorized pass (the old per-key Python fold built a
        dict per summary row — at real scale summary count ~ bucket count).
        Carries are exclusive-prefix forms: the carried prev-K rows of bucket
        i are the last K of the concatenation of earlier buckets' tails
        (each tail already holds its bucket's last K, so the flat gather is
        exact), the running non-null carries are segment-clamped accumulates
        evaluated at i-1, and the session carry is an exact integer exclusive
        cumsum."""
        n = t.num_rows
        if n == 0:
            return states_schema.empty_table()
        t = t.combine_chunks()
        from .util import null_safe_group_codes

        # NULL keys form one summary segment (SQL PARTITION BY)
        g, _, _ = null_safe_group_codes(t.column(key))
        bv = t.column("__b").to_numpy(zero_copy_only=False)
        order = np.lexsort((bv, g))
        t = t.take(pa.array(order, pa.int64()))
        g = g[order]
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        seg_start_of = np.repeat(seg_first, seg_sizes)
        seg_end_of = np.repeat(seg_first + seg_sizes - 1, seg_sizes)
        first_ts = t.column("__first_ts").to_numpy(zero_copy_only=False)
        last_ts = t.column("__last_ts").to_numpy(zero_copy_only=False)
        prev_ok = (pos - 1) >= seg_start_of
        prev_i = np.maximum(pos - 1, 0)
        out: dict[str, object] = {
            key: t.column(key),
            "__b": t.column("__b"),
            "__prev_last_ts": pa.array(
                np.where(prev_ok, last_ts[prev_i].astype(np.float64), np.nan),
                pa.float64(), from_pandas=True).cast(pa.int64()),
        }
        if session_gap_us is not None:
            starts = t.column("__starts").to_numpy(zero_copy_only=False)
            # the sentinel (null-ts) bucket's first_ts is INT64_MAX — its
            # rows extend the open session, never start one
            boundary = prev_ok & ((first_ts - last_ts[prev_i]) > session_gap_us) \
                & (first_ts != np.iinfo(np.int64).max)
            inc = starts + boundary.astype(np.int64)
            cum = np.cumsum(inc)
            excl = cum - inc
            carry = excl - np.repeat(excl[seg_first], seg_sizes)
        else:
            carry = np.zeros(n, np.int64)
        out["__sess_carry"] = pa.array(carry, pa.int64())

        def exclusive_lists(lens_col, flat_cols):
            # prev-K of bucket i = last K of flat[seg_start : off_i];
            # next-K handled by the caller with the reversed form
            lens = pc.list_value_length(lens_col).to_numpy(zero_copy_only=False).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            seg_flat_start = offs[seg_first][np.repeat(np.arange(len(seg_first)), seg_sizes)]
            L = np.minimum(K, offs[pos] - seg_flat_start)
            within = np.arange(int(L.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(L)[:-1])), L
            )
            idx = np.repeat(offs[pos] - L, L) + within
            return L, idx

        def inclusive_next_lists(lens_col):
            lens = pc.list_value_length(lens_col).to_numpy(zero_copy_only=False).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))
            seg_ids = np.repeat(np.arange(len(seg_first)), seg_sizes)
            seg_flat_end = offs[seg_first + seg_sizes - 1 + 1][seg_ids]
            start = offs[pos + 1 - 1 + 1]  # flat offset AFTER bucket i's head
            L = np.minimum(K, seg_flat_end - start)
            within = np.arange(int(L.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(L)[:-1])), L
            )
            idx = np.repeat(start, L) + within
            return L, idx

        def flat_of(nm, np_dtype):
            return pc.list_flatten(t.column(nm).combine_chunks()) \
                .to_numpy(zero_copy_only=False).astype(np_dtype)

        if K:
            Lp, pidx = exclusive_lists(t.column("__tail_ts").combine_chunks(), None)
            Ln, nidx = inclusive_next_lists(t.column("__head_ts").combine_chunks())
            out["__prev_ts"] = _list_col(Lp, flat_of("__tail_ts", np.int64)[pidx], pa.int64())
            out["__next_ts"] = _list_col(Ln, flat_of("__head_ts", np.int64)[nidx], pa.int64())
            for c in carry_cols:
                out[f"__prev_{c}"] = _list_col(
                    Lp, flat_of(f"__tail_{c}", np.float64)[pidx], pa.float64())
                out[f"__next_{c}"] = _list_col(
                    Ln, flat_of(f"__head_{c}", np.float64)[nidx], pa.float64())
        else:
            zeros = np.zeros(n, np.int64)
            empty_i = np.empty(0, np.int64)
            empty_f = np.empty(0, np.float64)
            out["__prev_ts"] = _list_col(zeros, empty_i, pa.int64())
            out["__next_ts"] = _list_col(zeros, empty_i, pa.int64())
            for c in carry_cols:
                out[f"__prev_{c}"] = _list_col(zeros, empty_f, pa.float64())
                out[f"__next_{c}"] = _list_col(zeros, empty_f, pa.float64())
        for c in nn_cols:
            lvv = _f64(t.column(f"__lastnn_v_{c}"))
            lvt = _f64(t.column(f"__lastnn_t_{c}"))
            valid = ~np.isnan(lvv)
            lv = np.maximum.accumulate(np.where(valid, pos, -1))
            lvx = np.where(prev_ok, lv[prev_i], -1)
            okp = lvx >= seg_start_of
            out[f"__prevnn_v_{c}"] = pa.array(
                np.where(okp, lvv[np.maximum(lvx, 0)], np.nan), pa.float64(),
                from_pandas=True)
            out[f"__prevnn_t_{c}"] = pa.array(
                np.where(okp, lvt[np.maximum(lvx, 0)], np.nan), pa.float64(),
                from_pandas=True).cast(pa.int64())
            fvv = _f64(t.column(f"__firstnn_v_{c}"))
            fvt = _f64(t.column(f"__firstnn_t_{c}"))
            valid2 = ~np.isnan(fvv)
            nv = np.minimum.accumulate(np.where(valid2, pos, n)[::-1])[::-1]
            next_ok = (pos + 1) <= seg_end_of
            nvx = np.where(next_ok, nv[np.minimum(pos + 1, n - 1)], n)
            okn = nvx <= seg_end_of
            out[f"__nextnn_v_{c}"] = pa.array(
                np.where(okn, fvv[np.minimum(nvx, n - 1)], np.nan), pa.float64(),
                from_pandas=True)
            out[f"__nextnn_t_{c}"] = pa.array(
                np.where(okn, fvt[np.minimum(nvx, n - 1)], np.nan), pa.float64(),
                from_pandas=True).cast(pa.int64())
        for c in interp_cols:
            # interp-variant next carry: sourced from the ts-valid firstnnI
            # summaries (same scan as nextnn)
            fvv = _f64(t.column(f"__firstnnI_v_{c}"))
            fvt = _f64(t.column(f"__firstnnI_t_{c}"))
            valid2 = ~np.isnan(fvv)
            nv = np.minimum.accumulate(np.where(valid2, pos, n)[::-1])[::-1]
            next_ok = (pos + 1) <= seg_end_of
            nvx = np.where(next_ok, nv[np.minimum(pos + 1, n - 1)], n)
            okn = nvx <= seg_end_of
            out[f"__nextnnI_v_{c}"] = pa.array(
                np.where(okn, fvv[np.minimum(nvx, n - 1)], np.nan), pa.float64(),
                from_pandas=True)
            out[f"__nextnnI_t_{c}"] = pa.array(
                np.where(okn, fvt[np.minimum(nvx, n - 1)], np.nan), pa.float64(),
                from_pandas=True).cast(pa.int64())
        st = pa.table({nm: out[nm] for nm in state_row_schema.names}).cast(state_row_schema)
        kb = _null_safe_kb(st.column(key), st.column("__b"))
        return st.append_column("__kb", kb)

    states = coarse_partitioned(summaries, key, scan_part)

    # ---- phase C: re-group data + state by (key, bucket); windows over the
    # bucket extended with its carried boundary rows
    union_names = [n for n, _ in fields] + ["__kb", "__side", "__ctx"] + state_names

    def prep_data(t: pa.Table) -> pa.Table:
        out = {n: t.column(n) for n, _ in fields}
        out["__kb"] = t.column("__kb")
        out["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        out["__ctx"] = t.column("__ctx")
        for n in state_names:
            out[n] = pa.nulls(t.num_rows, state_types[n])
        return pa.table({n: out[n] for n in union_names})

    def prep_state(t: pa.Table) -> pa.Table:
        out: dict = {}
        for n, typ in fields:
            if n == key:
                out[n] = t.column(key).cast(typ)
            else:
                out[n] = pa.nulls(t.num_rows, typ)
        out["__kb"] = t.column("__kb")
        out["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        out["__ctx"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        for n in state_names:
            if n in t.column_names:
                out[n] = t.column(n).cast(state_types[n])
            else:
                out[n] = pa.nulls(t.num_rows, state_types[n])
        return pa.table({n: out[n] for n in union_names})

    data_u = bucketed.drop_columns(["__b"]).map_batches(
        prep_data, batch_format="pyarrow", zero_copy_batch=True
    )
    state_u = states.map_batches(prep_state, batch_format="pyarrow", zero_copy_batch=True)
    unioned = data_u.union(state_u)

    def compute_part(t: pa.Table) -> pa.Table:
        """Phase C over a whole coarse partition: ONE vectorized pass runs
        every bucket's windows at once (same rationale as summarize_part —
        per-group dispatch dominates when buckets are small). Rows sort
        (bucket, state-row-first, ts[, tiebreak]); each bucket's carried
        prev/next lists become extension-array slots via offset arithmetic,
        so every kernel reproduces the per-bucket math (extension + slice ==
        the old ``[P : P + n]``). Rolling sums stay prefix-difference over
        windows clamped to the bucket's extension — the global running sum
        only perturbs floats at the ~1e-11 level, far inside the oracle's
        ROUND(..., 6) and the equivalence tests' allclose."""
        N = t.num_rows
        if N == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        kb = (
            t.column("__kb").combine_chunks().dictionary_encode().indices
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        side = t.column("__side").to_numpy(zero_copy_only=False)
        ctxf = t.column("__ctx").to_numpy(zero_copy_only=False)
        ts_arr_c = t.column(ts).combine_chunks()
        ts_null_c = ts_arr_c.is_null().to_numpy(zero_copy_only=False)
        tsv = _ts_i64_bucketed(ts_arr_c)
        if ts_null_c.any():
            # data rows with NULL ts (the sentinel bucket) order last and
            # give the zero-width time frames the null peer group needs;
            # state rows' null ts is harmless either way (side dominates)
            tsv[ts_null_c] = np.iinfo(np.int64).max
        if tiebreak is not None:
            order = np.lexsort((_f64(t.column(tiebreak)), tsv, side, kb))
        else:
            order = np.lexsort((tsv, side, kb))
        t = t.take(pa.array(order, pa.int64()))
        kb = kb[order]
        side = side[order]
        ctxf = ctxf[order]
        tsv = tsv[order]
        ts_null_c = ts_null_c[order]
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(kb)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [N])))
        S = len(seg_first)
        seg_id = np.repeat(np.arange(S), seg_sizes)
        has_state = side[seg_first] == 0

        def st_num(nm: str) -> np.ndarray:
            # per-SEGMENT scalar from the bucket's state row (NaN = absent)
            v = _f64(t.column(nm))[seg_first]
            return np.where(has_state, v, np.nan)

        def st_list(nm: str, np_dtype):
            # per-segment list payload: lengths + flattened values + offsets;
            # data rows carry null lists (len 0), absent state rows too
            at_first = t.column(nm).combine_chunks().take(pa.array(seg_first, pa.int64()))
            lens = pc.fill_null(pc.list_value_length(at_first), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(at_first).to_numpy(zero_copy_only=False).astype(np_dtype)
            offs = np.concatenate(([0], np.cumsum(lens)))
            return lens, flat, offs

        own_mask = (side == 1) & (ctxf == 0)
        own_idx = np.flatnonzero(own_mask)
        no = len(own_idx)
        if no == 0:
            return out_schema.empty_table()
        o_seg = seg_id[own_idx]
        o_first = np.concatenate(([0], np.flatnonzero(np.diff(o_seg)) + 1))
        o_sizes = np.diff(np.concatenate((o_first, [no])))
        R = len(o_first)
        r_seg = o_seg[o_first]  # kb segment of each own-run
        o_start_of = np.repeat(o_first, o_sizes)
        o_end_of = np.repeat(o_first + o_sizes - 1, o_sizes)
        opos = np.arange(no)
        tso = tsv[own_idx]
        null_own = ts_null_c[own_idx]

        def run_flat_idx(L: np.ndarray) -> np.ndarray:
            return np.arange(int(L.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(L)[:-1])), L
            )

        data = t.take(pa.array(own_idx, pa.int64()))
        cols: dict[str, object] = {nm: data.column(nm) for nm, _ in fields}

        need_ext = bool(value_cols) or bool(rolling)
        if need_ext:
            P_lens, _, _ = st_list("__prev_ts", np.int64)
            S_lens, _, _ = st_list("__next_ts", np.int64)
            P_run = P_lens[r_seg]
            S_run = S_lens[r_seg]
            ext_len = P_run + o_sizes + S_run
            ext_off = np.concatenate(([0], np.cumsum(ext_len)))[:-1]
            E = int(ext_len.sum())
            epos = np.arange(E)
            e_start_of = np.repeat(ext_off, ext_len)
            e_end_of = np.repeat(ext_off + ext_len - 1, ext_len)
            tgt_own = np.repeat(ext_off + P_run, o_sizes) + (opos - o_start_of)

            def ext_of(c: str) -> np.ndarray:
                xe = np.full(E, np.nan)
                plens, pflat, poffs = st_list(f"__prev_{c}", np.float64)
                Lp = plens[r_seg]
                if Lp.sum():
                    w_ = run_flat_idx(Lp)
                    xe[np.repeat(ext_off, Lp) + w_] = pflat[np.repeat(poffs[r_seg], Lp) + w_]
                xe[tgt_own] = _f64(t.column(c))[own_idx]
                nlens, nflat, noffs = st_list(f"__next_{c}", np.float64)
                Ls = nlens[r_seg]
                if Ls.sum():
                    w_ = run_flat_idx(Ls)
                    xe[np.repeat(ext_off + P_run + o_sizes, Ls) + w_] = \
                        nflat[np.repeat(noffs[r_seg], Ls) + w_]
                return xe

            def eshift(x: np.ndarray, k: int) -> np.ndarray:
                idx = epos - k
                ok = (idx >= e_start_of) & (idx <= e_end_of)
                outv = np.full(E, np.nan)
                outv[ok] = x[idx[ok]]
                return outv

        for c in value_cols:
            xe = ext_of(c)
            for k in lags:
                cols[f"{c}_lag_{k}"] = pa.array(
                    eshift(xe, k)[tgt_own], pa.float64(), from_pandas=True)
            for k in leads:
                cols[f"{c}_lead_{k}"] = pa.array(
                    eshift(xe, -k)[tgt_own], pa.float64(), from_pandas=True)
            if deltas:
                d = xe - eshift(xe, 1)
                cols[f"{c}_delta"] = pa.array(d[tgt_own], pa.float64(), from_pandas=True)
                cols[f"{c}_delta2"] = pa.array(
                    (d - eshift(d, 1))[tgt_own], pa.float64(), from_pandas=True)
        for c in fill_cols:
            x = _f64(t.column(c))[own_idx]
            pv = st_num(f"__prevnn_v_{c}")[o_seg]
            nx = st_num(f"__nextnn_v_{c}")[o_seg]
            valid = ~np.isnan(x)
            lv = np.maximum.accumulate(np.where(valid, opos, -1))
            f = np.where(lv >= o_start_of, x[np.maximum(lv, 0)], pv)
            cols[f"{c}_ffill"] = pa.array(f, pa.float64(), from_pandas=True)
            nv = np.minimum.accumulate(np.where(valid, opos, no)[::-1])[::-1]
            b = np.where(nv <= o_end_of, x[np.minimum(nv, no - 1)], nx)
            cols[f"{c}_bfill"] = pa.array(b, pa.float64(), from_pandas=True)
        for c in interp_cols:
            x = _f64(t.column(c))[own_idx]
            pv = st_num(f"__prevnn_v_{c}")[o_seg]
            pt = st_num(f"__prevnn_t_{c}")[o_seg]
            # interp-variant next carry: observations need value AND ts
            nxv = st_num(f"__nextnnI_v_{c}")[o_seg]
            nxt = st_num(f"__nextnnI_t_{c}")[o_seg]
            # in-bucket observations likewise (only the sentinel bucket can
            # contain null-ts rows among its own rows)
            valid = ~np.isnan(x) & ~null_own
            lv = np.maximum.accumulate(np.where(valid, opos, -1))
            nv = np.minimum.accumulate(np.where(valid, opos, no)[::-1])[::-1]
            in_l = lv >= o_start_of
            in_r = nv <= o_end_of
            lval = np.where(in_l, x[np.maximum(lv, 0)], pv)
            ltim = np.where(in_l, tso[np.maximum(lv, 0)].astype(np.float64), pt)
            rval = np.where(in_r, x[np.minimum(nv, no - 1)], nxv)
            rtim = np.where(in_r, tso[np.minimum(nv, no - 1)].astype(np.float64), nxt)
            # a null-ts row keeps its own value but is never filled (no
            # position on the time axis — plain-variant contract)
            gap = np.isnan(x) & ~null_own & ~np.isnan(lval) & ~np.isnan(rval)
            outv = x.copy()
            if gap.any():
                dt = rtim[gap] - ltim[gap]
                frac = np.where(
                    dt > 0, (tso[gap].astype(np.float64) - ltim[gap]) / np.maximum(dt, 1.0), 0.0
                )
                outv[gap] = lval[gap] + (rval[gap] - lval[gap]) * frac
            cols[f"{c}_interp"] = pa.array(outv, pa.float64(), from_pandas=True)
        for c, k in rolling.items():
            xe = ext_of(c)
            validE = ~np.isnan(xe)
            cs = np.concatenate(([0.0], np.cumsum(np.where(validE, xe, 0.0))))
            cc = np.concatenate(([0], np.cumsum(validE.astype(np.int64))))
            lo = np.maximum(e_start_of, epos - k + 1)
            sums = cs[epos + 1] - cs[lo]
            cnts = cc[epos + 1] - cc[lo]
            full = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
            cols[f"{c}_rollmean_{k}"] = pa.array(full[tgt_own], pa.float64(), from_pandas=True)
        if rolling_time_us:
            # time-window domain: ctx rows ++ own rows of each bucket (ctx ts
            # are strictly below the bucket's own ts range, so a plain ts sort
            # already interleaves them correctly)
            d_idx = np.flatnonzero(side == 1)
            td = tsv[d_idx]
            dseg = seg_id[d_idx]
            nd = len(d_idx)
            d_first = np.concatenate(([0], np.flatnonzero(np.diff(dseg)) + 1))
            d_sizes = np.diff(np.concatenate((d_first, [nd])))
            d_start_of = np.repeat(d_first, d_sizes)
            own_sub = ctxf[d_idx] == 0
            # per-run monotone key: normalized ts + run_id * stride lets ONE
            # global searchsorted answer every run's window bounds at once
            run_min = td[d_first]
            base_of = np.repeat(run_min, d_sizes)
            span_max = int((td[d_first + d_sizes - 1] - run_min).max())
            stride = span_max + max_w + 2
            if len(d_first) * stride < 2**62:
                run_id_of = np.repeat(np.arange(len(d_first)), d_sizes)
                keyv = (td - base_of) + run_id_of * stride
                key_own = keyv[own_sub]
                lo_all = {}
                for w_ in set(rolling_time_us.values()):
                    lo = np.searchsorted(keyv, key_own - w_, side="left")
                    lo_all[w_] = np.maximum(lo, d_start_of[own_sub])
                hi = np.searchsorted(keyv, key_own, side="right")
            else:  # pathological span: per-run searchsorted fallback
                lo_all = {w_: np.empty(no, np.int64) for w_ in set(rolling_time_us.values())}
                hi = np.empty(no, np.int64)
                oi = 0
                for r in range(len(d_first)):
                    sl = slice(d_first[r], d_first[r] + d_sizes[r])
                    tds = td[sl]
                    osl = own_sub[sl]
                    q = tds[osl]
                    cnt = int(osl.sum())
                    for w_ in lo_all:
                        lo_all[w_][oi:oi + cnt] = d_first[r] + np.searchsorted(tds, q - w_, side="left")
                    hi[oi:oi + cnt] = d_first[r] + np.searchsorted(tds, q, side="right")
                    oi += cnt
            for c, w_ in rolling_time_us.items():
                xd = _f64(t.column(c))[d_idx]
                valid = ~np.isnan(xd)
                cs = np.concatenate(([0.0], np.cumsum(np.where(valid, xd, 0.0))))
                cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
                sums = cs[hi] - cs[lo_all[w_]]
                cnts = cc[hi] - cc[lo_all[w_]]
                cols[f"{c}_rollmean_t{w_}"] = pa.array(
                    np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan),
                    pa.float64(), from_pandas=True)
        if session_gap_us is not None:
            carry = st_num("__sess_carry")[o_seg]
            carry = np.where(np.isnan(carry), 0.0, carry)
            plt = st_num("__prev_last_ts")[o_seg]
            prev_ts = np.where(opos == o_start_of, plt, tso[np.maximum(opos - 1, 0)].astype(np.float64))
            new_start = (tso.astype(np.float64) - prev_ts) > session_gap_us
            new_start &= ~np.isnan(prev_ts)  # first bucket of a key: no carry gap
            # a null-ts row never PROVES a gap (SQL NULL comparison) — it
            # extends the open session; same guard as the plain variant
            new_start &= ~null_own
            inc = np.cumsum(new_start.astype(np.int64))
            local = inc - np.repeat(inc[o_first] - new_start[o_first].astype(np.int64), o_sizes)
            cols["session_id"] = pa.array(
                (carry + local).astype(np.int64), pa.int64()
            )
        return pa.table(cols, schema=out_schema)

    return coarse_partitioned(unioned, "__kb", compute_part)


def grouped_rank(
    ds: ray.data.Dataset,
    key: str,
    sort_keys: list[str],
    descending: bool | list[bool] = False,
    n_tiles: int | None = None,
    tie_aware: bool = False,
) -> ray.data.Dataset:
    """Per-group rank features over the group's ``sort_keys`` order — exact
    SQL window semantics, so DuckDB replays them bit-for-bit. One groupby
    shuffle; ranks are computed vectorized over each sorted group.

    Default outputs: ``row_number`` (1-based), ``percent_rank`` and optional
    ``ntile`` (remainder rows fill the leading buckets) — these require
    ``sort_keys`` to be a TOTAL order (add a tiebreak column).
    ``tie_aware=True`` instead emits ``rank``/``dense_rank``/``cume_dist``
    where rows with equal sort keys share a rank (and the cumulative
    distribution of their run's last row) — deterministic even WITH ties,
    matching SQL RANK()/DENSE_RANK()/CUME_DIST()."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    ds, schema = arrow_schema_of(ds)
    out_fields = [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    if tie_aware:
        out_fields += [pa.field("rank", pa.int64()), pa.field("dense_rank", pa.int64()),
                       pa.field("cume_dist", pa.float64())]
    else:
        out_fields += [pa.field("row_number", pa.int64()),
                       pa.field("percent_rank", pa.float64())]
        if n_tiles is not None:
            out_fields.append(pa.field("ntile", pa.int64()))
    out_schema = pa.schema(out_fields)
    order = [(c, "descending" if d else "ascending") for c, d in zip(sort_keys, descending)]

    def _adjacent_neq(arr: pa.Array, n: int) -> np.ndarray:
        if pa.types.is_null(arr.type):
            # an all-null column (one partition's slice can surface as the
            # Arrow null TYPE) is one value run: no boundaries
            return np.zeros(n - 1, dtype=bool)
        a, b = arr.slice(1), arr.slice(0, n - 1)
        neq = pa.compute.fill_null(
            pa.compute.invert(pa.compute.equal(a, b)), True,
        )
        # SQL window semantics: NULL keys form ONE partition and NULL sort
        # values tie — adjacent null-vs-null must NOT be a boundary (the
        # plain equal() kernel yields null there, which fill_null(True)
        # would wrongly split)
        both_null = pa.compute.and_(pa.compute.is_null(a),
                                    pa.compute.is_null(b))
        neq = pa.compute.and_(neq, pa.compute.invert(both_null))
        return np.asarray(neq.to_numpy(zero_copy_only=False), dtype=bool)

    def vector_part(t: pa.Table) -> pa.Table:
        # one vectorized pass per coarse partition: sort (key, sort_keys),
        # rank every key run at once — per-group dispatch would cost ~0.2 ms
        # x (distinct keys), which dominates at real entity cardinality
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        t = t.take(pa.compute.sort_indices(t, sort_keys=[(key, "ascending")] + order))
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        new_key[1:] |= _adjacent_neq(t.column(key).combine_chunks(), n)
        kstarts = np.flatnonzero(new_key)
        ksizes = np.diff(np.append(kstarts, n))
        kstart_of = np.repeat(kstarts, ksizes)
        ksize_of = np.repeat(ksizes, ksizes)
        pos = np.arange(n, dtype=np.int64)
        r = pos - kstart_of
        cols = {name: t.column(name) for name in t.column_names}
        if tie_aware:
            new_tie = new_key.copy()
            for c in sort_keys:
                new_tie[1:] |= _adjacent_neq(t.column(c).combine_chunks(), n)
            tstarts = np.flatnonzero(new_tie)
            trun = np.cumsum(new_tie) - 1
            cols["rank"] = pa.array(tstarts[trun] - kstart_of + 1, pa.int64())
            cols["dense_rank"] = pa.array(trun - trun[kstart_of] + 1, pa.int64())
            # CUME_DIST: peers share the position of their run's LAST row
            tends = np.append(tstarts[1:], n) - 1
            cols["cume_dist"] = pa.array(
                (tends[trun] - kstart_of + 1) / ksize_of, pa.float64())
            return pa.table(cols, schema=out_schema)
        cols["row_number"] = pa.array(r + 1, pa.int64())
        cols["percent_rank"] = pa.array(
            np.where(ksize_of > 1, r / np.maximum(ksize_of - 1, 1), 0.0), pa.float64()
        )
        if n_tiles is not None:
            small = ksize_of // n_tiles
            big = ksize_of % n_tiles
            thr = big * (small + 1)
            # fewer rows than tiles: one row per leading bucket
            tile = np.where(
                small == 0,
                r,
                np.where(
                    r < thr,
                    r // np.maximum(small + 1, 1),
                    big + (r - thr) // np.maximum(small, 1),
                ),
            )
            cols["ntile"] = pa.array(tile + 1, pa.int64())
        return pa.table(cols, schema=out_schema)

    return coarse_partitioned(ds, key, vector_part)


def global_rank(
    ds: ray.data.Dataset,
    sort_keys: list[str],
    descending: bool | list[bool] = False,
    n_tiles: int | None = None,
) -> ray.data.Dataset:
    """GLOBAL (un-partitioned) rank features over a TOTAL order across the
    whole dataset: ``row_number`` (1-based), ``percent_rank`` and optional
    ``ntile`` — exact SQL ``ROW_NUMBER()/PERCENT_RANK()/NTILE(k) OVER
    (ORDER BY ...)`` semantics (NTILE's remainder rows fill the leading
    buckets). ``sort_keys`` must be a total order (add a tiebreak column),
    the same contract as :func:`grouped_rank`'s non-tie-aware mode.

    Scale shape: ONE range-partitioned sort (Ray Data's native shuffle) is
    the only data movement. Global offsets come from an O(#blocks) metadata
    pass — a tiny remote count per sorted block, prefix-summed on the
    driver, which therefore holds one integer per BLOCK, never per row —
    and a second per-block vectorized pass adds ``offset + arange(rows)``.
    Row data never touches the driver, and the output stays globally
    sorted (this is also the engine's distributed total-sort surface).
    """
    import ray as _ray

    if isinstance(descending, bool):
        descending = [descending] * len(sort_keys)
    ds, schema = arrow_schema_of(ds)
    out_fields = [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    out_fields += [pa.field("row_number", pa.int64()),
                   pa.field("percent_rank", pa.float64())]
    if n_tiles is not None:
        out_fields.append(pa.field("ntile", pa.int64()))
    out_schema = pa.schema(out_fields)

    refs = ds.sort(sort_keys, descending=descending).to_arrow_refs()

    @_ray.remote(num_cpus=0.25)
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = np.asarray(_ray.get([_nrows.remote(r) for r in refs]), dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])])

    @_ray.remote
    def _rank_block(t: pa.Table, off: int) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        rn = off + 1 + np.arange(n, dtype=np.int64)
        cols = {name: t.column(name) for name in t.column_names}
        cols["row_number"] = pa.array(rn, pa.int64())
        pr = (rn - 1) / (total - 1) if total > 1 else np.zeros(n, dtype=np.float64)
        cols["percent_rank"] = pa.array(pr, pa.float64())
        if n_tiles is not None:
            small, big = total // n_tiles, total % n_tiles
            thr = big * (small + 1)
            r = rn - 1
            # fewer rows than tiles: one row per leading bucket
            tile = np.where(
                small == 0,
                r,
                np.where(r < thr, r // max(small + 1, 1),
                         big + (r - thr) // max(small, 1)),
            )
            cols["ntile"] = pa.array(tile + 1, pa.int64())
        return pa.table(cols, schema=out_schema)

    out_refs = [_rank_block.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


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

    def vector_part(t: pa.Table) -> pa.Table:
        # one vectorized segment scan per coarse partition: session ids are
        # exact segment-local integer cumsums, session-length filters run on
        # (key, session) run boundaries — no per-entity dispatch
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        from .util import null_safe_group_codes

        # SQL null semantics (same contract as window_features): NULL keys
        # form one partition, NULL ts sorts LAST, and a null-ts event can
        # never PROVE a gap — it extends the open session
        g, _, _ = null_safe_group_codes(t.column(key))
        ts_arr = t.column(ts).combine_chunks()
        ts_null = ts_arr.is_null().to_numpy(zero_copy_only=False)
        tsv = _ts_i64(ts_arr)
        if ts_null.any():
            tsv = tsv.copy()
            tsv[ts_null] = np.iinfo(np.int64).max
        order = np.lexsort((tsv, g))
        t = t.take(pa.array(order, pa.int64()))
        g = g[order]
        tsv = tsv[order]
        ts_null = ts_null[order]
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        seg_start_of = np.repeat(seg_first, seg_sizes)
        gaps = np.diff(tsv, prepend=tsv[0] if n else 0)
        new_sess = (gaps > gap_us) & (pos != seg_start_of) & ~ts_null
        inc = np.cumsum(new_sess.astype(np.int64))
        sess = inc - inc[seg_start_of]
        out = t.append_column("session_id", pa.array(sess, pa.int64()))
        if min_events > 1 or min_duration_us > 0:
            run_start = new_sess | (pos == seg_start_of)
            starts = np.flatnonzero(run_start)
            counts = np.diff(np.append(starts, n))
            ends = starts + counts - 1
            if ts_null.any():
                # duration reads only valid timestamps (SQL MAX/MIN skip
                # NULL; trailing null-ts rows don't stretch the session,
                # and INT64_MAX sentinels must not overflow the subtract)
                lv = np.maximum.accumulate(np.where(~ts_null, pos, -1))
                last_valid = lv[ends]
                durs = np.where(last_valid >= starts,
                                tsv[np.maximum(last_valid, 0)] - tsv[starts], 0)
            else:
                durs = tsv[ends] - tsv[starts]
            ok_runs = (counts >= min_events) & (durs >= min_duration_us)
            keep = np.repeat(ok_runs, counts)
            if not keep.all():
                out = out.filter(pa.array(keep))
        return out.cast(out_schema)

    return coarse_partitioned(ds, key, vector_part)


def time_bucket(
    ds: ray.data.Dataset, ts: str, width_us: int, origin_us: int = 0, out_col: str = "bucket"
) -> ray.data.Dataset:
    """Stateless projection: integer bucket index of ``ts`` (floor division).
    Compose with groupby for segment/binned stats (A8)."""

    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        # SQL NULL arithmetic: epoch(NULL) // w IS NULL — one NULL bucket
        arr = t.column(ts).combine_chunks()
        b = (_ts_i64_bucketed(arr) - origin_us) // width_us
        out = pc.if_else(pc.is_valid(arr), pa.array(b, pa.int64()),
                         pa.scalar(None, pa.int64()))
        return t.append_column(out_col, out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def resample_grid(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    value_cols: list[str],
    every_us: int,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-entity regular-grid resampling with as-of forward-fill — the
    irregular-events → fixed-interval-features step of a PIT pipeline
    (reference analog: the hop-grid frame timeline the extractor emits,
    `04_feature_extraction_experiment/.../feature_extractor.py`).

    Grid points are epoch-aligned multiples of ``every_us`` in
    ``[ceil(min_ts), max_ts]`` per entity; each carries ``{c}_ffill`` = the
    last observation at-or-before it (never null by construction, since the
    grid starts after the first event). One entity-hash shuffle co-locates
    each entity, then one vectorized pass builds every entity's grid at once
    (repeat/arange, no per-point Python) and a per-segment ``searchsorted``
    maps grid → source row. Grid size is data-bounded: span/every per
    entity; callers pick ``every_us`` so grid rows ≈ O(events).
    """

    def vector_block(block: pa.Table) -> pa.Table:
        out_fields = [
            pa.field(key, block.schema.field(key).type),
            pa.field(ts, pa.timestamp("us")),
        ] + [pa.field(f"{c}_ffill", pa.float64()) for c in value_cols]
        out_schema = pa.schema(out_fields)
        # a null-ts event has no position on the grid axis and can't anchor
        # or fill a grid point (the ASOF oracle never matches it either) —
        # drop those rows before computing per-entity spans; an entity with
        # ONLY null-ts events gets no grid (SQL MIN(ts) IS NULL → empty
        # generate_series)
        ts_ok = block.column(ts).combine_chunks().is_valid() \
            .to_numpy(zero_copy_only=False)
        if not ts_ok.all():
            block = block.filter(pa.array(ts_ok))
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        from .util import null_safe_group_codes

        # NULL entity keys form one grid segment (SQL GROUP BY); their fill
        # values are nulled below (an as-of against a NULL key is a miss)
        g, _, _ = null_safe_group_codes(block.column(key))
        tsv_all = _ts_i64(block.column(ts))
        order = np.lexsort((tsv_all, g))
        block = block.take(pa.array(order, pa.int64()))
        tsv = tsv_all[order]
        g = g[order]
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_last = np.concatenate((seg_first[1:] - 1, [n - 1]))
        t0 = tsv[seg_first]
        t1 = tsv[seg_last]
        g0 = -(-t0 // every_us)  # ceil to grid
        g1 = t1 // every_us  # floor to grid
        counts = np.maximum(g1 - g0 + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        seg_of = np.repeat(np.arange(len(seg_first)), counts)
        # within-segment 0..count-1 via global arange minus segment offsets
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        local = np.arange(total) - offs[seg_of]
        grid_ts = (g0[seg_of] + local) * every_us
        # per-segment as-of: index of last source row with ts <= grid point
        src = np.empty(total, dtype=np.int64)
        for si, (st, en) in enumerate(zip(seg_first, seg_last)):
            sl = slice(offs[si], offs[si] + counts[si])
            src[sl] = st + np.searchsorted(
                tsv[st:en + 1], grid_ts[sl], side="right") - 1
        cols: dict[str, object] = {
            key: block.column(key).take(pa.array(seg_first[seg_of], pa.int64())),
            ts: pa.array(grid_ts, pa.timestamp("us")),
        }
        # the NULL-key segment keeps its grid but fills NULL — an as-of
        # against a NULL entity key is a miss (engine-wide join contract)
        key_null = block.column(key).combine_chunks().is_null() \
            .to_numpy(zero_copy_only=False)
        grid_null = key_null[seg_first[seg_of]]
        for c in value_cols:
            x = _f64(block.column(c))
            cols[f"{c}_ffill"] = pa.array(
                np.where(grid_null, np.nan, x[src]), pa.float64(),
                from_pandas=True)
        return pa.table(cols, schema=out_schema)

    return coarse_partitioned(ds.select_columns([key, ts] + value_cols),
                              key, vector_block, n_partitions=n_partitions)


def rolling_order_stats(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    col: str,
    k: int,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Trailing k-row order statistics per entity: ``{col}_rollmedian_k`` /
    ``_rollmin_k`` / ``_rollmax_k`` over ``ROWS k-1 PRECEDING .. CURRENT``
    — the robust (outlier-insensitive) sibling of the rolling means in
    :func:`window_features` (reference analog: the median smoother,
    `04_feature_extraction_experiment/.../preprocessor.py` medfilt).

    One entity-hash shuffle, then one vectorized pass per block: each
    segment materializes its (rows, k) trailing-index matrix (clipped head
    windows = smaller SQL frames), nan-masked, and reduces with
    ``nanmedian``/``fmin``/``fmax`` — O(rows·k) work, no per-row Python.
    """

    def vector_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        med_f = pa.field(f"{col}_rollmedian_{k}", pa.float64())
        min_f = pa.field(f"{col}_rollmin_{k}", pa.float64())
        max_f = pa.field(f"{col}_rollmax_{k}", pa.float64())
        out_schema = pa.schema(
            [block.schema.field(i) for i in range(block.num_columns)]
            + [med_f, min_f, max_f]
        )
        if n == 0:
            return out_schema.empty_table()
        # null-safe prologue: NULL keys one segment, NULL ts sorts last
        # (nanmedian/fmin/fmax already skip NULL VALUES like SQL)
        block, g, _, _ = _sorted_entity_block(block, key, ts)
        x = _f64(block.column(col))
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_start_of = np.repeat(seg_first, np.diff(np.concatenate((seg_first, [n]))))
        # (n, k) trailing window indices, clipped to the segment start
        idx = pos[:, None] - np.arange(k - 1, -1, -1)[None, :]
        valid = idx >= seg_start_of[:, None]
        w = np.where(valid, x[np.maximum(idx, 0)], np.nan)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-nan windows
            med = np.nanmedian(w, axis=1)
        mn = np.fmin.reduce(w, axis=1)
        mx = np.fmax.reduce(w, axis=1)
        block = block.append_column(med_f, pa.array(med, pa.float64(), from_pandas=True))
        block = block.append_column(min_f, pa.array(mn, pa.float64(), from_pandas=True))
        block = block.append_column(max_f, pa.array(mx, pa.float64(), from_pandas=True))
        return block

    return coarse_partitioned(ds, key, vector_block,
                              n_partitions=n_partitions)




def rolling_corr(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    x: str,
    y: str,
    k: int,
    out: str | None = None,
    tiebreak: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Trailing k-row Pearson correlation between two columns per entity
    (``ROWS k-1 PRECEDING .. CURRENT``) — the local trend-strength / signal
    co-movement feature of a PIT pipeline (with ``x`` = the timestamp the
    window becomes "how linear is the recent trajectory"). SQL equivalent:
    ``corr(y, x) OVER (PARTITION BY key ORDER BY ts ROWS ...)``.

    Pass ``x=ts`` to correlate against the (int64 epoch) timestamp itself.
    Semantics match DuckDB/ANSI ``corr``: rows where either side is NULL are
    excluded pairwise; windows with <2 valid pairs or zero variance on
    either side yield NULL. One entity-hash shuffle, then one vectorized
    pass per block: the (rows, k) trailing-index matrix is masked and
    reduced with nan-aware sums after per-window centering (numerically
    stable), O(rows*k) with no per-row Python — the same shape as
    :func:`rolling_order_stats`.
    """
    import warnings

    out = out or f"{x}_{y}_rollcorr_{k}"

    def vector_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        out_f = pa.field(out, pa.float64())
        out_schema = pa.schema(
            [block.schema.field(i) for i in range(block.num_columns)] + [out_f]
        )
        if n == 0:
            return out_schema.empty_table()
        # null-safe prologue; with x == ts a NULL timestamp is a NULL x —
        # the pair drops like any SQL corr/regr NULL, and the INT64_MAX
        # ordering sentinel never leaks into the arithmetic
        block, g, tsv, ts_null = _sorted_entity_block(block, key, ts, tiebreak)
        if x == ts:
            xv = tsv.astype(np.float64)
            xv[ts_null] = np.nan
        else:
            xv = _f64(block.column(x))
        yv = _f64(block.column(y))
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_start_of = np.repeat(seg_first, np.diff(np.concatenate((seg_first, [n]))))
        idx = pos[:, None] - np.arange(k - 1, -1, -1)[None, :]
        valid = idx >= seg_start_of[:, None]
        wx = np.where(valid, xv[np.maximum(idx, 0)], np.nan)
        wy = np.where(valid, yv[np.maximum(idx, 0)], np.nan)
        # pairwise-complete: a NaN on either side drops the pair from both
        pair = ~(np.isnan(wx) | np.isnan(wy))
        wx = np.where(pair, wx, np.nan)
        wy = np.where(pair, wy, np.nan)
        m = pair.sum(axis=1).astype(np.float64)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # empty windows
            mx = np.nansum(wx, axis=1) / np.where(m > 0, m, np.nan)
            my = np.nansum(wy, axis=1) / np.where(m > 0, m, np.nan)
            dx = wx - mx[:, None]
            dy = wy - my[:, None]
            num = np.nansum(dx * dy, axis=1)
            sx = np.nansum(dx * dx, axis=1)
            sy = np.nansum(dy * dy, axis=1)
            den = np.sqrt(sx * sy)
            c = np.where((m >= 2) & (den > 0), num / np.where(den > 0, den, 1.0), np.nan)
        return block.append_column(out_f, pa.array(c, pa.float64(), from_pandas=True))

    return coarse_partitioned(ds, key, vector_block,
                              n_partitions=n_partitions)


def rolling_regression(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    x: str,
    y: str,
    k: int,
    slope_out: str = "slope",
    intercept_out: str = "intercept",
    tiebreak: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Trailing k-row OLS regression of ``y`` on ``x`` per entity — the
    local-trend feature pair (slope = recent drift rate, intercept = the
    detrended level). With ``x=ts`` the slope is the entity's recent rate
    of change per microsecond. SQL equivalent:
    ``REGR_SLOPE(y, x) OVER (PARTITION BY key ORDER BY ts ROWS ...)`` /
    ``REGR_INTERCEPT``.

    Same one-shuffle masked (rows, k) matrix pass as
    :func:`rolling_corr`; pairwise-complete NULL semantics (NULL when <2
    valid pairs or x has zero variance in the window).
    """
    import warnings

    def vector_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        fields = [block.schema.field(i) for i in range(block.num_columns)]
        out_schema = pa.schema(fields + [pa.field(slope_out, pa.float64()),
                                         pa.field(intercept_out, pa.float64())])
        if n == 0:
            return out_schema.empty_table()
        # null-safe prologue; with x == ts a NULL timestamp is a NULL x —
        # the pair drops like any SQL corr/regr NULL, and the INT64_MAX
        # ordering sentinel never leaks into the arithmetic
        block, g, tsv, ts_null = _sorted_entity_block(block, key, ts, tiebreak)
        if x == ts:
            xv = tsv.astype(np.float64)
            xv[ts_null] = np.nan
        else:
            xv = _f64(block.column(x))
        yv = _f64(block.column(y))
        pos = np.arange(n)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_start_of = np.repeat(seg_first, np.diff(np.concatenate((seg_first, [n]))))
        idx = pos[:, None] - np.arange(k - 1, -1, -1)[None, :]
        valid = idx >= seg_start_of[:, None]
        wx = np.where(valid, xv[np.maximum(idx, 0)], np.nan)
        wy = np.where(valid, yv[np.maximum(idx, 0)], np.nan)
        pair = ~(np.isnan(wx) | np.isnan(wy))
        wx = np.where(pair, wx, np.nan)
        wy = np.where(pair, wy, np.nan)
        m = pair.sum(axis=1).astype(np.float64)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # empty windows
            mx = np.nansum(wx, axis=1) / np.where(m > 0, m, np.nan)
            my = np.nansum(wy, axis=1) / np.where(m > 0, m, np.nan)
            dx = wx - mx[:, None]
            dy = wy - my[:, None]
            cov = np.nansum(dx * dy, axis=1)
            sx = np.nansum(dx * dx, axis=1)
            ok = (m >= 2) & (sx > 0)
            slope = np.where(ok, cov / np.where(sx > 0, sx, 1.0), np.nan)
            intercept = np.where(ok, my - slope * mx, np.nan)
        return block.append_column(
            pa.field(slope_out, pa.float64()),
            pa.array(slope, pa.float64(), from_pandas=True),
        ).append_column(
            pa.field(intercept_out, pa.float64()),
            pa.array(intercept, pa.float64(), from_pandas=True),
        )

    return coarse_partitioned(ds, key, vector_block,
                              n_partitions=n_partitions)


def ewma(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    col: str,
    alpha: float,
    tiebreak: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-entity exponentially weighted moving average, recursive
    semantics (``y_0 = x_0``, ``y_i = a·x_i + (1-a)·y_{i-1}``, pandas
    ``adjust=False``) — the decayed-trend feature of a PIT pipeline.

    One entity-hash shuffle, then each segment evaluates the recursion in
    fixed-size CHUNKS: within a chunk the closed form
    ``y_i = (1-a)^{i+1}·y_prev + a·Σ(1-a)^{i-j}·x_j`` runs as one
    vectorized dot against a precomputed lower-triangular decay kernel
    (all exponents in [0, chunk], so no overflow/precision blowup for long
    series), and only the chunk boundary carries sequentially —
    O(rows/chunk) Python steps instead of O(rows). Nulls carry the
    previous EWMA unchanged; leading nulls stay null.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    chunk = 64
    # lower-triangular decay kernel: T[j, i] = (1-a)^(j-i) for i <= j, and
    # p[j] = (1-a)^(j+1) — all exponents >= 0, stable for any alpha
    j = np.arange(chunk)
    T = np.tril((1.0 - alpha) ** np.maximum(j[:, None] - j[None, :], 0))
    T[np.triu_indices(chunk, 1)] = 0.0
    p = (1.0 - alpha) ** (j + 1)

    def seg_ewma(x: np.ndarray) -> np.ndarray:
        n = len(x)
        out = np.full(n, np.nan)
        vidx = np.flatnonzero(~np.isnan(x))
        if len(vidx) == 0:
            return out
        v = x[vidx]
        yv = np.empty(len(v))
        # y_0 = v_0 exactly == running the uniform recursion with y_{-1} = v_0
        prev = v[0]
        for st in range(0, len(v), chunk):
            vs = v[st:st + chunk]
            m = len(vs)
            y = alpha * (T[:m, :m] @ vs) + p[:m] * prev
            yv[st:st + m] = y
            prev = y[-1]
        out[vidx] = yv
        # nulls carry the previous EWMA unchanged
        pos = np.arange(n)
        lv = np.maximum.accumulate(np.where(~np.isnan(out), pos, -1))
        ok = lv >= 0
        out[ok] = out[lv[ok]]
        return out

    def vector_block(block: pa.Table) -> pa.Table:
        out_field = pa.field(f"{col}_ewma", pa.float64())
        out_schema = pa.schema(
            [block.schema.field(i) for i in range(block.num_columns)] + [out_field]
        )
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        # null-safe prologue: NULL keys one segment, NULL ts sorts last —
        # a null-ts row is just the timeline's tail (its value still enters
        # the recursion; order among null-ts peers pinned by `tiebreak`)
        block, g, _, _ = _sorted_entity_block(block, key, ts, tiebreak)
        x = _f64(block.column(col))
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        out = np.empty(n)
        for st, size in zip(seg_first, seg_sizes):
            out[st:st + size] = seg_ewma(x[st:st + size])
        return block.append_column(out_field, pa.array(out, pa.float64(), from_pandas=True))

    return coarse_partitioned(ds, key, vector_block,
                              n_partitions=n_partitions)


def add_calendar_columns(
    ds: ray.data.Dataset,
    ts: str,
    parts: tuple[str, ...] = ("year", "month", "isodow", "hour"),
) -> ray.data.Dataset:
    """Stateless calendar-feature projection: ISO weekday / hour-of-day /
    month / year (+ ``is_weekend``) columns from a timestamp — the cyclical
    feature encoding every trained-on-time model needs (reference analog:
    the session/date components parsed out of filenames,
    04_feature_extraction_experiment/feature_extraction_for_student.py).

    Pure ``pyarrow.compute`` temporal kernels per batch — zero-copy Arrow
    in/out, no Python per row, trivially parallel at any scale.
    """
    import pyarrow.compute as pc

    known = {"year", "month", "isodow", "hour", "is_weekend"}
    bad = set(parts) - known
    if bad:
        raise ValueError(f"unknown calendar parts {sorted(bad)}; choose from {sorted(known)}")

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(ts)
        if "year" in parts:
            t = t.append_column("year", pc.cast(pc.year(col), pa.int64()))
        if "month" in parts:
            t = t.append_column("month", pc.cast(pc.month(col), pa.int64()))
        if "isodow" in parts or "is_weekend" in parts:
            # ISO numbering: 1 = Monday … 7 = Sunday (DuckDB isodow())
            dow = pc.cast(pc.day_of_week(col, count_from_zero=False, week_start=1),
                          pa.int64())
            if "isodow" in parts:
                t = t.append_column("isodow", dow)
            if "is_weekend" in parts:
                t = t.append_column("is_weekend", pc.greater_equal(dow, 6))
        if "hour" in parts:
            t = t.append_column("hour", pc.cast(pc.hour(col), pa.int64()))
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def transition_counts(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    state_col: str,
    tiebreak: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-entity state-transition (Markov) counts: how often state A is
    immediately followed by state B within an entity's timeline — the
    sequence feature behind next-action models (reference analog: the
    frame-to-frame continuity deltas, SURVEY §2.4 Q3).

    One entity-hash shuffle co-locates entities; each partition lexsorts
    once and reads the next state per row via a segment-bounded shift on
    dictionary codes (no per-row Python), emitting in-block (state, next)
    partial counts. The final exchange moves only (state-pair, count)
    partials — bounded by |states|², never rows.
    """
    from .aggregates import grouped_agg_fast

    def vector_block(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(state_col, block.schema.field(state_col).type),
            pa.field("next_" + state_col, block.schema.field(state_col).type),
        ])
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        # null-safe prologue: NULL keys one segment, NULL ts orders last
        # (a null-ts event is the sequence tail, same as the SQL LEAD)
        block, g, _, _ = _sorted_entity_block(block, key, ts, tiebreak)
        # next row belongs to the same entity ⇔ not the last row of its segment
        same = np.empty(n, dtype=bool)
        same[:-1] = g[:-1] == g[1:]
        same[-1] = False
        cur = np.flatnonzero(same)
        states = block.column(state_col).combine_chunks()
        return pa.table({
            state_col: states.take(pa.array(cur, pa.int64())),
            "next_" + state_col: states.take(pa.array(cur + 1, pa.int64())),
        }, schema=out_schema)

    pairs = coarse_partitioned(ds, key, vector_block,
                               n_partitions=n_partitions)
    return grouped_agg_fast(pairs, keys=[state_col, "next_" + state_col],
                            specs=[], count_alias="n")


def time_weighted_avg(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    col: str,
    tiebreak: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-entity time-weighted average (trapezoidal): irregular samples
    weighted by how long they were 'in effect' — Σ((vᵢ+vᵢ₊₁)/2·Δtᵢ)/Σ Δtᵢ.
    The canonical feature-store aggregate for irregular telemetry (a plain
    mean over-weights bursts). Entities with < 2 events are ABSENT (no
    trapezoid exists — SQL `WHERE dt IS NOT NULL` semantics); zero total
    span → NULL.

    With duplicate (key, ts) rows the trapezoid pairing depends on which
    duplicate sorts first — pass ``tiebreak`` (a numeric column) to pin
    that order deterministically, mirroring the oracle's
    ``ORDER BY ts, tiebreak`` (same contract as :func:`value_runs` /
    :func:`transition_counts`).

    One entity-hash shuffle; each partition computes every entity's
    trapezoid sum in one vectorized pass (segment-bounded shifted arrays),
    then per-entity (num, den) partials combine map-side.
    """
    from .aggregates import grouped_agg_fast

    def vector_block(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(key, block.schema.field(key).type),
            pa.field("__num", pa.float64()),
            pa.field("__den", pa.float64()),
        ])
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block, g, tsv, ts_null = _sorted_entity_block(block, key, ts, tiebreak)
        x = _f64(block.column(col))
        same = np.empty(n, dtype=bool)
        same[:-1] = g[:-1] == g[1:]
        same[-1] = False
        if ts_null.any():
            # a trapezoid needs BOTH endpoints on the time axis: dt with a
            # NULL ts is NULL and drops from num AND den (oracle WHERE
            # dt IS NOT NULL) — also keeps the INT64_MAX sentinel out of dt
            same[:-1] &= ~ts_null[:-1] & ~ts_null[1:]
        i = np.flatnonzero(same)  # rows with an in-entity successor
        dt = (tsv[i + 1] - tsv[i]).astype(np.float64)
        num = (x[i] + x[i + 1]) * 0.5 * dt
        return pa.table({
            key: block.column(key).take(pa.array(i, pa.int64())),
            "__num": pa.array(num, pa.float64(), from_pandas=True),
            "__den": pa.array(dt, pa.float64()),
        }, schema=out_schema)

    traps = coarse_partitioned(ds, key, vector_block,
                               n_partitions=n_partitions)
    sums = grouped_agg_fast(traps, keys=[key],
                            specs=[("__num_s", "__num", "sum"), ("__den_s", "__den", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        num = t.column("__num_s").to_numpy(zero_copy_only=False)
        den = t.column("__den_s").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            twa = np.where(den > 0, num / den, np.nan)
        return pa.table({
            key: t.column(key),
            "twa": pa.array(twa, pa.float64(), from_pandas=True),
        })

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def value_runs(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    state_col: str,
    tiebreak: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Gaps-and-islands: collapse each entity's timeline into RUNS of equal
    ``state_col`` (one summary row per maximal consecutive run, with its
    1-based start position and length) — the classic sequence feature for
    'how long did the entity stay in state X' (reference analog: VAD's
    merge-adjacent-speech-segments pass, SURVEY §2.2 M9/M10).

    One entity-hash shuffle; each partition lexsorts once, finds run
    boundaries with two adjacent-compare lanes (entity change OR state
    change), and emits every run summary via reduceat-style offset math —
    no per-run Python."""

    def vector_block(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(key, block.schema.field(key).type),
            pa.field(state_col, block.schema.field(state_col).type),
            pa.field("run_start", pa.int64()),
            pa.field("n_run", pa.int64()),
        ])
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        from .util import null_safe_group_codes

        # null-safe prologue (NULL keys one segment, NULL ts last) + null-
        # safe STATE codes: NULL states form runs like any other value (SQL
        # rn - rt islands put all NULLs of a user in one window partition)
        block, g, _, _ = _sorted_entity_block(block, key, ts, tiebreak)
        s, _, _ = null_safe_group_codes(block.column(state_col))
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = g[1:] != g[:-1]
        new_run = new_key.copy()
        new_run[1:] |= s[1:] != s[:-1]
        rstarts = np.flatnonzero(new_run)
        rlens = np.diff(np.append(rstarts, n))
        kstarts = np.flatnonzero(new_key)
        # 1-based position of the run's first row within its entity
        kstart_of_run = kstarts[np.searchsorted(kstarts, rstarts, side="right") - 1]
        run_start = rstarts - kstart_of_run + 1
        take = pa.array(rstarts, pa.int64())
        return pa.table({
            key: block.column(key).take(take),
            state_col: block.column(state_col).take(take),
            "run_start": pa.array(run_start, pa.int64()),
            "n_run": pa.array(rlens.astype(np.int64), pa.int64()),
        }, schema=out_schema)

    cols = [key, ts, state_col] + ([tiebreak] if tiebreak else [])
    return coarse_partitioned(ds.select_columns(cols), key, vector_block,
                              n_partitions=n_partitions)
