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


def _ts_i64_nullsafe(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Like :func:`_ts_i64` but tolerates null entries (filled with 0 —
    callers only read positions that are non-null on their side)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.timestamp("us", tz=a.type.tz), safe=False).cast(pa.int64())
    a = a.fill_null(0)
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
        # build rows with a NULL timestamp cannot participate in an as-of
        # ordering (SQL ASOF JOIN right-side null exclusion) — the nullsafe
        # 0-fill downstream would otherwise make them matchable as epoch 0,
        # emitting value columns with a null matched_ts
        t = t.filter(pc.is_valid(t.column(right_ts)))
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

    # ONE vectorized segment scan per coarse hash partition instead of one
    # Python map_groups call per entity: per-group call overhead (~0.2 ms)
    # dominates at real entity cardinalities. Hash-partitioning the entity
    # key keeps timelines whole (every row of an entity lands in the same
    # partition); inside a partition, a lexsort + running build-index scan
    # matches EVERY probe of EVERY entity in one pass — semantics identical
    # to the per-entity searchsorted merge (inclusive ties, stable original
    # order among equal build timestamps, tolerance bounds).
    n_partitions = 64

    def add_part(t: pa.Table) -> pa.Table:
        import polars as _pl

        h = _pl.from_arrow(pa.table({"k": t.column(on)})).hash_rows(seed=17).to_numpy()
        return t.append_column("__part", pa.array((h % n_partitions).astype(np.int32)))

    def merge_part(part: pa.Table) -> pa.Table:
        part = part.combine_chunks()
        npart = part.num_rows
        if npart == 0:
            return out_schema.empty_table()
        from .util import null_safe_group_codes

        # null keys form ONE group via an explicit sentinel code (a null
        # dictionary index cast through float is undefined-behavior int64)
        g, _, _ = null_safe_group_codes(part.column(on))
        side = part.column(_SIDE).to_numpy(zero_copy_only=False)
        is_build = side == 0
        lts_all = _ts_i64_nullsafe(part.column(left_ts))
        rts_all = _ts_i64_nullsafe(part.column(_RTS))
        ts_u = np.where(is_build, rts_all, lts_all)
        orig = np.arange(npart)
        # at equal ts: backward match is inclusive → builds sort BEFORE
        # probes; forward likewise inclusive → probes BEFORE builds
        side_key = (1 - side) if fwd else side
        order = np.lexsort((orig, side_key, ts_u, g))
        g_s, build_s, orig_s = g[order], is_build[order], orig[order]
        # SQL ASOF semantics: a NULL entity key never matches — null-key
        # build rows must not be match candidates (all null keys encode to
        # ONE dictionary code, so a null probe would otherwise as-of match
        # a null build; the broadcast route and SQL both emit a miss)
        if part.column(on).null_count:
            key_valid = pc.is_valid(part.column(on)).to_numpy(zero_copy_only=False)
            build_m = build_s & key_valid[orig_s]
        else:
            key_valid = None
            build_m = build_s
        # a build row with a NULL timestamp is never a candidate (SQL ASOF:
        # probe_ts >= NULL is false); its nullsafe 0-fill would otherwise
        # sort to the segment front and win every backward match
        rts_valid = pc.is_valid(part.column(_RTS)).to_numpy(zero_copy_only=False)
        build_m = build_m & rts_valid[orig_s]
        pos = np.arange(npart)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g_s)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [npart])))
        seg_start_of = np.repeat(seg_first, seg_sizes)
        if fwd:
            seg_end_of = np.repeat(seg_first + seg_sizes - 1, seg_sizes)
            # nearest build at/after me: minimum build position in my suffix
            match_pos = np.minimum.accumulate(
                np.where(build_m, pos, npart)[::-1]
            )[::-1]
            has_match = match_pos <= seg_end_of
        else:
            match_pos = np.maximum.accumulate(np.where(build_m, pos, -1))
            has_match = match_pos >= seg_start_of
        probe_pos = np.flatnonzero(~build_s)
        n = len(probe_pos)
        if n == 0:
            return out_schema.empty_table()
        p_orig = orig_s[probe_pos]
        p_valid = has_match[probe_pos]
        # a probe with a NULL timestamp is unmatchable (its nullsafe 0-fill
        # would otherwise as-of match forward to the EARLIEST build row);
        # the probe row itself is still emitted with null match columns
        lts_valid = pc.is_valid(part.column(left_ts)) \
            .to_numpy(zero_copy_only=False)
        p_valid = p_valid & lts_valid[p_orig]
        if key_valid is not None:
            # null-key probes are misses (belt to the build_m exclusion)
            p_valid = p_valid & key_valid[p_orig]
        p_build_orig = orig_s[np.where(p_valid, match_pos[probe_pos], 0)]
        if tolerance_us is not None:
            m_rts = rts_all[p_build_orig]
            p_lts = lts_all[p_orig]
            gap = (m_rts - p_lts) if fwd else (p_lts - m_rts)
            p_valid = p_valid & (gap <= tolerance_us)
        take_probe = pa.array(p_orig, pa.int64())
        take_build = pa.array(
            np.where(p_valid, p_build_orig, 0).astype(np.int64), pa.int64()
        )
        validity = pa.array(p_valid)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            name: part.column(name).take(take_probe) for name, _ in left_cols
        }
        for c in value_cols:
            taken = part.column(_RPREFIX + c).take(take_build)
            cols[c + suffix] = pc.if_else(validity, taken, pa.nulls(n, rtypes[c]))
        taken_ts = part.column(_RTS).take(take_build)
        cols[matched_ts_col] = pc.if_else(validity, taken_ts, pa.nulls(n, rts_type))
        return pa.table(cols, schema=out_schema)

    return unioned.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(merge_part, batch_format="pyarrow")


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
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
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
    # caller-supplied schemas skip the ds.schema() probes — on a lazy
    # map_batches pipeline each probe costs a partial EXECUTION (executor +
    # actor-pool spin-up) before the real run starts
    if left_schema is not None:
        lschema = left_schema
    else:
        left, lschema = arrow_schema_of(left)
    if right_schema is not None:
        rschema = right_schema
    else:
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
        if ents.null_count:
            # a NULL entity key never as-of matches (SQL semantics; a None
            # in the per-entity loop would also crash pc.equal's null mask)
            ents = ents.drop_null()
        local = probes.filter(pc.is_in(probes.column(on), value_set=ents))
        n = local.num_rows
        if n == 0:
            return mid_schema.empty_table()
        # build rows with a NULL timestamp cannot be as-of matched (same
        # exclusion as the shuffle path; _ts_i64 would turn them into
        # garbage int64 ordering keys); null-key build rows likewise
        keep = pc.is_valid(block.column(right_ts))
        if block.column(on).null_count:
            keep = pc.and_(keep, pc.is_valid(block.column(on)))
        block = block.filter(keep)
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
            if len(rts) == 0:
                # every build row for this entity was excluded (null ts):
                # leave its probes unhandled — the driver miss path emits
                # their null rows
                continue
            order = np.argsort(rts, kind="stable")
            rts_sorted = rts[order]
            lts = _ts_i64_nullsafe(lt.column(left_ts))
            # a probe with a NULL timestamp is unmatchable (emitted with
            # null match columns) — same exclusion as the shuffle path
            lts_valid = pc.is_valid(lt.column(left_ts)) \
                .to_numpy(zero_copy_only=False)
            cols = {name: lt.column(name) for name, _ in left_cols}
            if fwd:
                idx = np.searchsorted(rts_sorted, lts, side="left")
                valid = (idx < len(rts_sorted)) & lts_valid
                idx_c = np.minimum(idx, len(rts_sorted) - 1)
                if tolerance_us is not None:
                    valid &= (rts_sorted[idx_c] - lts) <= tolerance_us
            else:
                idx = np.searchsorted(rts_sorted, lts, side="right") - 1
                valid = (idx >= 0) & lts_valid
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
        if not out_parts:
            return mid_schema.empty_table()
        return pa.concat_tables(out_parts)

    _mbatches = list(
        right.map_batches(
            merge_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    matched_t = pa.concat_tables(_mbatches) if _mbatches else mid_schema.empty_table()
    if matched_t.num_rows:
        # an entity's build rows may span blocks (skew-chunked sources split a
        # hot entity's timeline across tasks): every owning block then emits a
        # candidate row per probe, so keep the BEST per probe — backward: the
        # latest matched_ts; forward: the earliest; any match beats a null.
        # The reduce is over the probe-sized result (bounded by the broadcast
        # contract), never the build side.
        pidx = matched_t.column("__pidx").to_numpy(zero_copy_only=False)
        mts = _ts_i64_nullsafe(matched_t.column(matched_ts_col)).astype(np.float64)
        nullm = pc.is_null(matched_t.column(matched_ts_col)).to_numpy(zero_copy_only=False)
        rank = np.where(nullm, -np.inf, -mts if fwd else mts)
        order = np.lexsort((rank, pidx))  # per probe: best candidate last
        last_of_run = np.concatenate((pidx[order][1:] != pidx[order][:-1], [True]))
        matched_t = matched_t.take(pa.array(order[last_of_run], pa.int64()))
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
            # a NULL ts has no bucket: __b stays NULL, which nulls the
            # composite __kb below — the merge then treats the row exactly
            # like a null-key row (probe → miss, build → not a candidate;
            # the phase-C summary asof re-filters null __sb the same way)
            arr = t.column(ts_col).combine_chunks()
            b = _ts_i64_nullsafe(arr) // bucket_us
            b_arr = pc.if_else(pc.is_valid(arr), pa.array(b, pa.int64()),
                               pa.scalar(None, pa.int64()))
            return t.append_column("__b", b_arr)

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

    # ---- phases A+B FUSED into ONE (entity, bucket) shuffle: each group
    # emits its merged probe rows AND its one build-summary row (last build
    # row of the bucket) together, so the build side crosses the wire once —
    # the unfused form shuffled it twice (phase-A as-of + phase-B groupby;
    # measured 1.5x wall on the gate query, and a full extra all-to-all of
    # the build side at scale).
    lcols_types = list(zip(lschema.names, lschema.types))
    fused_fields = (
        [pa.field(n, t) for n, t in lcols_types]
        + [pa.field(c + suffix, rtypes[c]) for c in value_cols]
        + [pa.field(matched_ts_col, rts_type)]
        + [pa.field("__kind", pa.int8()), pa.field("__sb", pa.int64()),
           pa.field("__s_ts", rts_type)]
        + [pa.field("__s_" + c, rtypes[c]) for c in value_cols]
    )
    fused_schema = pa.schema(fused_fields)
    union_fields = (
        [(n, t) for n, t in lcols_types]
        + [("__rts", rts_type)]
        + [("__r_" + c, rtypes[c]) for c in value_cols]
        + [("__b", pa.int64()), ("__side", pa.int8()), ("__kb", pa.string())]
    )
    union_names = [n for n, _ in union_fields]

    def prep_l(t: pa.Table) -> pa.Table:
        out = {n: t.column(n) for n, _ in lcols_types}
        out["__rts"] = pa.nulls(t.num_rows, rts_type)
        for c in value_cols:
            out["__r_" + c] = pa.nulls(t.num_rows, rtypes[c])
        out["__b"] = t.column("__b")
        out["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        out["__kb"] = t.column("__kb")
        return pa.table({n: out[n] for n in union_names})

    def prep_r(t: pa.Table) -> pa.Table:
        out: dict = {}
        for n, typ in lcols_types:
            out[n] = t.column(on) if n == on else pa.nulls(t.num_rows, typ)
        out["__rts"] = t.column(right_ts)
        for c in value_cols:
            out["__r_" + c] = t.column(c)
        out["__b"] = t.column("__b")
        out["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        out["__kb"] = t.column("__kb")
        return pa.table({n: out[n] for n in union_names})

    unioned_ab = lbk.map_batches(prep_l, batch_format="pyarrow", zero_copy_batch=True) \
        .union(rbk.map_batches(prep_r, batch_format="pyarrow", zero_copy_batch=True))

    # coarse hash partitions instead of per-(entity, bucket) groups: a
    # map_groups over (entity, bucket) pays one Python call per group —
    # group cardinality is probe-scale, and the measured per-call overhead
    # dominates. Hashing __kb into a bounded partition count keeps the
    # bounded-memory property (a task holds ~1/n_partitions of the data,
    # never required to hold a whole hot entity) while the per-partition
    # merge runs as ONE vectorized segment scan over all its groups.
    n_partitions = 64

    def add_part(t: pa.Table) -> pa.Table:
        import polars as _pl

        h = _pl.from_arrow(
            pa.table({"k": t.column("__kb").cast(pa.large_string())})
        ).hash_rows(seed=13).to_numpy()
        return t.append_column(
            "__part", pa.array((h % n_partitions).astype(np.int32))
        )

    def merge_part(part: pa.Table) -> pa.Table:
        part = part.combine_chunks()
        npart = part.num_rows
        if npart == 0:
            return fused_schema.empty_table()
        from .util import null_safe_group_codes

        # null composite keys form ONE group via an explicit sentinel code
        g, _, _ = null_safe_group_codes(part.column("__kb"))
        side = part.column("__side").to_numpy(zero_copy_only=False)
        is_build = side == 0
        lts_all = _ts_i64_nullsafe(part.column(left_ts))
        rts_all = _ts_i64_nullsafe(part.column("__rts"))
        ts_u = np.where(is_build, rts_all, lts_all)
        # order: group, then ts, then builds before probes at equal ts
        # (backward match is inclusive), then original position (the plain
        # merge's stable tie order among equal build timestamps)
        orig = np.arange(npart)
        order = np.lexsort((orig, side, ts_u, g))
        g_s, build_s, ts_s, orig_s = g[order], is_build[order], ts_u[order], orig[order]
        # null entity keys make __kb null (binary_join emits null) and all
        # nulls share ONE dictionary code — SQL ASOF never matches a NULL
        # key, so null-key builds are not candidates and null-key probes
        # are misses (mirrors the plain-route exclusion)
        if part.column("__kb").null_count:
            kb_valid = pc.is_valid(part.column("__kb")).to_numpy(zero_copy_only=False)
            build_m = build_s & kb_valid[orig_s]
        else:
            kb_valid = None
            build_m = build_s
        pos = np.arange(npart)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g_s)) + 1))
        seg_start_of = np.repeat(seg_first, np.diff(np.concatenate((seg_first, [npart]))))
        lb = np.maximum.accumulate(np.where(build_m, pos, -1))
        have_build = lb >= seg_start_of  # a build row in THIS group at/before me
        probe_pos = np.flatnonzero(~build_s)
        n_probes = len(probe_pos)
        pieces = []
        if n_probes:
            p_orig = orig_s[probe_pos]
            p_valid = have_build[probe_pos]
            if kb_valid is not None:
                p_valid = p_valid & kb_valid[p_orig]
            p_build_orig = orig_s[np.where(p_valid, lb[probe_pos], 0)]
            take_probe = pa.array(p_orig, pa.int64())
            take_build = pa.array(p_build_orig, pa.int64())
            validity = pa.array(p_valid)
            cols: dict = {
                name: part.column(name).take(take_probe) for name, _ in lcols_types
            }
            for c in value_cols:
                taken = part.column("__r_" + c).take(take_build)
                cols[c + suffix] = pc.if_else(validity, taken, pa.nulls(n_probes, rtypes[c]))
            taken_ts = part.column("__rts").take(take_build)
            cols[matched_ts_col] = pc.if_else(validity, taken_ts,
                                              pa.nulls(n_probes, rts_type))
            cols["__kind"] = pa.array(np.zeros(n_probes, dtype=np.int8))
            cols["__sb"] = pa.nulls(n_probes, pa.int64())
            cols["__s_ts"] = pa.nulls(n_probes, rts_type)
            for c in value_cols:
                cols["__s_" + c] = pa.nulls(n_probes, rtypes[c])
            pieces.append(pa.table(cols, schema=fused_schema))
        # summaries: per group, the last build row = lb at the segment end
        seg_end = np.concatenate((seg_first[1:], [npart])) - 1
        s_lb = lb[seg_end]
        s_has = s_lb >= seg_first
        s_build_orig = orig_s[s_lb[s_has]]
        n_sum = len(s_build_orig)
        if n_sum:
            take_b = pa.array(s_build_orig, pa.int64())
            scols: dict = {}
            for nm, typ in lcols_types:
                scols[nm] = part.column(on).take(take_b) if nm == on \
                    else pa.nulls(n_sum, typ)
            for c in value_cols:
                scols[c + suffix] = pa.nulls(n_sum, rtypes[c])
            scols[matched_ts_col] = pa.nulls(n_sum, rts_type)
            scols["__kind"] = pa.array(np.ones(n_sum, dtype=np.int8))
            scols["__sb"] = part.column("__b").take(take_b)
            scols["__s_ts"] = part.column("__rts").take(take_b)
            for c in value_cols:
                scols["__s_" + c] = part.column("__r_" + c).take(take_b)
            pieces.append(pa.table(scols, schema=fused_schema))
        if not pieces:
            return fused_schema.empty_table()
        return pa.concat_tables(pieces)

    # the fused output feeds THREE consumers (matched / unmatched /
    # summaries) — pin it once. Size is probe rows + one summary row per
    # non-empty (entity, bucket): object-store-backed, spillable, and the
    # raw build side is never materialized.
    phase_ab = unioned_ab.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(merge_part, batch_format="pyarrow") \
        .materialize()

    def keep_matched(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t.column("__kind"), 0), pc.is_valid(t.column(matched_ts_col)))
        return t.filter(keep).select(lcols + [c + suffix for c in value_cols] + [matched_ts_col])

    def keep_unmatched(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t.column("__kind"), 0), pc.is_null(t.column(matched_ts_col)))
        return t.filter(keep).select(lcols)

    def keep_summaries(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t.column("__kind"), 1))
        out = {on: s.column(on), "__b": s.column("__sb"), right_ts: s.column("__s_ts")}
        for c in value_cols:
            if c not in out:
                out[c] = s.column("__s_" + c)
        return pa.table(out)

    matched = phase_ab.map_batches(keep_matched, batch_format="pyarrow", zero_copy_batch=True)
    unmatched = phase_ab.map_batches(keep_unmatched, batch_format="pyarrow", zero_copy_batch=True)
    summaries = phase_ab.map_batches(keep_summaries, batch_format="pyarrow", zero_copy_batch=True)

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
        if not hot:
            # no hot keys (auto-detect on an unskewed distribution): every
            # row salts 0 — an empty pa.array is null-typed and would make
            # is_in raise a type mismatch in every map task
            return t.append_column(
                "__salt", pa.array(np.zeros(t.num_rows, dtype=np.int32)))
        cols = [salt_by] if salt_by is not None else t.column_names
        h = _pl.from_arrow(t.select(cols)).hash_rows(seed=11).to_numpy()
        salt = (h % np.uint64(salt_buckets)).astype(np.int32)
        is_hot = pc.is_in(t.column(key), value_set=pa.array(sorted(hot))) \
            .to_numpy(zero_copy_only=False)
        return t.append_column("__salt", pa.array(np.where(is_hot, salt, 0)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def auto_salt_hot_keys(
    ds: ray.data.Dataset,
    key: str,
    phi: float = 0.01,
    salt_buckets: int = 8,
    salt_by: str | None = None,
    sample_fraction: float | None = None,
    sample_by: list[str] | None = None,
) -> tuple[ray.data.Dataset, list]:
    """Self-protecting skew mitigation: detect the φ-heavy keys with
    :func:`~.aggregates.heavy_hitters` (candidate-prune + verify over JUST
    the key column — at most 1/φ candidates ever reach the driver) and
    salt exactly those via :func:`salt_hot_keys`, leaving the long tail on
    salt 0. No hand-maintained hot list: a grouped stage keyed on
    ``(key, __salt)`` bounds its largest task at ~φ·N/salt_buckets rows
    no matter how the key distribution drifts.

    ``sample_fraction`` runs the detection pass on a DETERMINISTIC
    content-hash row sample (identical hashed tuples sample identically
    across cluster sizes and reruns — never a positional or seeded-RNG
    sample) with the detection threshold halved as sampling-noise margin:
    over-detection just salts a warm key (harmless — its groups still
    reunite in phase 2), under-detection is what the margin guards. The
    hash covers ``sample_by`` (default: every column) — it must include a
    near-unique column (an id, a timestamp): rows with identical hashed
    content sample all-or-nothing, which would bias key frequencies.
    Column-prune the sampling scan by passing the smallest such set.

    Returns ``(salted_ds, hot_keys)`` — hot_keys so the caller's phase-2
    reduce knows which groups arrive in ``salt_buckets`` pieces.
    """
    from .aggregates import heavy_hitters

    base = ds.select_columns([key])
    det_phi = phi
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        cutoff = np.uint64(int(sample_fraction * 2**64))
        cols = sorted(set((sample_by or ds.schema().names) + [key]))

        def samp(t: pa.Table) -> pa.Table:
            import polars as _pl

            if t.num_rows == 0:
                return t.select([key])
            h = _pl.from_arrow(t).hash_rows(seed=23).to_numpy()
            return t.filter(pa.array(h < cutoff)).select([key])

        base = ds.select_columns(cols).map_batches(
            samp, batch_format="pyarrow", zero_copy_batch=True)
        det_phi = phi * 0.5

    hot_rows = heavy_hitters(base, key, det_phi).take_all()  # ≤ 1/det_phi rows
    hot_keys = sorted(r[key] for r in hot_rows)
    return salt_hot_keys(ds, key, hot_keys, salt_buckets=salt_buckets,
                         salt_by=salt_by), hot_keys
