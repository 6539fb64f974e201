"""Aggregation helpers: named grouped stats, quality rates, distinct counts,
exact streaming quantiles.

Reference recasts (SURVEY.md §2.6): global per-feature stats (A1,
evaluation/evaluator.py:16-55), boolean quality rates (A2, :57-99), per-category
grouped stats (A3, 04_feature_extraction_experiment/feature_extractor.py:728-745),
percentiles (A4, evaluator.py:149-206), count-distinct (A9).

Unlike the reference — which materializes every value list in RAM before
aggregating (evaluator.py:38-49) — these all run as Ray partial+final
combiners (``Dataset.aggregate`` / ``groupby().aggregate``); only final small
results reach the driver. ``exact_quantiles`` avoids a full driver collect by
streaming the (distributed) sorted column and interpolating at target ranks —
a single-column scan, O(1) driver memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum


def grouped_stats(
    ds: ray.data.Dataset,
    key: str | list[str],
    cols: list[str],
    stats: tuple[str, ...] = ("mean", "std", "min", "max"),
    count_alias: str | None = "n",
) -> ray.data.Dataset:
    """groupby(key) → named per-column aggregates (sample std, ddof=1 — SQL
    ``stddev`` semantics, so DuckDB oracles agree)."""
    aggs = []
    if count_alias:
        aggs.append(Count(alias_name=count_alias))
    mk = {"mean": Mean, "std": Std, "min": Min, "max": Max, "sum": Sum}
    for c in cols:
        for s in stats:
            aggs.append(mk[s](on=c, alias_name=f"{s}_{c}"))
    from .util import null_safe_groupby_aggregate

    return null_safe_groupby_aggregate(ds, key, *aggs)


def global_stats(
    ds: ray.data.Dataset, cols: list[str], stats: tuple[str, ...] = ("mean", "std", "min", "max")
) -> dict:
    """One-row global stats dict (A1)."""
    mk = {"mean": Mean, "std": Std, "min": Min, "max": Max, "sum": Sum}
    aggs = [Count(alias_name="n")]
    for c in cols:
        for s in stats:
            aggs.append(mk[s](on=c, alias_name=f"{s}_{c}"))
    return ds.aggregate(*aggs)


def bool_rates(ds: ray.data.Dataset, flag_exprs: dict[str, str]) -> ray.data.Dataset:
    """Rates of boolean conditions over the corpus (A2).

    ``flag_exprs`` maps output name → column name of an existing bool/0-1
    column; computes mean (fraction true) for each in one pass.
    """
    aggs = [Count(alias_name="n")] + [
        Mean(on=col, alias_name=name) for name, col in flag_exprs.items()
    ]
    row = ds.aggregate(*aggs)
    return row


def distinct_count(ds: ray.data.Dataset, col: str) -> int:
    """Exact distinct count: groupby-key shuffle then count (A9).

    Nulls are excluded — SQL ``COUNT(DISTINCT col)`` semantics (they would
    also crash Ray's sort-based groupby, the same hazard the null-safe
    groupby helpers guard; here SQL says drop them, so filtering is both
    the correct semantics and the safe path)."""

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(col)))

    return ds.select_columns([col]).map_batches(
        drop_null, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(col).count().count()


def grouped_agg_fast(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    num_final_partitions: int = 16,
    count_alias: str | None = None,
) -> ray.data.Dataset:
    """Hash partial+final grouped aggregation (sum/min/max/mean/count).

    Phase 1 combines inside every batch with Arrow's C++ hash aggregation
    (``Table.group_by``) — the map-side combiner the reference lacks entirely
    (SURVEY.md §2.6: it materializes full value lists in RAM,
    evaluation/evaluator.py:38-49). Phase 2 shuffles only the small partials
    by key-hash bucket and combines per bucket. On high-cardinality keys this
    beats the sort-based ``groupby().aggregate()`` by 4–5x at bench scale
    (measured: 1.2–1.7 s vs 5.5–6.9 s on 600k rows / 150k keys at sf0.1,
    the gap growing with key cardinality) and is the pattern that holds at
    100 TB (partials are bounded by #blocks × #distinct-keys-per-block,
    never by row count).

    specs: (out_name, src_col, fn) with fn ∈ {sum, min, max, mean, count}.
    ``mean`` is carried as (sum, non-null count) pairs and finalized in
    phase 2 — SQL ``AVG``/``COUNT(col)`` semantics hold on columns with nulls
    (per-column non-null counts are separate partials, never COUNT(*)).
    """
    import pyarrow.compute as _pc

    # phase-1 aggregation list: mean → sum + per-column non-null count
    p1_aggs: list[tuple[str, str]] = []
    needs_count_all = count_alias is not None
    for out, col, fn in specs:
        if fn == "mean":
            p1_aggs.append((col, "sum"))
            p1_aggs.append((col, "count"))
        elif fn == "count":
            p1_aggs.append((col, "count"))
        elif fn in ("sum", "min", "max"):
            p1_aggs.append((col, fn))
    p1_aggs = list(dict.fromkeys(p1_aggs))
    count_col = "__cnt"

    # NULL group keys never reach Arrow's group_by directly: pyarrow 16's
    # grouper duplicates the null group once its hash table grows (observed:
    # two (NULL, k) rows in one 82-row table emerge as TWO groups), so both
    # phases group on non-null surrogates — an int8 is-null flag plus the
    # key filled with a same-type sentinel — and the final output restores
    # the nulls. SQL GROUP BY null semantics (one NULL group) hold exactly.
    from .util import null_filled_key

    flag_keys = [f"__gkn_{k}" for k in keys]
    surrogate_keys = [c for pair in zip(flag_keys, keys) for c in pair]

    def _encode_keys(t: pa.Table) -> pa.Table:
        for k, fk in zip(keys, flag_keys):
            col = t.column(k)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            filled = null_filled_key(arr, k)
            if filled is not arr:
                t = t.set_column(t.schema.get_field_index(k), k, filled)
            t = t.append_column(fk, _pc.cast(_pc.is_null(arr), pa.int8()))
        return t

    def _decode_keys(t: pa.Table) -> pa.Table:
        for k, fk in zip(keys, flag_keys):
            val = t.column(k)
            val = val.combine_chunks() if isinstance(val, pa.ChunkedArray) else val
            isnull = _pc.cast(t.column(fk), pa.bool_())
            t = t.set_column(t.schema.get_field_index(k), k,
                             _pc.if_else(isnull, pa.scalar(None, val.type), val))
        return t.drop_columns(flag_keys)

    def phase1(t: pa.Table) -> pa.Table:
        # NOTE: no empty-batch early return — Arrow's group_by handles 0-row
        # input and emits the partial-aggregate schema, so an upstream filter
        # that empties a block can never leak the pre-aggregation schema into
        # the shuffle (heterogeneous-schema bug).
        gb = _encode_keys(t).group_by(surrogate_keys)
        aggs = list(p1_aggs)
        if needs_count_all:
            aggs.append(([], "count_all"))
        res = gb.aggregate(aggs)
        ren = {}
        for col, fn in p1_aggs:
            ren[f"{col}_{fn}"] = f"__{fn}_{col}"
        ren["count_all"] = count_col
        res = res.rename_columns([ren.get(n, n) for n in res.column_names])
        return res

    # batch_size=None: combine WHOLE blocks — the default 4096-row batches
    # would cap map-side combining at per-4096-row distincts, shipping up to
    # rows/4096 partials per key instead of one per block (with the coarser
    # wedge partitioning this cut the dense triangle pair exchange from
    # 122 MB to 76 MB at sf0.1).
    partial = ds.map_batches(phase1, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)

    def bucketize(t: pa.Table) -> pa.Table:
        # columnar key hash (no per-row Python): polars hash_rows is a
        # vectorized native row hash; bucket ids only route partials to a
        # final combiner task, they never appear in output, so any
        # deterministic-within-run hash is correct.
        if t.num_rows == 0:
            return t.append_column("__bucket", pa.array([], pa.int32()))
        import polars as _pl

        h = _pl.from_arrow(t.select(surrogate_keys)).hash_rows(seed=42).to_numpy()
        b = (h % np.uint64(num_final_partitions)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def phase2(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__bucket"])
        gb = group.group_by(surrogate_keys)
        aggs = []
        for col, fn in p1_aggs:
            # combine partials: sum-of-sums, min-of-mins, max-of-maxs,
            # sum-of-counts
            comb = "sum" if fn in ("sum", "count") else fn
            aggs.append((f"__{fn}_{col}", comb))
        if needs_count_all:
            aggs.append((count_col, "sum"))
        res = gb.aggregate(aggs)
        res = _decode_keys(res)
        out: dict = {k: res.column(k) for k in keys}
        if count_alias:
            out[count_alias] = res.column(f"{count_col}_sum")
        for out_name, col, fn in specs:
            if fn == "mean":
                out[out_name] = _pc.divide(
                    _pc.cast(res.column(f"__sum_{col}_sum"), pa.float64()),
                    _pc.cast(res.column(f"__count_{col}_sum"), pa.float64()),
                )
            elif fn == "count":
                out[out_name] = res.column(f"__count_{col}_sum")
            else:
                suffix = "sum" if fn == "sum" else fn
                out[out_name] = res.column(f"__{fn}_{col}_{suffix}")
        return pa.table(out)

    # single-final-partition fast path: when the caller knows the final key
    # cardinality is SMALL (a handful of groups — flags, nations, cohorts,
    # histogram bins), phase 2 needs no hash shuffle at all: coalesce the
    # tiny partials (bounded by #blocks × #keys, never row count) into one
    # block and combine there — saves one sort-based all-to-all per query.
    if num_final_partitions == 1:

        def phase2_single(t: pa.Table) -> pa.Table:
            return phase2(t.append_column("__bucket", pa.nulls(t.num_rows, pa.int32())))

        return partial.repartition(1).map_batches(
            phase2_single, batch_format="pyarrow", batch_size=None
        )

    bucketed = partial.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("__bucket").map_groups(phase2, batch_format="pyarrow")


def _tdigest_compress(
    means: np.ndarray, weights: np.ndarray, compression: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted centroids to ≲``compression`` clusters with the
    t-digest k1 scale (arcsin) — tails stay fine-grained, the middle merges.
    Fully vectorized (sort + reduceat); never loops over samples."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = float(w.sum())
    if len(m) <= max(compression // 2, 8) or total <= 0:
        return m, w
    q = np.clip((np.cumsum(w) - w / 2) / total, 1e-12, 1 - 1e-12)
    k = compression / (2 * np.pi) * np.arcsin(2 * q - 1)
    bins = np.floor(k).astype(np.int64)
    starts = np.flatnonzero(np.concatenate(([True], bins[1:] != bins[:-1])))
    gw = np.add.reduceat(w, starts)
    gm = np.add.reduceat(m * w, starts) / gw
    return gm, gw


def approx_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], compression: int = 300
) -> list[float]:
    """Approximate quantiles via a mergeable t-digest sketch (SURVEY §2.6 A4
    sketch slot) — the 100 TB path where :func:`exact_quantiles`' global
    value-sort is a scale-killer.

    Map side: each block compresses its values to ≤``compression`` weighted
    centroids (vectorized k1-scale binning). Only centroid rows — bounded by
    #blocks × compression, never by row count — leave the workers; the
    driver merges them with the same compressor and interpolates at the
    target ranks (clamped to the exact global min/max, which the sketch
    carries losslessly). Accuracy ~O(1/compression²) at the tails; see
    tests for the tolerance pin vs the exact gate.
    """

    def sketch(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"m": pa.array([], pa.float64()), "w": pa.array([], pa.float64())})
        m, w = _tdigest_compress(np.sort(v), np.ones(len(v)), compression)
        return pa.table({"m": pa.array(m, pa.float64()), "w": pa.array(w, pa.float64())})

    def combine(t: pa.Table) -> pa.Table:
        m = t.column("m").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        if len(m) == 0:
            return t
        gm, gw = _tdigest_compress(m, w, compression)
        return pa.table({"m": pa.array(gm, pa.float64()), "w": pa.array(gw, pa.float64())})

    # tree combine: per-block sketches coalesce into ONE merge task; only the
    # final ≤compression centroid rows reach the driver (never blocks × comp)
    final = (
        ds.select_columns([col])
        .map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )
    parts = list(final.iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return [float("nan")] * len(qs)
    allc = pa.concat_tables(parts)
    m = allc.column("m").to_numpy(zero_copy_only=False)
    w = allc.column("w").to_numpy(zero_copy_only=False)
    return _tdigest_quantiles(m, w, qs)


def _tdigest_quantiles(m: np.ndarray, w: np.ndarray, qs: list[float]) -> list[float]:
    """Interpolate target ranks over sorted weighted centroids."""
    if len(m) == 0:
        return [float("nan")] * len(qs)
    order = np.argsort(m, kind="stable")
    m, w = m[order], w[order]
    vmin, vmax = float(m[0]), float(m[-1])
    total = float(w.sum())
    mid = np.cumsum(w) - w / 2
    out = []
    for q in qs:
        r = q * total
        j = int(np.searchsorted(mid, r))
        if j == 0:
            out.append(float(max(m[0], vmin)) if q > 0 else vmin)
        elif j >= len(m):
            out.append(float(min(m[-1], vmax)) if q < 1 else vmax)
        else:
            frac = (r - mid[j - 1]) / max(mid[j] - mid[j - 1], 1e-12)
            out.append(float(m[j - 1] + (m[j] - m[j - 1]) * frac))
    return out


def approx_quantiles_grouped(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    qs: list[float],
    compression: int = 300,
) -> ray.data.Dataset:
    """Per-group t-digest percentiles: mergeable sketches compose with the
    partial+final grouped shape — per (batch, key) sketch rows shuffle
    (bounded by keys × compression per block), per-key merge + interpolation
    in ``map_groups``. The grouped counterpart of :func:`approx_quantiles`;
    no per-group value sort, no whole-group value materialization.
    """

    def sketch(t: pa.Table) -> pa.Table:
        import polars as _pl

        out_k, out_m, out_w = [], [], []
        # per-batch per-key sketches via a local sort by (key, value)
        # drop_nulls catches Arrow nulls; the is_not_nan filter catches raw
        # float NaNs, which would otherwise poison a group's centroid means
        # (the ungrouped approx_quantiles guards identically)
        # NULL group KEYS stay (SQL GROUP BY keeps one NULL group); only
        # null/NaN VALUES drop (SQL aggregate semantics)
        df = _pl.from_arrow(t.select([key, col])).drop_nulls(subset=[col])
        if df.height and df[col].dtype.is_float():
            df = df.filter(_pl.col(col).is_not_nan())
        if df.height == 0:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type),
                 "m": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        df = df.sort([key, col])
        # rle_id treats null==null as one run — int keys with nulls would
        # otherwise degrade to float64/NaN where every NaN starts a new run
        rid = df[key].rle_id().to_numpy()
        v = df[col].to_numpy().astype(np.float64)
        starts = np.flatnonzero(np.concatenate(([True], rid[1:] != rid[:-1])))
        bounds = np.append(starts, len(rid))
        kvals = df[key].to_arrow().take(pa.array(starts.astype(np.int64))).to_pylist()
        for i in range(len(starts)):
            seg = v[bounds[i] : bounds[i + 1]]
            m, w = _tdigest_compress(seg, np.ones(len(seg)), compression)
            out_k.extend([kvals[i]] * len(m))
            out_m.extend(m.tolist())
            out_w.extend(w.tolist())
        return pa.table(
            {key: pa.array(out_k, t.schema.field(key).type),
             "m": pa.array(out_m, pa.float64()), "w": pa.array(out_w, pa.float64())}
        )

    sketches = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)

    out_fields = [("p%g" % (q * 100)).replace(".", "_") for q in qs]

    def per_key(group: pa.Table) -> pa.Table:
        m = group.column("m").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        gm, gw = _tdigest_compress(m, w, compression)
        vals = _tdigest_quantiles(gm, gw, qs)
        # explicit key type: from_pydict would infer null type for the
        # NULL group's [None] and break the map_groups concat
        cols = {key: pa.array([group.column(key)[0].as_py()],
                              group.schema.field(key).type)}
        for name, v in zip(out_fields, vals):
            cols[name] = pa.array([v], pa.float64())
        return pa.table(cols)

    from .util import null_safe_map_groups

    return null_safe_map_groups(sketches, key, per_key)


def mad_grouped(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    compression: int = 300,
    out_col: str = "mad",
    broadcast_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-group median absolute deviation via mergeable t-digest sketches —
    MAD = median(|x − median_g(x)|), i.e. q=0.5 twice through
    :func:`approx_quantiles_grouped`. NO low-cardinality contract: no
    whole-group value materialization anywhere — each pass ships only
    per-(block, key) centroid rows (≤ keys × compression per block) and the
    per-group merge runs over sketch rows, so million-key inputs stream.

    The per-group median table (|keys| rows of one float) joins back
    broadcast below ``broadcast_threshold`` rows, else through one
    :func:`~.joins.bucket_hash_join` exchange. Accuracy follows the
    t-digest median error (≲1% of spread at compression 300); use the
    exact ``map_groups`` path only when group cardinality is small and
    bit-exactness is required.
    """
    from .joins import broadcast_join, hash_join
    from .util import _null_safe_key_encode

    base = ds.select_columns([key, col])
    med = approx_quantiles_grouped(base, key=key, col=col, qs=[0.5],
                                   compression=compression)
    med = med.map_batches(lambda t: t.rename_columns([key, "__med"]),
                          batch_format="pyarrow", zero_copy_batch=True)
    med = med.materialize()
    # join back on the non-null SURROGATE pair, not the raw key: this is a
    # group-median re-attach, so the NULL group must match its own median
    # (plain SQL equi-join semantics would drop it)
    encode, flag_cols, val_cols = _null_safe_key_encode([key])
    surrogates = [flag_cols[0], val_cols[0]]
    base_e = base.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
    med_e = med.map_batches(lambda t: encode(t).drop_columns([key]),
                            batch_format="pyarrow", zero_copy_batch=True)
    if med.count() <= broadcast_threshold:
        joined = broadcast_join(base_e, med_e, keys=surrogates)
    else:
        # hash_join (Ray-native) takes composite keys; bucket_hash_join is
        # single-key only
        joined = hash_join(base_e, med_e, on=tuple(surrogates))

    def dev(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.float64())
        d = pc.abs(pc.subtract(x, t.column("__med")))
        return pa.table({key: t.column(key), "__dev": d})

    devs = joined.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True)
    out = approx_quantiles_grouped(devs, key=key, col="__dev", qs=[0.5],
                                   compression=compression)
    return out.map_batches(lambda t: t.rename_columns([key, out_col]),
                           batch_format="pyarrow", zero_copy_batch=True)


def approx_distinct(
    ds: ray.data.Dataset, col: str, precision: int = 12
) -> int:
    """Approximate COUNT(DISTINCT col) via HyperLogLog (A9 sketch slot — at
    100 TB the exact path's groupby shuffle moves every distinct key).

    Map side: each block hashes its values columnar (polars row hash →
    bucket index + leading-zero rank) and emits its 2^precision register
    maxima as ONE fixed-size row; registers merge by elementwise max in a
    single combine task (same ``repartition(1)`` tree-combine shape as
    :func:`approx_quantiles`) so only the FINAL register row reaches the
    driver, which runs the standard bias-corrected harmonic estimate.
    Standard error ≈ 1.04/sqrt(2^precision) ≈ 1.6% at precision 12.
    """
    m = 1 << precision

    def sketch(t: pa.Table) -> pa.Table:
        import polars as _pl

        regs = np.zeros(m, dtype=np.int64)
        if t.num_rows and t.column(col).null_count:
            # SQL COUNT(DISTINCT col) excludes NULL — hash_rows would
            # otherwise register the null as one extra distinct element
            t = t.filter(pc.is_valid(t.column(col)))
        if t.num_rows:
            h = _pl.from_arrow(t.select([col])).hash_rows(seed=99).to_numpy()
            bucket = (h >> np.uint64(64 - precision)).astype(np.int64)
            rest = (h << np.uint64(precision)) | np.uint64(1 << (precision - 1))
            # rank = leading zeros of the remaining bits + 1, vectorized via
            # float64 exponent extraction (exact for any nonzero uint64)
            exp = ((rest.astype(np.float64)).view(np.uint64) >> np.uint64(52)) - np.uint64(1023)
            rank = (64 - exp.astype(np.int64)).clip(1, 64 - precision + 1)
            np.maximum.at(regs, bucket, rank)
        return pa.table({"reg": pa.array(regs, pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        arr = t.column("reg").to_numpy(zero_copy_only=False)
        if len(arr) == 0:
            return pa.table({"reg": pa.array(np.zeros(m, dtype=np.int64), pa.int64())})
        return pa.table(
            {"reg": pa.array(arr.reshape(-1, m).max(axis=0), pa.int64())}
        )

    parts = list(
        ds.select_columns([col])
        # batch_size=None: one m-register row per BLOCK — the 4096-row
        # default would emit one register table per 4096 input rows,
        # making the pre-combine exchange ~input-sized
        .map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    regs = np.zeros(m, dtype=np.int64)
    for p in parts:  # exactly one m-register row after the combine task
        arr = p.column("reg").to_numpy(zero_copy_only=False)
        regs = np.maximum(regs, arr.reshape(-1, m).max(axis=0))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # small-range correction
    return int(round(est))


def exact_quantiles(ds: ray.data.Dataset, col: str, qs: list[float]) -> list[float]:
    """Exact quantiles with linear interpolation (SQL ``quantile_cont``).

    Distributed sort on the single projected column, then a streaming scan of
    sorted batches that only keeps the values at the target ranks — the driver
    never holds the column. Null rows are excluded (SQL quantile_cont
    semantics): ranks are computed over the NON-NULL count, and the sort
    input is pre-filtered so nulls can never occupy a target rank.
    """
    base = ds.select_columns([col]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(col))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # materialize: count() then sort() would otherwise EXECUTE the upstream
    # pipeline twice (same reason bloom_semi_join/tfidf_top_terms pin theirs)
    n = base.count()
    if n == 0:
        return [float("nan")] * len(qs)
    sorted_ds = base.sort(col)
    # target (possibly fractional) ranks, quantile_cont style
    pos = [(q * (n - 1)) for q in qs]
    need: dict[int, float | None] = {}
    for p in pos:
        need[int(np.floor(p))] = None
        need[int(np.ceil(p))] = None
    seen = 0
    for batch in sorted_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        arr = batch.column(col).to_numpy(zero_copy_only=False)
        for r in list(need):
            if need[r] is None and seen <= r < seen + len(arr):
                need[r] = float(arr[r - seen])
        seen += len(arr)
        if all(v is not None for v in need.values()):
            break
    out = []
    for p in pos:
        lo, hi = int(np.floor(p)), int(np.ceil(p))
        frac = p - lo
        out.append(need[lo] * (1 - frac) + need[hi] * frac)
    return out


def grouped_collect(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    order_cols: list[str] | None = None,
    out_col: str | None = None,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """SQL ``array_agg(value ORDER BY ...)``: one row per group with the
    group's values as a list column, deterministically ordered.

    One coarse-partitioned exchange; inside a partition the collect is a
    single vectorized pass — sort by (key, order), find run boundaries,
    wrap the value column in a ``ListArray`` via offsets (zero value
    copies beyond the sort's take). Output is one row per group, so the
    shuffle's receive side is bounded by group payloads — a hot group's
    list inherently lives in one task, the operator's contract (chunk via
    an upstream bucketed key when a single group's payload exceeds a
    worker)."""
    from .util import coarse_partitioned

    out_name = out_col or (value_col + "_list")
    order_cols = order_cols or []

    def run_part(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = t.num_rows
        vtype = t.schema.field(value_col).type
        if n == 0:
            return pa.table(
                {key: t.column(key), out_name: pa.array([], pa.list_(vtype))}
            )
        sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        codes = (
            t.column(key).combine_chunks().dictionary_encode().indices
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        starts = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        values = t.column(value_col).combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        keys = t.column(key).take(pa.array(starts, pa.int64()))
        return pa.table({key: keys, out_name: lists})

    return coarse_partitioned(ds, key, run_part, n_partitions=n_partitions)


def grouped_mode(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    out_col: str = "mode",
    count_col: str = "n",
) -> ray.data.Dataset:
    """Most frequent ``value_col`` per group (ties → smallest value,
    deterministic): a (key, value) grouped count through the map-side
    combiner, then per-key top-1 by (count desc, value asc) via
    :func:`~.util.grouped_topk` — both phases shuffle only partials,
    never rows."""
    from .util import grouped_topk

    counts = grouped_agg_fast(ds, keys=[key, value_col], specs=[], count_alias=count_col)
    top = grouped_topk(counts, key, [count_col, value_col], 1, descending=[True, False])
    return top.map_batches(
        lambda t: t.rename_columns(
            [out_col if c == value_col else c for c in t.column_names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

def _pair_moment_sums(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group bivariate sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy)
    with SQL pairwise-deletion semantics — the shared kernel behind
    :func:`grouped_corr` and :func:`grouped_linreg`. Map-side-combinable, so
    only O(#blocks × #keys-per-block) partials ever shuffle."""

    def add_moments(t: pa.Table) -> pa.Table:
        xs = pc.cast(t.column(x), pa.float64())
        ys = pc.cast(t.column(y), pa.float64())
        both = pc.and_kleene(pc.is_valid(xs), pc.is_valid(ys))
        # pairwise deletion: null either coordinate when its partner is null
        xs = pc.if_else(both, xs, pa.scalar(None, pa.float64()))
        ys = pc.if_else(both, ys, pa.scalar(None, pa.float64()))
        return pa.table(
            {
                key: t.column(key),
                "__x": xs,
                "__y": ys,
                "__xx": pc.multiply(xs, xs),
                "__yy": pc.multiply(ys, ys),
                "__xy": pc.multiply(xs, ys),
            }
        )

    moments = ds.map_batches(add_moments, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg_fast(
        moments,
        keys=[key],
        specs=[
            ("n", "__x", "count"),
            ("sx", "__x", "sum"),
            ("sy", "__y", "sum"),
            ("sxx", "__xx", "sum"),
            ("syy", "__yy", "sum"),
            ("sxy", "__xy", "sum"),
        ],
        num_final_partitions=num_final_partitions,
    )


def grouped_corr(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group Pearson correlation + population covariance via streaming
    sufficient statistics (see :func:`_pair_moment_sums`).

    SQL ``corr``/``covar_pop`` semantics: only rows where BOTH x and y are
    non-null contribute (pairwise deletion). Reference analog: the serial
    per-file correlation stats the evaluation step computes in RAM
    (03_feature_comparison_experiment/feature_comparison.py:1 region);
    here the moments stream and combine associatively — the shape that
    holds at 100 TB where the reference's value lists cannot.

    Output: one row per group — key, ``n`` (pair count), ``cov_pop``,
    ``corr`` (null when either variance is 0 or n == 0).
    """
    sums = _pair_moment_sums(ds, key, x, y, num_final_partitions)

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mx, my = sx / n, sy / n
            cov = sxy / n - mx * my
            vx = sxx / n - mx * mx
            vy = syy / n - my * my
            corr = cov / np.sqrt(vx * vy)
        corr = np.where((vx > 0) & (vy > 0), corr, np.nan)
        return pa.table(
            {
                key: t.column(key),
                "n": pc.cast(t.column("n"), pa.int64()),
                "cov_pop": pa.array(np.where(n > 0, cov, np.nan), pa.float64()),
                "corr": pa.array(corr, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_entropy(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    out_col: str = "entropy",
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Shannon entropy (log base 2, DuckDB ``entropy()`` semantics) of the
    ``value_col`` distribution per group.

    Two partial-only exchanges: (key, value) counts through the map-side
    combiner, then per-key Σc·log₂c + Σc — H = log₂(N) − Σc·log₂c / N.
    Neither phase ever shuffles rows, only (distinct-pair, count) partials,
    so a 100 TB corpus with bounded per-block distinct pairs streams
    through untouched. Nulls are excluded (SQL aggregate semantics).
    """
    nonnull = ds.map_batches(
        lambda t: t.filter(t.column(value_col).is_valid()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = grouped_agg_fast(nonnull, keys=[key, value_col], specs=[], count_alias="__c")

    def add_clog(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("__c"), pa.float64())
        return pa.table(
            {
                key: t.column(key),
                "__c": c,
                "__clog": pc.multiply(c, pc.log2(c)),
            }
        )

    partials = counts.map_batches(add_clog, batch_format="pyarrow", zero_copy_batch=True)
    sums = grouped_agg_fast(
        partials,
        keys=[key],
        specs=[("n", "__c", "sum"), ("s_clog", "__clog", "sum")],
        num_final_partitions=num_final_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        s = t.column("s_clog").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.log2(n) - s / n
        return pa.table(
            {
                key: t.column(key),
                "n": pc.cast(pa.array(n), pa.int64()),
                out_col: pa.array(np.where(n > 0, h, np.nan), pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)

def grouped_linreg(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group ordinary-least-squares fit of ``y`` on ``x`` from the same
    streaming moments as :func:`grouped_corr` — SQL ``regr_slope`` /
    ``regr_intercept`` / ``regr_r2`` semantics (pairwise deletion; slope
    null when x has zero variance).

    Output: key, ``n``, ``slope``, ``intercept``, ``r2``.
    """
    sums = _pair_moment_sums(ds, key, x, y, num_final_partitions)

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mx, my = sx / n, sy / n
            cov = sxy / n - mx * my
            vx = sxx / n - mx * mx
            vy = syy / n - my * my
            slope = cov / vx
            intercept = my - slope * mx
            # SQL regr_r2: squared sample correlation (1.0 when y is
            # constant and x varies, per DuckDB/Postgres)
            r2 = np.where(vy > 0, (cov * cov) / (vx * vy), 1.0)
        ok = (n > 0) & (vx > 0)
        return pa.table(
            {
                key: t.column(key),
                "n": pc.cast(t.column("n"), pa.int64()),
                "slope": pa.array(np.where(ok, slope, np.nan), pa.float64()),
                "intercept": pa.array(np.where(ok, intercept, np.nan), pa.float64()),
                "r2": pa.array(np.where(ok, r2, np.nan), pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)

def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    phi: float,
    n_total: int | None = None,
) -> ray.data.Dataset:
    """EXACT φ-heavy hitters: every distinct ``col`` value whose frequency is
    ≥ ``phi`` × total rows, with its exact count — via candidate-prune +
    verify, never a full-cardinality exchange.

    Pass 1 (one streaming scan): per-block counts; a value is a candidate iff
    its in-block frequency ≥ φ × block rows. The averaging argument makes
    this a guaranteed superset — a value below φ in EVERY block sums below
    φN — and bounds candidates at 1/φ per block, so the exchange ships at
    most (#blocks / φ) tiny (value, count) partials instead of full key
    cardinality. Block sizes ride along in a null-key row, so the same pass
    yields N. The deduped candidate list (≤ 1/φ typically, heavy-tailed
    corpora collapse hard) is broadcast once via ``ray.put``.

    Pass 2 re-scans with an ``is_in`` prune and exact-counts ONLY candidates
    (map-side combined), then filters count ≥ φN. Output is exact — unlike
    one-pass Misra–Gries this answers with true counts, at the price of a
    second scan (cheap for columnar sources with column pruning).
    """
    import math

    import ray

    def pass1(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        # nulls are excluded (they'd collide with the null block-size
        # sentinel; SQL callers count nulls separately if they care)
        vals = vals.filter(vals.is_valid())
        counts = pa.table({col: vals}).group_by([col]).aggregate([([], "count_all")])
        c = counts.column("count_all")
        n_b = len(vals)  # non-null rows: N and per-block φ share a basis
        keep = pc.greater_equal(pc.cast(c, pa.float64()), pa.scalar(phi * n_b))
        cand = counts.filter(keep)
        # null-key row carries the block size so one pass yields N
        return pa.table(
            {
                col: pa.concat_arrays(
                    [cand.column(col).combine_chunks().cast(vals.type),
                     pa.nulls(1, vals.type)]
                ),
                "c": pa.concat_arrays(
                    [pc.cast(cand.column("count_all"), pa.int64()).combine_chunks(),
                     pa.array([n_b], pa.int64())]
                ),
            }
        )

    # batch_size=None: per-BLOCK candidate pruning (the 4096-row default
    # weakens the per-batch phi threshold and multiplies partial rows; the
    # final output is identical either way — pass 2 recounts exactly)
    p1 = ds.map_batches(pass1, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None)
    agg = grouped_agg_fast(p1, keys=[col], specs=[("c", "c", "sum")])
    blocks = [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows > 0]
    cand_tbl = pa.concat_tables(blocks).combine_chunks() if blocks else pa.table(
        {col: pa.array([], pa.string()), "c": pa.array([], pa.int64())}
    )
    null_mask = pc.is_null(cand_tbl.column(col))
    n_from_pass = pc.sum(
        pc.if_else(null_mask, cand_tbl.column("c"), pa.scalar(0, pa.int64()))
    ).as_py() or 0
    total = n_total if n_total is not None else n_from_pass
    candidates = cand_tbl.filter(pc.invert(null_mask)).column(col).combine_chunks()
    threshold = phi * total
    bcast = ray.put(candidates)

    def pass2(t: pa.Table) -> pa.Table:
        cands = ray.get(bcast)
        kept = t.filter(pc.is_in(t.column(col), value_set=cands))
        counts = (
            pa.table({col: kept.column(col)})
            .group_by([col])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                col: counts.column(col),
                "n": pc.cast(counts.column("count_all"), pa.int64()),
            }
        )

    exact = grouped_agg_fast(
        ds.map_batches(pass2, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        keys=[col],
        specs=[("n", "n", "sum")],
    )
    return exact.map_batches(
        lambda t: t.filter(
            pc.greater_equal(pc.cast(t.column("n"), pa.float64()), pa.scalar(float(threshold)))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

def chi_square(
    ds: ray.data.Dataset,
    a_col: str,
    b_col: str,
    in_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Pearson χ² test of independence between two categorical columns —
    the feature-relevance screen (is feature ``a`` informative about label
    ``b``?): one-row output ``(chi2, dof, n, cramers_v)``.

    The only exchange is the (a, b) contingency count through the map-side
    combiner; the cell table (|A|·|B| — categorical by assumption, so tiny)
    is finalized in one task. Zero-observed cells contribute their full
    expected mass, matching the textbook statistic. Extends the reference's
    per-category comparison report (03_feature_comparison_experiment/
    feature_comparison.py grouped deltas) with an actual dependence test.
    """
    from .util import arrow_schema_of, bounded_table

    if in_schema is None:
        # callers whose input went through a transform can pass in_schema
        # explicitly — an ALL-EMPTY transformed dataset has no inferable
        # schema (Ray runs no task over zero blocks)
        ds, in_schema = arrow_schema_of(ds)
    counts = grouped_agg_fast(ds.select_columns([a_col, b_col]),
                              keys=[a_col, b_col], specs=[], count_alias="__n")

    def finalize(t: pa.Table) -> pa.Table:
        # null categories are excluded from the test (no meaningful margin)
        t = t.filter(pc.and_(t.column(a_col).is_valid(), t.column(b_col).is_valid()))
        if t.num_rows == 0:
            return pa.table({
                "chi2": pa.array([None], pa.float64()),
                "dof": pa.array([0], pa.int64()),
                "n": pa.array([0], pa.int64()),
                "cramers_v": pa.array([None], pa.float64()),
            })
        a_codes = t.column(a_col).combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        b_codes = t.column(b_col).combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        ka, kb = a_codes.max() + 1, b_codes.max() + 1
        obs = np.zeros((ka, kb))
        obs[a_codes, b_codes] = n
        na, nb, total = obs.sum(1), obs.sum(0), obs.sum()
        exp = np.outer(na, nb) / total
        chi2 = float(((obs - exp) ** 2 / exp).sum())
        dof = int((ka - 1) * (kb - 1))
        denom = total * min(ka - 1, kb - 1)
        v = float(np.sqrt(chi2 / denom)) if denom > 0 else None
        return pa.table({
            "chi2": pa.array([chi2], pa.float64()),
            "dof": pa.array([dof], pa.int64()),
            "n": pa.array([int(total)], pa.int64()),
            "cramers_v": pa.array([v], pa.float64()),
        })

    # the contingency is |A|·|B| rows (categorical by assumption) — bound
    # it so an ALL-EMPTY input still yields the one schema'd output row
    # (zero blocks would otherwise skip finalize entirely)
    cont = bounded_table(counts, pa.schema([
        in_schema.field(a_col), in_schema.field(b_col),
        pa.field("__n", pa.int64()),
    ]))
    return ray.data.from_arrow(finalize(cont))

def cohort_retention(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    method: str = "broadcast",
) -> ray.data.Dataset:
    """Weekly cohort-retention matrix: users bucketed by first-seen week,
    distinct active users counted per (cohort_week, week_offset) — the
    classic engagement/retention rollup over an event log.

    Three partial-only exchanges, rows never concentrate: (1) first-seen
    per user through the map-side min-combiner; (2) the |users|-row firsts
    table joins back (broadcast, or ``method='shuffle'`` via
    ``bucket_hash_join`` when the user set is corpus-scale); (3) distinct
    (cohort, offset, user) triples collapse map-side before the final
    per-cell count. Week truncation is Monday-based (DuckDB
    ``date_trunc('week')`` parity).
    """
    from .joins import broadcast_join, bucket_hash_join

    if method not in ("broadcast", "shuffle"):
        raise ValueError(method)

    ev = ds.select_columns([user_col, ts_col])
    firsts = grouped_agg_fast(
        ev, keys=[user_col], specs=[("__first_ts", ts_col, "min")]
    )
    if method == "broadcast":
        joined = broadcast_join(ev, firsts, keys=user_col, join_type="inner")
    else:
        joined = bucket_hash_join(ev, firsts, on=user_col, join_type="inner")

    WEEK_US = 7 * 86400 * 1_000_000

    def to_cells(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.timestamp("us"))
        first = pc.cast(t.column("__first_ts"), pa.timestamp("us"))
        cw = pc.floor_temporal(first, unit="week", week_starts_monday=True)
        ew = pc.floor_temporal(ts, unit="week", week_starts_monday=True)
        # SQL NULL arithmetic: a NULL ts (or NULL first_ts, from an all-null
        # user) yields a NULL week_offset cell, not a crash — compute the
        # offset on sentinel-filled native ints and restore the null mask
        cw_i = pc.cast(cw, pa.int64())
        ew_i = pc.cast(ew, pa.int64())
        valid = pc.and_(pc.is_valid(cw_i), pc.is_valid(ew_i))
        off = (ew_i.fill_null(0).to_numpy(zero_copy_only=False)
               - cw_i.fill_null(0).to_numpy(zero_copy_only=False)) // WEEK_US
        return pa.table(
            {
                "cohort_week": cw,
                "week_offset": pc.if_else(valid, pa.array(off, pa.int64()),
                                          pa.scalar(None, pa.int64())),
                user_col: t.column(user_col),
            }
        )

    cells = joined.map_batches(to_cells, batch_format="pyarrow", zero_copy_batch=True)
    distinct = grouped_agg_fast(
        cells, keys=["cohort_week", "week_offset", user_col], specs=[]
    )
    return grouped_agg_fast(
        distinct.select_columns(["cohort_week", "week_offset"]),
        keys=["cohort_week", "week_offset"],
        specs=[],
        count_alias="active_users",
    )

def funnel(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Sequential k-step funnel: for each step i, count users who reached
    it — step 0 is "has an event of type steps[0]", step i is "has a
    steps[i] event STRICTLY AFTER their first qualifying steps[i-1] event"
    (first-touch chaining, the standard product-analytics funnel).

    One user-hash exchange (``coarse_partitioned``); inside a partition the
    whole chain is k vectorized passes (per-user first-qualifying timestamp
    via ``np.minimum.at`` on dictionary codes — no per-user dispatch). Each
    partition emits k partial counts; the final combine sums k rows. Output:
    (step, users), one row per step.
    """
    from .util import coarse_partitioned

    ev = ds.select_columns([user_col, ts_col, type_col])

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "step": pa.array(list(steps), pa.string()),
                    "users": pa.array([0] * len(steps), pa.int64()),
                }
            )
        t = t.combine_chunks()
        # SQL COUNT semantics: a NULL user is not a countable entity (a
        # null dictionary index would also scatter to INT64_MIN and crash)
        if t.column(user_col).null_count:
            t = t.filter(pc.is_valid(t.column(user_col)))
            if t.num_rows == 0:
                return pa.table(
                    {
                        "step": pa.array(list(steps), pa.string()),
                        "users": pa.array([0] * len(steps), pa.int64()),
                    }
                )
            t = t.combine_chunks()
        codes = (
            t.column(user_col).combine_chunks().dictionary_encode().indices
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # us-precision timestamps (~1.7e15) sit far below 2^53: float64 is exact
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        n_users = int(codes.max()) + 1
        t_prev = np.full(n_users, -np.inf)
        out_counts = []
        for step in steps:
            m = pc.fill_null(
                pc.equal(t.column(type_col), pa.scalar(step)), False
            ).to_numpy(zero_copy_only=False).astype(bool)
            m &= ts > t_prev[codes]
            t_i = np.full(n_users, np.inf)
            np.minimum.at(t_i, codes[m], ts[m])
            out_counts.append(int(np.isfinite(t_i).sum()))
            t_prev = t_i
        return pa.table(
            {
                "step": pa.array(list(steps), pa.string()),
                "users": pa.array(out_counts, pa.int64()),
            }
        )

    parts = coarse_partitioned(ds=ev, key=user_col, fn=per_part, n_partitions=n_partitions)
    agg = grouped_agg_fast(
        parts, keys=["step"], specs=[("users", "users", "sum")], num_final_partitions=1
    )
    # output is k rows BY CONTRACT — bound it so an all-empty input still
    # presents the schema with zero counts (Ray drops 0-row blocks at
    # iteration, which would otherwise surface a column-less result)
    from .util import bounded_table

    got = bounded_table(agg, pa.schema([("step", pa.string()),
                                        ("users", pa.int64())]))
    have = {r["step"]: r["users"] for r in got.to_pylist()}
    return ray.data.from_arrow(pa.table({
        "step": pa.array(list(steps), pa.string()),
        "users": pa.array([int(have.get(s, 0)) for s in steps], pa.int64()),
    }))


def grouped_spearman(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    n_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group Spearman rank correlation (average ranks for ties, SQL
    pairwise deletion). Unlike :func:`grouped_corr`, ranks are a
    whole-group order statistic, so each group must co-locate: one key-hash
    shuffle, then every group of a block ranks in one vectorized pass
    (argsort + tie-run averaging) and reduces to a single output row —
    rows shuffle once, the result is |keys| rows.

    Output: key, ``n`` (pair count), ``spearman`` (null when either rank
    vector is constant or n == 0).
    """

    def _avg_ranks(v: np.ndarray) -> np.ndarray:
        """Average ranks (1-based) with ties sharing the mean position."""
        s = len(v)
        order = np.argsort(v, kind="stable")
        sv = v[order]
        # run starts of equal values
        starts = np.concatenate(([0], np.flatnonzero(sv[1:] != sv[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [s])))
        # mean of positions start+1 .. start+size
        avg = starts + (sizes + 1) / 2.0
        ranks = np.empty(s)
        ranks[order] = np.repeat(avg, sizes)
        return ranks

    def block_stats(block: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [pa.field(key, block.schema.field(key).type),
             pa.field("n", pa.int64()),
             pa.field("spearman", pa.float64())]
        )
        xs = pc.cast(block.column(x), pa.float64()).to_numpy(zero_copy_only=False)
        ys = pc.cast(block.column(y), pa.float64()).to_numpy(zero_copy_only=False)
        both = ~(np.isnan(xs) | np.isnan(ys))
        block = block.filter(pa.array(both))
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        xs, ys = xs[both], ys[both]
        from .util import null_safe_group_codes

        g, labels_of, _ = null_safe_group_codes(block.column(key))
        order = np.argsort(g, kind="stable")
        g, xs, ys = g[order], xs[order], ys[order]
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        out_n = seg_sizes.astype(np.int64)
        rho = np.empty(len(seg_first))
        for si, (st, size) in enumerate(zip(seg_first, seg_sizes)):
            sl = slice(st, st + size)
            rx, ry = _avg_ranks(xs[sl]), _avg_ranks(ys[sl])
            mx, my = rx.mean(), ry.mean()
            dx, dy = rx - mx, ry - my
            vx, vy = (dx * dx).sum(), (dy * dy).sum()
            rho[si] = (dx * dy).sum() / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
        return pa.table(
            {
                key: labels_of(g[seg_first]),
                "n": pa.array(out_n, pa.int64()),
                "spearman": pa.array(rho, pa.float64(), from_pandas=True),
            },
            schema=out_schema,
        )

    from .util import coarse_partitioned

    return coarse_partitioned(ds.select_columns([key, x, y]), key,
                              block_stats, n_partitions=n_partitions)


def cooccurrence_lift(
    ds: ray.data.Dataset,
    basket: str,
    item: str,
    n_partitions: int = 32,
    min_support: int = 1,
    broadcast_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Market-basket co-occurrence with lift: for every unordered item pair
    (a < b), the number of baskets containing BOTH and
    ``lift = n_ab · N / (n_a · n_b)`` (N = distinct baskets, n_x = baskets
    containing x).

    Scale shape: rows collapse to DISTINCT (basket, item) through the
    map-side combiner first; pair enumeration then happens inside
    basket-hash-co-located blocks, so the pair stream is bounded by
    Σ_b |items_b|² — per-basket item sets, never the corpus item vocabulary
    — and only (a, b, count) partials plus the |items|-row marginals move.

    The marginal join self-protects against open-vocabulary item columns:
    ``min_support`` prunes pairs with ``n_ab < min_support`` AND marginals
    with ``n_x < min_support`` (consistent by construction — any item in a
    surviving pair has ``n_x ≥ n_ab ≥ min_support``, the standard
    market-basket support threshold; sub-support pairs are statistical
    noise for lift anyway), and if the pruned marginal table still exceeds
    ``broadcast_threshold`` rows the join routes through
    :func:`~.joins.bucket_hash_join` (one bucket shuffle, nothing
    collected on the driver) instead of a driver broadcast — the same
    escalation :func:`~.scaling.target_encode` uses.
    Output: (item_a, item_b, n_ab, lift).
    """
    import pyarrow.compute as pc

    # a NULL basket id is not a basket and a NULL item is not an item —
    # neither can pair, count as a marginal, or enter N (the SQL replay's
    # equi-joins and a < b comparison reject them anyway; filtering up
    # front keeps the marginals on the same basis as the pairs)
    distinct = grouped_agg_fast(
        ds.select_columns([basket, item]).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=[basket, item], specs=[]
    ).materialize()
    marg = grouped_agg_fast(distinct, keys=[item], specs=[], count_alias="c")
    n_baskets = grouped_agg_fast(distinct, keys=[basket], specs=[]).count()

    def pairs_block(t: pa.Table) -> pa.Table:
        it = t.schema.field(item).type
        empty = pa.table({"item_a": pa.array([], it), "item_b": pa.array([], it)})
        n = t.num_rows
        if n == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[(basket, "ascending"),
                                                 (item, "ascending")]))
        b = t.column(basket).combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(b)) + 1))
        seg_sizes = np.diff(np.concatenate((seg_first, [n])))
        ia, ib = [], []
        for st, size in zip(seg_first, seg_sizes):
            if size < 2:
                continue
            u, v = np.triu_indices(size, 1)
            ia.append(st + u)
            ib.append(st + v)
        if not ia:
            return empty
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        items = t.column(item)
        return pa.table({
            "item_a": items.take(pa.array(ia, pa.int64())),
            "item_b": items.take(pa.array(ib, pa.int64())),
        })

    from .util import coarse_partitioned

    pairs = coarse_partitioned(distinct, basket, pairs_block,
                               n_partitions=n_partitions)
    counts = grouped_agg_fast(pairs, keys=["item_a", "item_b"], specs=[],
                              count_alias="n_ab")

    if min_support > 1:
        sup = pa.scalar(min_support, pa.int64())
        counts = counts.map_batches(
            lambda t: t.filter(pc.greater_equal(pc.cast(t.column("n_ab"), pa.int64()), sup)),
            batch_format="pyarrow", zero_copy_batch=True)
        marg = marg.map_batches(
            lambda t: t.filter(pc.greater_equal(pc.cast(t.column("c"), pa.int64()), sup)),
            batch_format="pyarrow", zero_copy_batch=True)

    from .joins import broadcast_join, bucket_hash_join

    marg = marg.materialize()
    if marg.count() <= broadcast_threshold:
        ma = pa.concat_tables(
            list(marg.iter_batches(batch_format="pyarrow", batch_size=None))
        ).rename_columns(["item_a", "__ca"])
        mb = ma.rename_columns(["item_b", "__cb"])
        counts = broadcast_join(counts, ma, keys="item_a")
        counts = broadcast_join(counts, mb, keys="item_b")
    else:
        ma_ds = marg.map_batches(
            lambda t: t.rename_columns(["item_a", "__ca"]),
            batch_format="pyarrow", zero_copy_batch=True)
        mb_ds = marg.map_batches(
            lambda t: t.rename_columns(["item_b", "__cb"]),
            batch_format="pyarrow", zero_copy_batch=True)
        counts = bucket_hash_join(counts, ma_ds, on="item_a")
        counts = bucket_hash_join(counts, mb_ds, on="item_b")

    def finish(t: pa.Table) -> pa.Table:
        n_ab = t.column("n_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t.column("__ca").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("__cb").to_numpy(zero_copy_only=False).astype(np.float64)
        lift = n_ab * float(n_baskets) / (ca * cb)
        return pa.table({
            "item_a": t.column("item_a"),
            "item_b": t.column("item_b"),
            "n_ab": pc.cast(t.column("n_ab"), pa.int64()),
            "lift": pa.array(lift, pa.float64()),
        })

    return counts.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def grouped_skew_kurt(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group sample skewness and excess kurtosis (DuckDB ``skewness()``
    / ``kurtosis()`` ≡ pandas ``.skew()`` / ``.kurt()``: bias-corrected
    Fisher–Pearson g1 and Fisher g2).

    Distributed as power-sum partials (Σx, Σx², Σx³, Σx⁴, n) through the
    map-side combiner — the same accumulation DuckDB's own skew/kurt
    aggregate states carry, so post-ROUND parity holds. One tiny final
    exchange of per-(block, key) partials; rows never shuffle. Groups with
    n < 3 (skew) / n < 4 (kurt) or zero variance → SQL NULL.
    """

    def add_powers(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.float64())
        x2 = pc.multiply(x, x)
        return pa.table(
            {
                key: t.column(key),
                "__x": x,
                "__x2": x2,
                "__x3": pc.multiply(x2, x),
                "__x4": pc.multiply(x2, x2),
            }
        )

    partials = ds.map_batches(add_powers, batch_format="pyarrow", zero_copy_batch=True)
    sums = grouped_agg_fast(
        partials,
        keys=[key],
        specs=[
            ("s1", "__x", "sum"),
            ("s2", "__x2", "sum"),
            ("s3", "__x3", "sum"),
            ("s4", "__x4", "sum"),
            ("n", "__x", "count"),
        ],
        num_final_partitions=num_final_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        s3 = t.column("s3").to_numpy(zero_copy_only=False)
        s4 = t.column("s4").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1 / n
            m2 = s2 / n - mean * mean                        # biased central moments
            m3 = s3 / n - 3 * mean * s2 / n + 2 * mean**3
            m4 = s4 / n - 4 * mean * s3 / n + 6 * mean**2 * s2 / n - 3 * mean**4
            g1 = m3 / np.power(m2, 1.5)
            g2 = m4 / (m2 * m2) - 3.0
            skew = g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
            kurt = ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
        skew = np.where((n >= 3) & (m2 > 0), skew, np.nan)
        kurt = np.where((n >= 4) & (m2 > 0), kurt, np.nan)
        return pa.table(
            {
                key: t.column(key),
                "n": pc.cast(t.column("n"), pa.int64()),
                "skew": pa.array(skew, pa.float64(), from_pandas=True),
                "kurt": pa.array(kurt, pa.float64(), from_pandas=True),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_count_distinct(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    out_col: str = "n_distinct",
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Exact per-group COUNT(DISTINCT col): dedupe (key, col) pairs through
    the map-side combiner (each block contributes each distinct pair once),
    then count pairs per key. Both exchanges move only (distinct-pair) /
    (key, count) partials — never rows — so corpus-scale inputs with
    bounded per-block distinct pairs stream through. Nulls excluded (SQL
    COUNT(DISTINCT) semantics).
    """
    nonnull = ds.map_batches(
        lambda t: t.filter(t.column(col).is_valid()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = grouped_agg_fast(nonnull, keys=[key, col], specs=[])
    return grouped_agg_fast(
        pairs, keys=[key], specs=[(out_col, col, "count")],
        num_final_partitions=num_final_partitions,
    )


def rollup_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    sum_alias: str = "sum_v",
    count_alias: str = "n",
    num_final_partitions: int = 16,
    level_col: str | None = None,
) -> ray.data.Dataset:
    """SQL ``GROUP BY ROLLUP(k1, k2, …)``: every prefix grouping level plus
    the grand total, rolled-up keys emitted as NULL.

    Scans the input ONCE: the finest level runs through the map-side
    combiner; every coarser level re-aggregates the finest RESULT (already
    ≤ |k1×k2…| rows — partials, never rows, so the extra levels cost
    nothing at corpus scale; DuckDB does the same leaf-rollup internally).

    NULL-key caveat (SQL's own ROLLUP ambiguity): rolled-up levels mark
    keys with NULL, so a genuine NULL key value in the input is
    indistinguishable from a subtotal marker in the default output. Pass
    ``level_col`` to append the GROUPING()-style disambiguator — the
    number of rolled-up (suffix) keys on each row: 0 = finest level, …,
    len(keys) = grand total — whenever the key columns are nullable.
    """
    if not keys:
        raise ValueError("rollup_agg needs at least one key")
    finest = grouped_agg_fast(
        ds, keys=keys, specs=[(sum_alias, value_col, "sum")],
        count_alias=count_alias, num_final_partitions=num_final_partitions,
    ).materialize()  # ≤ key-cardinality rows; pinned because every coarser
    # level re-reads it (never the input scan)
    from .util import arrow_schema_of

    key_types: dict[str, pa.DataType] = {}
    finest, fschema = arrow_schema_of(finest)
    for k in keys:
        key_types[k] = fschema.field(k).type
    out_names = keys + [count_alias, sum_alias]
    if level_col:
        out_names.append(level_col)

    def null_fill(level_keys: list[str]):
        """Re-aggregate the finest table to ``level_keys``; NULL the rest."""
        def fn(t: pa.Table) -> pa.Table:
            if level_keys:
                gb = t.group_by(level_keys)
                res = gb.aggregate([(sum_alias, "sum"), (count_alias, "sum")])
                n_rows = res.num_rows
                cols = {k: (res.column(k) if k in level_keys
                            else pa.nulls(n_rows, key_types[k])) for k in keys}
                cols[count_alias] = res.column(f"{count_alias}_sum")
                cols[sum_alias] = res.column(f"{sum_alias}_sum")
            else:
                import pyarrow.compute as _pc2
                n_rows = 1
                cols = {k: pa.nulls(1, key_types[k]) for k in keys}
                cols[count_alias] = pa.array(
                    [_pc2.sum(t.column(count_alias)).as_py() or 0], pa.int64())
                # keep the FINEST level's sum dtype — a float64 literal here
                # would give the union blocks disagreeing schemas on
                # integer value columns
                cols[sum_alias] = pa.array(
                    [_pc2.sum(t.column(sum_alias)).as_py()],
                    fschema.field(sum_alias).type)
            if level_col:
                cols[level_col] = pa.array(
                    [len(keys) - len(level_keys)] * n_rows, pa.int64())
            return pa.table({n: cols[n] for n in out_names})
        return fn

    level0 = finest
    if level_col:
        level0 = level0.map_batches(
            lambda t: t.append_column(
                level_col, pa.array([0] * t.num_rows, pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
    levels = [level0.select_columns(out_names)]
    for i in range(len(keys) - 1, -1, -1):
        levels.append(
            finest.repartition(1).map_batches(
                null_fill(keys[:i]), batch_format="pyarrow", batch_size=None
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def approx_distinct_grouped(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    precision: int = 10,
    out_col: str = "approx_distinct",
) -> ray.data.Dataset:
    """Per-group approximate COUNT(DISTINCT col) via HyperLogLog — the
    grouped mirror of :func:`approx_distinct` (same hash, same rank math,
    same bias-corrected estimate; std-err ≈ 1.04/√2^precision ≈ 3.3% at
    precision 10).

    Map side: each block emits one 2^p-byte register row PER (block,
    distinct key) — bounded by key cardinality per block, never row count.
    Register rows co-locate by key hash and max-merge per key with one
    ``maximum.reduceat`` pass per partition (no per-key Python). The row
    payload is a fixed-size binary lane (ranks ≤ 55 fit uint8), so the
    exchange moves |keys|·2^p bytes total — the 100 TB-safe shape."""
    from .util import coarse_partitioned

    m = 1 << precision

    def sketch(t: pa.Table) -> pa.Table:
        import polars as _pl

        out_schema = pa.schema([
            pa.field(key, t.schema.field(key).type),
            pa.field("__regs", pa.binary(m)),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        from .util import null_safe_group_codes

        gidx, labels_of, n_groups = null_safe_group_codes(t.column(key))
        h = _pl.from_arrow(t.select([col])).hash_rows(seed=99).to_numpy()
        bucket = (h >> np.uint64(64 - precision)).astype(np.int64)
        rest = (h << np.uint64(precision)) | np.uint64(1 << (precision - 1))
        exp = ((rest.astype(np.float64)).view(np.uint64) >> np.uint64(52)) - np.uint64(1023)
        rank = (64 - exp.astype(np.int64)).clip(1, 64 - precision + 1)
        regs = np.zeros(n_groups * m, dtype=np.uint8)
        slots, ranks8 = gidx * m + bucket, rank.astype(np.uint8)
        if t.column(col).null_count:
            # SQL COUNT(DISTINCT col) excludes NULL values — mask them out
            # of the register scatter (not a row filter: a group whose
            # values are ALL null must still emit its key with estimate 0)
            vmask = pc.is_valid(t.column(col)).to_numpy(zero_copy_only=False)
            slots, ranks8 = slots[vmask], ranks8[vmask]
        np.maximum.at(regs, slots, ranks8)
        return pa.table({
            key: labels_of(np.arange(n_groups)),
            "__regs": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), n_groups, [None, pa.py_buffer(regs.tobytes())]),
        }, schema=out_schema)

    partials = ds.select_columns([key, col]).map_batches(
        sketch, batch_format="pyarrow", zero_copy_batch=True)

    alpha = 0.7213 / (1 + 1.079 / m)

    def merge_part(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(key, t.schema.field(key).type),
            pa.field(out_col, pa.int64()),
        ])
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        kcol = t.column(key).combine_chunks()
        order = pa.compute.sort_indices(pa.table({"k": kcol}), sort_keys=[("k", "ascending")])
        t = t.take(order)
        kcol = t.column(key).combine_chunks()
        from .util import null_safe_group_codes

        g, _, _ = null_safe_group_codes(kcol)  # null group merges as ONE key
        # read the FixedSizeBinary registers from the flat Arrow buffer —
        # one zero-copy view, not one Python bytes object per (block, key)
        rc = t.column("__regs").combine_chunks()
        flat = np.frombuffer(rc.buffers()[1], dtype=np.uint8)
        regs = flat[rc.offset * m:(rc.offset + n) * m].reshape(n, m)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        merged = np.maximum.reduceat(regs, starts, axis=0)
        est = alpha * m * m / np.sum(np.power(2.0, -merged.astype(np.float64)), axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            est = np.where(small, m * np.log(m / np.maximum(zeros, 1)), est)
        return pa.table({
            key: kcol.take(pa.array(starts, pa.int64())),
            out_col: pa.array(np.rint(est).astype(np.int64), pa.int64()),
        }, schema=out_schema)

    return coarse_partitioned(partials, key, merge_part)


def grouped_weighted_stats(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    weight_col: str,
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group weighted mean and population-weighted variance — the
    importance-weighted aggregate behind sample-weighted training stats.
    Carried as (Σw, Σwx, Σwx²) partials through the map-side combiner;
    rows never shuffle. Rows with null value OR null weight are excluded
    (SQL pairwise-deletion); zero total weight → NULL."""

    def add_products(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.float64())
        w = pc.cast(t.column(weight_col), pa.float64())
        both = pc.and_(x.is_valid(), w.is_valid())
        x = pc.if_else(both, x, pa.nulls(t.num_rows, pa.float64()))
        w = pc.if_else(both, w, pa.nulls(t.num_rows, pa.float64()))
        wx = pc.multiply(w, x)
        return pa.table({
            key: t.column(key),
            "__w": w,
            "__wx": wx,
            "__wx2": pc.multiply(wx, x),
        })

    partials = ds.map_batches(add_products, batch_format="pyarrow", zero_copy_batch=True)
    sums = grouped_agg_fast(
        partials, keys=[key],
        specs=[("sw", "__w", "sum"), ("swx", "__wx", "sum"), ("swx2", "__wx2", "sum")],
        num_final_partitions=num_final_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        sw = t.column("sw").to_numpy(zero_copy_only=False)
        swx = t.column("swx").to_numpy(zero_copy_only=False)
        swx2 = t.column("swx2").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            wmean = swx / sw
            wvar = swx2 / sw - wmean * wmean
        ok = sw > 0
        wmean = np.where(ok, wmean, np.nan)
        wvar = np.where(ok, np.maximum(wvar, 0.0), np.nan)
        return pa.table({
            key: t.column(key),
            "total_weight": t.column("sw"),
            "wmean": pa.array(wmean, pa.float64(), from_pandas=True),
            "wvar": pa.array(wvar, pa.float64(), from_pandas=True),
        })

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def group_vs_rest_ttest(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    digits: int = 6,
) -> ray.data.Dataset:
    """Welch's t-test of every group against the rest of the population —
    the drift / segment-anomaly screen ("does this source/type differ
    significantly?") a data-quality pipeline runs per batch. Output per
    group: (group, n, mean, t_stat, dof) with the Welch–Satterthwaite
    degrees of freedom; NULL t when either side has <2 samples or both
    variances are 0.

    Scale shape: one pass through the map-side combiner produces per-group
    (n, Σx, Σx²); the rest-of-population moments are the global totals
    minus the group's — no second scan, no shuffle beyond the #groups-row
    partial stream. All test arithmetic runs on the #groups-row table.
    """

    def with_sq(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        return pa.table({
            group_col: t.column(group_col),
            value_col: v,
            "__sq": pc.multiply(v, v),
        })

    sums = grouped_agg_fast(
        ds.select_columns([group_col, value_col]).map_batches(
            with_sq, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=[group_col],
        specs=[("s", value_col, "sum"), ("ss", "__sq", "sum"),
               ("n", value_col, "count")],
        num_final_partitions=1,  # #groups rows: one finalize task
    ).materialize()

    def finalize(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(group_col, t.schema.field(group_col).type),
            pa.field("n", pa.int64()),
            pa.field("mean", pa.float64()),
            pa.field("t_stat", pa.float64()),
            pa.field("dof", pa.float64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        n1 = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        ss1 = t.column("ss").to_numpy(zero_copy_only=False).astype(np.float64)
        N, S, SS = n1.sum(), s1.sum(), ss1.sum()
        n2, s2, ss2 = N - n1, S - s1, SS - ss1
        with np.errstate(invalid="ignore", divide="ignore"):
            m1 = s1 / n1
            m2 = np.where(n2 > 0, s2 / np.where(n2 > 0, n2, 1), np.nan)
            v1 = np.where(n1 > 1, (ss1 - n1 * m1 * m1) / (n1 - 1), np.nan)
            v2 = np.where(n2 > 1, (ss2 - n2 * m2 * m2) / (n2 - 1), np.nan)
            v1 = np.maximum(v1, 0.0)  # guard the one-ulp negative variance
            v2 = np.maximum(v2, 0.0)
            se2 = v1 / n1 + v2 / n2
            ok = (n1 >= 2) & (n2 >= 2) & (se2 > 0)
            tstat = np.where(ok, (m1 - m2) / np.sqrt(np.where(se2 > 0, se2, 1)),
                             np.nan)
            dof = np.where(
                ok,
                se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)),
                np.nan,
            )
        return pa.table({
            group_col: t.column(group_col),
            "n": pa.array(n1.astype(np.int64)),
            "mean": pa.array(np.round(m1, digits), pa.float64(), from_pandas=True),
            "t_stat": pa.array(np.round(tstat, digits), pa.float64(), from_pandas=True),
            "dof": pa.array(np.round(dof, digits), pa.float64(), from_pandas=True),
        })

    return sums.map_batches(finalize, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)


def psi_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    ts_col: str,
    cutoff_us: int,
    n_bins: int = 10,
    eps: float = 1e-6,
    digits: int = 6,
) -> ray.data.Dataset:
    """Population Stability Index per group between the reference period
    (``ts < cutoff``) and the current period (``ts >= cutoff``) — the
    standard feature-drift monitor of a feature store:
    ``PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i)`` over ``n_bins`` equal-width
    bins spanning the REFERENCE period's [min, max] (current-period values
    outside that span clamp into the edge bins; shares are floored at
    ``eps`` so empty bins stay finite). Rule of thumb: <0.1 stable,
    0.1–0.25 drifting, >0.25 shifted.

    Scale shape: pass 1 — per-group reference min/max through the
    combiner (#groups rows, broadcast back); pass 2 — per
    (group, period, bin) counts through the combiner (#groups × 2 ×
    n_bins partial rows); the PSI fold runs on that tiny table. The corpus
    is scanned twice and shuffled never.

    Output: (group, n_ref, n_cur, psi).
    """
    import ray as _ray

    base = ds.select_columns([group_col, value_col, ts_col])

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        ref = pc.less(ts, pa.scalar(cutoff_us, pa.int64()))
        out = pa.table({
            group_col: t.column(group_col),
            value_col: t.column(value_col),
            "__ref": ref,
        })
        # a NULL ts places the row in NEITHER period (SQL: ts < cutoff is
        # NULL, true in no CASE branch) and NULL values carry no bin mass —
        # drop both up front, before the rows cost exchange bytes
        keep = pc.and_(pc.is_valid(ref), pc.is_valid(t.column(value_col)))
        if not pc.all(keep).as_py():
            out = out.filter(keep)
        return out

    tagged = base.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    bounds = grouped_agg_fast(
        tagged.filter(expr="__ref == True"),
        keys=[group_col],
        specs=[("mn", value_col, "min"), ("mx", value_col, "max")],
    ).take_all()
    span = {r[group_col]: (float(r["mn"]), float(r["mx"])) for r in bounds}
    sref = _ray.put(span)

    def binify(t: pa.Table) -> pa.Table:
        sp = _ray.get(sref)
        out_schema = pa.schema([
            pa.field(group_col, t.schema.field(group_col).type),
            pa.field("__ref", pa.bool_()),
            pa.field("__bin", pa.int64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        # per-row Python only over the DICTIONARY (group-scale): span
        # bounds gather onto rows via the encoded indices
        enc = t.column(group_col).combine_chunks().dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        if enc.indices.null_count:
            # NULL group key = one group (SQL GROUP BY): route through an
            # appended sentinel dictionary slot, binned iff the null group
            # has a reference-period span like any other group
            idx = enc.indices.fill_null(len(dvals)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dvals = dvals + [None]
        else:
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        known_d = np.asarray([g in sp for g in dvals], dtype=bool)
        mn_d = np.asarray([sp[g][0] if g in sp else np.nan for g in dvals])
        mx_d = np.asarray([sp[g][1] if g in sp else np.nan for g in dvals])
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # groups with no reference period have no bin basis, and null/NaN
        # values carry no bin mass (SQL COUNT/aggregate null exclusion —
        # counting them as bin-0 probability would fabricate drift)
        keep = known_d[idx] & np.isfinite(v)
        if not keep.any():
            return out_schema.empty_table()
        v, mn, mx = v[keep], mn_d[idx[keep]], mx_d[idx[keep]]
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = (v - mn) / np.where(mx > mn, mx - mn, 1.0)
            b = np.floor(frac * n_bins)
        b = np.clip(np.where(np.isfinite(b), b, 0), 0, n_bins - 1).astype(np.int64)
        kept = t.filter(pa.array(keep))
        return pa.table({
            group_col: kept.column(group_col),
            "__ref": kept.column("__ref"),
            "__bin": pa.array(b),
        })

    counts = grouped_agg_fast(
        tagged.map_batches(binify, batch_format="pyarrow", zero_copy_batch=True),
        keys=[group_col, "__ref", "__bin"],
        specs=[],
        count_alias="n",
        num_final_partitions=1,
    ).materialize()

    def finalize(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(group_col, t.schema.field(group_col).type),
            pa.field("n_ref", pa.int64()),
            pa.field("n_cur", pa.int64()),
            pa.field("psi", pa.float64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        import collections

        gs = t.column(group_col).to_pylist()
        refs = t.column("__ref").to_pylist()
        bins = t.column("__bin").to_pylist()
        ns = t.column("n").to_pylist()
        agg: dict = collections.defaultdict(lambda: np.zeros((2, n_bins)))
        for g, r, b, n in zip(gs, refs, bins, ns):
            agg[g][0 if r else 1, b] += n
        # None (the SQL null group) is not orderable against real keys
        keys = sorted(agg, key=lambda g: (g is None, g))
        n_ref = np.array([agg[g][0].sum() for g in keys])
        n_cur = np.array([agg[g][1].sum() for g in keys])
        psi = []
        for i, g in enumerate(keys):
            p = agg[g][0] / n_ref[i] if n_ref[i] else np.zeros(n_bins)
            q = agg[g][1] / n_cur[i] if n_cur[i] else np.zeros(n_bins)
            p = np.maximum(p, eps)
            q = np.maximum(q, eps)
            psi.append(float(np.sum((p - q) * np.log(p / q))))
        return pa.table({
            group_col: pa.array(keys, t.schema.field(group_col).type),
            "n_ref": pa.array(n_ref.astype(np.int64)),
            "n_cur": pa.array(n_cur.astype(np.int64)),
            "psi": pa.array(np.round(psi, digits), pa.float64()),
        })

    return counts.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def ks_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    ts_col: str,
    cutoff_us: int,
    digits: int = 6,
) -> ray.data.Dataset:
    """Exact two-sample Kolmogorov–Smirnov statistic per group between the
    reference (``ts < cutoff``) and current (``ts >= cutoff``) periods —
    the binless companion to :func:`psi_by_group` (PSI needs bin choices;
    KS is the sup-norm ECDF distance, sensitive to any distributional
    change). NULL when either period is empty.

    Scale shape: ONE group-hash exchange co-locates each group
    (:func:`~.util.coarse_partitioned`); within a partition every group's
    D-statistic comes from one vectorized pass — lexsort by (group,
    value), segment-bounded cumulative counts, ECDF gap evaluated at
    value-run ends (the tie-correct evaluation points). Output:
    (group, n_ref, n_cur, ks_d).
    """
    from .util import coarse_partitioned

    base = ds.select_columns([group_col, value_col, ts_col])

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        ref = pc.less(ts, pa.scalar(cutoff_us, pa.int64()))
        out = pa.table({
            group_col: t.column(group_col),
            value_col: t.column(value_col),
            "__ref": ref,
        })
        # NULL ts / NULL value rows join neither sample — drop before the
        # group exchange (per_part re-guards for direct callers)
        keep = pc.and_(pc.is_valid(ref), pc.is_valid(t.column(value_col)))
        if not pc.all(keep).as_py():
            out = out.filter(keep)
        return out

    tagged = base.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(group_col, t.schema.field(group_col).type),
            pa.field("n_ref", pa.int64()),
            pa.field("n_cur", pa.int64()),
            pa.field("ks_d", pa.float64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        # null/NaN values join neither sample (scipy/SQL null exclusion) —
        # counting them would inflate one period's ECDF denominator and
        # report drift between identical non-null distributions; a NULL
        # __ref (NULL ts) places the row in neither period the same way
        vals = np.asarray(
            t.column(value_col).to_pandas(), dtype=np.float64)  # nulls→NaN
        keep = np.isfinite(vals)
        refc = t.column("__ref").combine_chunks()
        if refc.null_count:
            keep &= pc.is_valid(refc).to_numpy(zero_copy_only=False)
        if not keep.all():
            t = t.filter(pa.array(keep))
            vals = vals[keep]
        t = t.combine_chunks()
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        from .util import null_safe_group_codes

        g, labels_of, _ = null_safe_group_codes(t.column(group_col))
        v = vals
        ref = t.column("__ref").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, g))
        g, v, ref = g[order], v[order], ref[order]
        seg_first = np.concatenate(([0], np.flatnonzero(np.diff(g)) + 1))
        seg_last = np.concatenate((seg_first[1:] - 1, [n - 1]))
        cum_r = np.cumsum(ref)
        cum_c = np.cumsum(1 - ref)
        base_r = np.concatenate(([0], cum_r[seg_last[:-1]]))
        base_c = np.concatenate(([0], cum_c[seg_last[:-1]]))
        n_ref = cum_r[seg_last] - base_r
        n_cur = cum_c[seg_last] - base_c
        # ECDF gap at value-RUN ends (ties evaluated after all equal values)
        run_end = np.concatenate((
            (np.diff(g) != 0) | (np.diff(v) != 0), [True]))
        ends = np.flatnonzero(run_end)
        seg_of_end = g[ends]  # dictionary codes are per-partition segments
        # map each end to its segment's base + totals
        seg_index = np.searchsorted(g[seg_first], seg_of_end)
        with np.errstate(invalid="ignore", divide="ignore"):
            fr = (cum_r[ends] - base_r[seg_index]) / np.where(
                n_ref[seg_index] > 0, n_ref[seg_index], np.nan)
            fc = (cum_c[ends] - base_c[seg_index]) / np.where(
                n_cur[seg_index] > 0, n_cur[seg_index], np.nan)
            gap = np.abs(fr - fc)
        # per-segment max over its run-ends
        first_end_of_seg = np.searchsorted(ends, seg_first)
        with np.errstate(invalid="ignore"):
            d = np.maximum.reduceat(np.where(np.isnan(gap), -np.inf, gap),
                                    first_end_of_seg)
        valid = (n_ref > 0) & (n_cur > 0)
        d = np.where(valid & np.isfinite(d), np.round(d, digits), np.nan)
        keys = labels_of(g[seg_first])
        return pa.table({
            group_col: keys,
            "n_ref": pa.array(n_ref),
            "n_cur": pa.array(n_cur),
            "ks_d": pa.array(d, pa.float64(), from_pandas=True),
        })

    return coarse_partitioned(tagged, group_col, per_part)
