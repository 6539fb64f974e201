"""Feature-scaling transforms: per-group standardization and global
quantile bucketizing.

The reference normalizes per-signal (z-score/robust scalers,
02_audio_preprocessing_experiment/.../processor.py preprocessing chain);
these are the corpus-level siblings a feature-engineering pipeline needs:
scale a column against ITS GROUP's statistics, or discretize it against the
GLOBAL distribution — both as two-phase streaming shapes (tiny stats pass →
broadcast → vectorized map), never a per-row Python loop and never a
driver-side collect of data rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .aggregates import exact_quantiles, grouped_agg_fast
from .joins import broadcast_join, bucket_hash_join


def _null_safe_stats_join(
    big: ray.data.Dataset,
    stats: ray.data.Dataset,
    key: str,
    method: str = "broadcast",
) -> ray.data.Dataset:
    """Join a per-group stats table back onto its rows with SQL PARTITION BY
    null semantics: the NULL group matches its OWN stats row (a plain
    equi-join would orphan it). Joins on the non-null surrogate pair from
    ``_null_safe_key_encode`` — same pattern as ``mad_grouped`` — and strips
    the surrogates so callers see their original schema + stats columns."""
    from .util import _null_safe_key_encode

    encode, flag_cols, val_cols = _null_safe_key_encode([key])
    surrogates = [flag_cols[0], val_cols[0]]
    big_e = big.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
    stats_e = stats.map_batches(lambda t: encode(t).drop_columns([key]),
                                batch_format="pyarrow", zero_copy_batch=True)
    if method == "broadcast":
        joined = broadcast_join(big_e, stats_e, keys=surrogates,
                                join_type="left outer")
    else:
        # corpus-scale key sets: Ray-native hash join takes composite keys
        # (bucket_hash_join is single-key); Ray spells the join type with
        # an underscore, unlike pyarrow's "left outer"
        from .joins import hash_join

        joined = hash_join(big_e, stats_e, on=tuple(surrogates),
                           join_type="left_outer", num_partitions=16)
    return joined.map_batches(lambda t: t.drop_columns(surrogates),
                              batch_format="pyarrow", zero_copy_batch=True)


def group_standardize(
    ds: ray.data.Dataset,
    key: str,
    cols: list[str],
    suffix: str = "_z",
    method: str = "broadcast",
) -> ray.data.Dataset:
    """Append ``{c}{suffix} = (c - mean_g(c)) / stddev_pop_g(c)`` per group.

    Phase 1 computes per-group mean and mean-of-squares through
    :func:`grouped_agg_fast` (map-side combine; partials bounded by
    #blocks x #keys-per-block, never rows). Phase 2 joins the |keys|-row
    stats table back: ``method='broadcast'`` ships it once via ``ray.put``
    (right for up to ~millions of keys); ``method='shuffle'`` routes through
    :func:`bucket_hash_join` when the key set itself is corpus-scale.
    Zero-variance groups yield null (SQL ``/ NULLIF(stddev_pop, 0)``), null
    inputs stay null, and the population std matches ``STDDEV_POP`` — the
    oracle-checked convention.
    """
    if method not in ("broadcast", "shuffle"):
        raise ValueError(method)

    def add_squares(t: pa.Table) -> pa.Table:
        for c in cols:
            x = pc.cast(t.column(c), pa.float64())
            t = t.append_column("__sq_" + c, pc.multiply(x, x))
        return t

    specs = []
    for c in cols:
        specs.append((f"__m1_{c}", c, "mean"))
        specs.append((f"__m2_{c}", "__sq_" + c, "mean"))
    stats = grouped_agg_fast(
        ds.map_batches(add_squares, batch_format="pyarrow", zero_copy_batch=True),
        keys=[key],
        specs=specs,
    )

    def finish(t: pa.Table) -> pa.Table:
        out = {c: t.column(c) for c in t.column_names}
        for c in cols:
            m1 = t.column(f"__m1_{c}").to_numpy(zero_copy_only=False)
            m2 = t.column(f"__m2_{c}").to_numpy(zero_copy_only=False)
            var = np.maximum(m2 - m1 * m1, 0.0)
            x = pc.cast(t.column(c), pa.float64()).to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore", divide="ignore"):
                z = (x - m1) / np.sqrt(var)
            out[c + suffix] = pa.array(np.where(np.isfinite(z), z, np.nan), pa.float64())
        drop = [f"__m1_{c}" for c in cols] + [f"__m2_{c}" for c in cols]
        tbl = pa.table(out)
        # nan -> null so zero-variance / null-input rows read as SQL nulls
        for c in cols:
            i = tbl.schema.get_field_index(c + suffix)
            arr = tbl.column(i)
            tbl = tbl.set_column(
                i, c + suffix, pc.if_else(pc.is_nan(arr), pa.nulls(len(arr), pa.float64()), arr)
            )
        return tbl.drop_columns(drop + ["__sq_" + c for c in cols if "__sq_" + c in tbl.column_names])

    with_sq = ds.map_batches(add_squares, batch_format="pyarrow", zero_copy_batch=True)
    # surrogate-keyed join-back: the NULL group standardizes against its
    # own stats (SQL PARTITION BY — a NULL key is one partition)
    joined = _null_safe_stats_join(with_sq, stats, key, method=method)
    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def quantile_bucketize(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    out_col: str = "bucket",
) -> ray.data.Dataset:
    """Append ``out_col`` = the number of global ``qs``-quantile boundaries
    at or below ``col`` (0 .. len(qs)) — distribution-aware discretization
    (quartile/decile feature binning).

    Boundaries come from :func:`exact_quantiles` (distributed single-column
    sort + streaming rank scan; the driver holds ``len(qs)`` floats, never
    the column) and are applied with one ``searchsorted`` per batch. Null
    inputs get a null bucket. Swap in ``approx_quantiles`` boundaries for
    the sketch path at extreme scale; the exact path is the oracle-checked
    one (DuckDB ``quantile_cont`` agrees bit-for-bit on the gate data).
    """
    # SQL quantile_cont ignores nulls; exact_quantiles ranks over every row,
    # so drop nulls before the boundary pass
    nonnull = ds.map_batches(
        lambda t: t.filter(t.column(col).is_valid()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bounds = np.asarray(exact_quantiles(nonnull, col, qs), dtype=np.float64)

    def assign(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.float64()).to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, x, side="right").astype(np.int64)
        valid = t.column(col).is_valid()
        arr = pc.if_else(valid, pa.array(b, pa.int64()), pa.nulls(t.num_rows, pa.int64()))
        return t.append_column(out_col, arr)

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

def target_encode(
    ds: ray.data.Dataset,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    out_col: str | None = None,
    method: str = "broadcast",
) -> ray.data.Dataset:
    """Smoothed mean-target encoding: append
    ``(Σ_g target + m·μ) / (n_g + m)`` per category — the classic
    categorical-to-numeric feature transform, with additive smoothing toward
    the global mean so rare categories don't memorize their targets.

    Phase 1: per-category (Σ target, non-null count) via
    :func:`~.aggregates.grouped_agg_fast` map-side combine. The global mean
    μ = ΣΣ/Σn falls out of the SAME partials (no second data pass). Phase 2
    joins the |categories|-row encoding table back — broadcast for
    broadcastable cardinalities, a composite-key hash join when the
    category set is itself corpus-scale. A NULL category is its OWN level
    (SQL GROUP BY: one NULL group — missingness is signal) and gets its
    own smoothed encoding; categories never seen with a non-null target
    get the smoothed prior μ, the n_g→0 limit of the formula.
    """
    if method not in ("broadcast", "shuffle"):
        raise ValueError(method)
    out_name = out_col or (cat_col + "_te")

    stats = grouped_agg_fast(
        ds.select_columns([cat_col, target_col]),
        keys=[cat_col],
        specs=[("__s", target_col, "sum"), ("__n", target_col, "count")],
    )
    blocks = [b for b in ray.get(stats.to_arrow_refs()) if b.num_rows > 0]
    if blocks:
        stat_tbl = pa.concat_tables(blocks).combine_chunks()
        s = pc.cast(stat_tbl.column("__s"), pa.float64()).to_numpy(zero_copy_only=False)
        n = pc.cast(stat_tbl.column("__n"), pa.float64()).to_numpy(zero_copy_only=False)
        # A category whose targets are ALL null has n_g == 0 and a null sum
        # (NaN after cast). Treat its sum as 0 so the n_g -> 0 limit of the
        # formula yields the smoothed prior mu instead of one NaN sum
        # poisoning mu (and through it every category's encoding).
        s = np.where(n > 0, np.nan_to_num(s, nan=0.0), 0.0)
        total_n = float(n.sum())
        mu = float(s.sum() / total_n) if total_n > 0 else 0.0
        enc = (s + smoothing * mu) / (n + smoothing)
        enc_tbl = pa.table({cat_col: stat_tbl.column(cat_col),
                            out_name: pa.array(enc, pa.float64())})
    else:
        mu = 0.0
        enc_tbl = pa.table({cat_col: pa.array([], pa.string()),
                            out_name: pa.array([], pa.float64())})
    enc_ds = ray.data.from_arrow(enc_tbl)

    joined = _null_safe_stats_join(ds, enc_ds, cat_col, method=method)

    prior = mu  # smoothed limit for unseen categories (n_g -> 0)

    def fill_prior(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(out_name)
        arr = pc.cast(t.column(i), pa.float64())
        return t.set_column(
            i, out_name, pc.fill_null(arr, pa.scalar(prior, pa.float64()))
        )

    return joined.map_batches(fill_prior, batch_format="pyarrow", zero_copy_batch=True)


def group_share(
    ds: ray.data.Dataset,
    key: str,
    cols: list[str],
    suffix: str = "_share",
) -> ray.data.Dataset:
    """Append ``{c}{suffix} = c / sum_g(c)`` — each row's share of its
    group's total (SQL ``value / SUM(value) OVER (PARTITION BY key)``).
    Same two-phase shape as :func:`group_standardize`: per-group sums
    through the map-side combiner, |keys|-row stats broadcast back, one
    vectorized divide. Zero/null group sums yield null."""
    specs = [(f"__s_{c}", c, "sum") for c in cols]
    stats = grouped_agg_fast(ds, keys=[key], specs=specs)

    def finish(t: pa.Table) -> pa.Table:
        out = {c: t.column(c) for c in t.column_names}
        for c in cols:
            s = t.column(f"__s_{c}").to_numpy(zero_copy_only=False)
            x = pc.cast(t.column(c), pa.float64()).to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore", divide="ignore"):
                sh = x / s
            out[c + suffix] = pa.array(
                np.where(np.isfinite(sh), sh, np.nan), pa.float64(), from_pandas=True
            )
        tbl = pa.table(out)
        for c in cols:
            i = tbl.schema.get_field_index(c + suffix)
            arr = tbl.column(i)
            tbl = tbl.set_column(
                i, c + suffix,
                pc.if_else(pc.is_nan(arr), pa.nulls(len(arr), pa.float64()), arr),
            )
        return tbl.drop_columns([f"__s_{c}" for c in cols])

    # NULL group keys share against their own group total (PARTITION BY)
    joined = _null_safe_stats_join(ds, stats, key)
    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def winsorize(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    suffix: str = "_wins",
) -> ray.data.Dataset:
    """Per-group winsorization: clip ``col`` to its group's exact
    ``[lo, hi]`` quantiles (``quantile_cont`` interpolation — matches the
    oracle-checked grouped-percentile convention). Phase 1: per-group sorted
    interpolation (one groupby over values only); phase 2: |keys|-row bounds
    broadcast back, vectorized clip. The outlier-taming step of a feature
    pipeline (reference analog: the robust-IQR / clip normalizers,
    02_audio_preprocessing_experiment processor chain).

    NULL group keys form ONE group (SQL PARTITION BY): the bounds pass is
    null-safe and the join-back matches the NULL group to its OWN bounds
    via the surrogate pair, so null-key rows clip like any others; a NULL
    value stays NULL."""

    def per_group(group: pa.Table) -> pa.Table:
        v = group.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.sort(v[~np.isnan(v)])
        out = {key: [group.column(key)[0].as_py()]}
        for name, q in (("__qlo", lo), ("__qhi", hi)):
            if len(v) == 0:
                out[name] = [None]
                continue
            pos = q * (len(v) - 1)
            l, h = int(np.floor(pos)), int(np.ceil(pos))
            out[name] = [float(v[l] + (v[h] - v[l]) * (pos - l))]
        return pa.table({
            key: pa.array(out[key], group.schema.field(key).type),
            "__qlo": pa.array(out["__qlo"], pa.float64()),
            "__qhi": pa.array(out["__qhi"], pa.float64()),
        })

    from .util import null_safe_map_groups

    bounds = null_safe_map_groups(
        ds.select_columns([key, col]), key, per_group
    )

    def finish(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.float64()).to_numpy(zero_copy_only=False)
        ql = t.column("__qlo").to_numpy(zero_copy_only=False)
        qh = t.column("__qhi").to_numpy(zero_copy_only=False)
        w = np.minimum(np.maximum(x, ql), qh)
        return t.drop_columns(["__qlo", "__qhi"]).append_column(
            col + suffix, pa.array(w, pa.float64(), from_pandas=True)
        )

    joined = _null_safe_stats_join(ds, bounds, key)
    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def impute_group_mean(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    out_col: str | None = None,
    num_final_partitions: int = 16,
) -> ray.data.Dataset:
    """Null imputation by per-group mean — the standard tabular-feature
    cleanup step. Grouped (Σ, n) partials map-side combined, the small
    per-group mean table broadcast back (same scale shape as
    :func:`group_standardize`); groups whose values are ALL null stay null
    (SQL AVG semantics)."""
    out_col = out_col or f"{col}_imputed"
    means = grouped_agg_fast(
        ds, keys=[key], specs=[(f"__mean_{col}", col, "mean")],
        num_final_partitions=num_final_partitions,
    )
    # the NULL group imputes from its own mean (SQL PARTITION BY)
    joined = _null_safe_stats_join(ds, means, key)

    def fill(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.float64())
        m = pc.cast(t.column(f"__mean_{col}"), pa.float64())
        return t.append_column(out_col, pc.coalesce(x, m)) \
                .drop_columns([f"__mean_{col}"])

    return joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
