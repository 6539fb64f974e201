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
    return ds.groupby(key).aggregate(*aggs)


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
    """Exact distinct count: groupby-key shuffle then count (A9)."""
    return ds.groupby(col).count().count()


def exact_quantiles(ds: ray.data.Dataset, col: str, qs: list[float]) -> list[float]:
    """Exact quantiles with linear interpolation (SQL ``quantile_cont``).

    Distributed sort on the single projected column, then a streaming scan of
    sorted batches that only keeps the values at the target ranks — the driver
    never holds the column.
    """
    n = ds.count()
    if n == 0:
        return [float("nan")] * len(qs)
    sorted_ds = ds.select_columns([col]).sort(col)
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
