"""Corpus-level feature evaluation report — the FeatureEvaluator recast
(SURVEY.md §2.6 A1/A2/A4/A5; evaluation/evaluator.py:16-206).

Unlike the reference — which unions dict keys and materializes every value
list in driver RAM (evaluator.py:29-49) — statistics run as distributed
partial+final aggregates; only the small final report reaches the driver.
The JSON report sink is the K4 analog (evaluator.py:136-140).
"""

from __future__ import annotations

import json
import os

import ray.data
from ..stages.aggregates import exact_quantiles


def _det_moments(ds: ray.data.Dataset, cols: list[str]) -> dict:
    """Per-column (count, sum, sumsq, min, max) via one distributed pass of
    per-block partials, folded on the driver with SORTED summation — the
    result is bit-identical no matter the block arrival order (Ray's native
    ``ds.aggregate`` merges partials in streaming-completion order, which
    made repeated report runs differ in the last ulp)."""
    import numpy as np
    import pyarrow as pa

    def partials(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {"n_rows": [t.num_rows]}
        for c in cols:
            x = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[~np.isnan(x)]
            out[f"{c}__n"] = [float(len(x))]
            out[f"{c}__sum"] = [float(x.sum()) if len(x) else 0.0]
            out[f"{c}__sumsq"] = [float((x * x).sum()) if len(x) else 0.0]
            out[f"{c}__min"] = [float(x.min()) if len(x) else np.inf]
            out[f"{c}__max"] = [float(x.max()) if len(x) else -np.inf]
        return pa.table(out)

    parts = list(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if not parts:
        return {"n_rows": 0, **{f"{c}_{s}": None for c in cols
                                for s in ("n", "sum", "sumsq", "min", "max")}}
    pt = pa.concat_tables(parts)

    def ssum(name: str) -> float:
        v = np.sort(pt.column(name).to_numpy(zero_copy_only=False))
        return float(v.sum())

    out: dict[str, float] = {"n_rows": int(ssum("n_rows"))}
    for c in cols:
        out[f"{c}_n"] = ssum(f"{c}__n")
        out[f"{c}_sum"] = ssum(f"{c}__sum")
        out[f"{c}_sumsq"] = ssum(f"{c}__sumsq")
        mn = float(pt.column(f"{c}__min").to_numpy(zero_copy_only=False).min())
        mx = float(pt.column(f"{c}__max").to_numpy(zero_copy_only=False).max())
        out[f"{c}_min"] = mn if np.isfinite(mn) else None
        out[f"{c}_max"] = mx if np.isfinite(mx) else None
    return out


def feature_statistics(ds: ray.data.Dataset, cols: list[str]) -> dict:
    """A1: per-feature min/max/mean/std over the corpus (one deterministic
    pass; see :func:`_det_moments`). Std uses ddof=1 like Ray's ``Std``."""
    import math

    m = _det_moments(ds, cols)
    rep: dict = {"n_rows": m["n_rows"]}
    for c in cols:
        n = m[f"{c}_n"] or 0.0
        rep[f"{c}_min"] = m[f"{c}_min"]
        rep[f"{c}_max"] = m[f"{c}_max"]
        if n >= 1:
            mean = m[f"{c}_sum"] / n
            rep[f"{c}_mean"] = mean
            var = max(0.0, (m[f"{c}_sumsq"] - n * mean * mean) / (n - 1)) if n > 1 else 0.0
            rep[f"{c}_std"] = math.sqrt(var)
        else:
            rep[f"{c}_mean"] = None
            rep[f"{c}_std"] = None
    return rep


def quality_rates(ds: ray.data.Dataset, flag_cols: list[str], score_col: str | None) -> dict:
    """A2: fraction-true per boolean flag + mean quality score (the
    '%files passing each check' table, evaluator.py:57-99); deterministic
    fold like :func:`feature_statistics`."""

    import pyarrow as pa
    import pyarrow.compute as pc

    def to_float(t: pa.Table) -> pa.Table:
        out = {}
        for c in flag_cols:
            out[c] = pc.cast(t.column(c), pa.float64())
        if score_col:
            out[score_col] = t.column(score_col)
        return pa.table(out)

    cols = list(flag_cols) + ([score_col] if score_col else [])
    m = _det_moments(
        ds.map_batches(to_float, batch_format="pyarrow", zero_copy_batch=True), cols
    )
    rep: dict = {"n_rows": m["n_rows"]}
    for c in flag_cols:
        n = m[f"{c}_n"] or 0.0
        rep[f"{c}_rate"] = (m[f"{c}_sum"] / n) if n else None
    if score_col:
        n = m[f"{score_col}_n"] or 0.0
        rep[f"{score_col}_mean"] = (m[f"{score_col}_sum"] / n) if n else None
    return rep


def generate_evaluation_report(
    ds: ray.data.Dataset,
    stat_cols: list[str],
    flag_cols: list[str],
    score_col: str | None = "quality_score",
    quantile_col: str | None = None,
    out_path: str | None = None,
) -> dict:
    """Full report: statistics + quality rates + optional distribution
    percentiles (A4, evaluator.py:149-206); JSON sink when ``out_path``."""
    ok = ds.filter(expr="status == 'ok'") if "status" in ds.schema().names else ds
    ok = ok.materialize()  # reused by three aggregate passes
    report = {
        "feature_statistics": feature_statistics(ok, stat_cols),
        "quality_metrics": quality_rates(ok, flag_cols, score_col),
    }
    if quantile_col:
        p25, p50, p75 = exact_quantiles(ok, quantile_col, [0.25, 0.5, 0.75])
        report["distribution"] = {f"{quantile_col}_p25": p25,
                                  f"{quantile_col}_p50": p50,
                                  f"{quantile_col}_p75": p75}
    if out_path:
        tmp = f"{out_path}.tmp"
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(report, f, indent=2, default=float)
        os.replace(tmp, out_path)
    return report


def compare_reports(baseline: dict, improved: dict) -> dict:
    """J5: explicit baseline-vs-improved comparison — per-metric delta and
    relative change between two evaluation reports (the reference's
    baseline-vs-current intent: committed golden baselines under
    04_feature_extraction_experiment/baseline/ plus the summary reporting in
    05_dtw_alignment_experiment/dtw_alignment.py:1504-1567).

    Input: two dicts as returned by :func:`generate_evaluation_report`
    (section → {metric: value}). Output: {section.metric: {baseline,
    improved, delta, rel_change}} for every metric present in BOTH, plus
    ``only_in_baseline`` / ``only_in_improved`` name lists — a schema drift
    between runs is surfaced, never silently dropped.
    """

    def flat(rep: dict) -> dict[str, float]:
        out = {}
        for section, vals in rep.items():
            if isinstance(vals, dict):
                for k, v in vals.items():
                    try:
                        out[f"{section}.{k}"] = float(v)
                    except (TypeError, ValueError):
                        continue
        return out

    fb, fi = flat(baseline), flat(improved)
    common = sorted(fb.keys() & fi.keys())
    cmp = {}
    for k in common:
        b, i = fb[k], fi[k]
        cmp[k] = {
            "baseline": b,
            "improved": i,
            "delta": i - b,
            "rel_change": (i - b) / abs(b) if b != 0 else (0.0 if i == 0 else float("inf")),
        }
    return {
        "metrics": cmp,
        "only_in_baseline": sorted(fb.keys() - fi.keys()),
        "only_in_improved": sorted(fi.keys() - fb.keys()),
    }
