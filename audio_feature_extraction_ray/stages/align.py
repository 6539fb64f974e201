"""Pairwise temporal alignment: constrained DTW over per-entity feature
sequences — the literal recast of the reference's core alignment operator
(J4, 05_dtw_alignment_experiment/dtw_alignment.py).

The reference aligns teacher/student frame sequences with a banded DTW
(constrained cost matrix :930-969, path find :971-1090 with monotonic
enforcement :1087-1088) and scores alignment error in milliseconds against
acceptance thresholds (RMSE <= 200 ms, correspondence >= 95% within ±250 ms,
:1092-1193, 1137-1141). Here:

- the per-pair DP runs inside ``groupby(pair).map_groups`` — pair state never
  leaves one task (the reference's serial per-pair loop :1299-1332 recast as
  a shuffle-parallel stage),
- sequences are the per-entity embedding timelines produced by the feature
  stage (frame axis = event ``ts``),
- scoring reuses the reference's acceptance thresholds verbatim.

Pure-NumPy DP, O(T1 * band) time/memory via a Sakoe–Chiba band.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .similarity import _drop_null_embeddings, _stack_embeddings
from .util import arrow_schema_of, round_half_away

RMSE_STANDARD_MS = 200.0  # reference: 05/dtw_alignment.py:1137-1141
CORRESPONDENCE_TOL_MS = 250.0
CORRESPONDENCE_STANDARD = 0.95


def _banded_dtw(
    a: np.ndarray, b: np.ndarray, lo: np.ndarray, hi: np.ndarray
) -> list[tuple[int, int]]:
    """Banded DTW core over per-row windows, fully vectorized per row and
    with **O(Σ band widths) memory** — only the in-band cells of each DP row
    are stored (one flat ragged array + per-row offsets), never the full
    (T1+1)×(T2+1) accumulator, so a 100k-frame pair at band 5% costs ~4 GB →
    ~0.5 GB·band_frac, the bound the banded/multiscale variants advertise.

    ``lo[i]``/``hi[i]`` are the inclusive 1-based DP-column window of row
    ``i+1``. The recurrence
    ``acc[i,j] = c[j] + min(acc[i-1,j], acc[i-1,j-1], acc[i,j-1])`` looks
    serial in j (the horizontal term), but expanding the horizontal chain
    gives ``acc[i,j] = C[j] + min_{k<=j}(m[k] - C[k-1])`` with
    ``m = min(up, diag)`` and ``C`` the band-local cost prefix sum — one
    cumsum + one running min, no per-cell Python. Cells outside a row's
    band read as +inf, so the horizontal entry INTO the band is correctly
    absent.

    Equivalence contract: the prefix-sum reassociation shifts ``acc``
    values by O(eps · row length) relative to the cell-by-cell fold, so
    on EXACT ties (repeated frames, quantized features) the backtrack may
    pick a DIFFERENT cost-optimal path than the serial DP would. Path
    COST is equal to fp tolerance, the path is always a valid monotonic
    warping, and the result is deterministic run-to-run — which is what
    the alignment metrics and the rows-only gate require. Pinned in
    pytest as cost/validity/determinism, not exact path identity."""
    t1, t2 = len(a), len(b)
    inf = np.inf
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    widths = hi - lo + 1
    off = np.concatenate(([0], np.cumsum(widths)))
    flat = np.empty(int(off[-1]), dtype=np.float64)
    prev_lo, prev_vals = 0, np.zeros(1)  # virtual row 0: acc[0,0]=0, rest inf
    for i in range(1, t1 + 1):
        j_lo, j_hi = int(lo[i - 1]), int(hi[i - 1])
        w = j_hi - j_lo + 1
        idx_u = np.arange(j_lo, j_hi + 1) - prev_lo
        u = np.full(w, inf)
        vu = (idx_u >= 0) & (idx_u < len(prev_vals))
        u[vu] = prev_vals[idx_u[vu]]
        d = np.full(w, inf)
        idx_d = idx_u - 1
        vd = (idx_d >= 0) & (idx_d < len(prev_vals))
        d[vd] = prev_vals[idx_d[vd]]
        costs = np.linalg.norm(a[i - 1][None, :] - b[j_lo - 1 : j_hi], axis=1)
        C = np.cumsum(costs)
        shifted = np.concatenate(([0.0], C[:-1]))
        row = C + np.minimum.accumulate(np.minimum(u, d) - shifted)
        flat[off[i - 1] : off[i]] = row
        prev_lo, prev_vals = j_lo, row

    def val(i: int, j: int) -> float:
        if i == 0:
            return 0.0 if j == 0 else inf
        r_lo, r_hi = int(lo[i - 1]), int(hi[i - 1])
        if r_lo <= j <= r_hi:
            return float(flat[off[i - 1] + j - r_lo])
        return inf

    path = []
    i, j = t1, t2
    if not np.isfinite(val(i, j)):
        # clamp to the best reachable end cell in the last row
        last = flat[off[t1 - 1] : off[t1]]
        j = int(lo[t1 - 1] + np.argmin(last))
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = [(val(i - 1, j - 1), i - 1, j - 1), (val(i - 1, j), i - 1, j),
                 (val(i, j - 1), i, j - 1)]
        _, i, j = min(moves, key=lambda m: m[0])
    path.reverse()
    return path


def dtw_align(
    a: np.ndarray, b: np.ndarray, band_frac: float = 0.2
) -> list[tuple[int, int]]:
    """Banded DTW between feature sequences a (T1, D) and b (T2, D).

    Returns the monotonic alignment path [(i, j), ...]. Euclidean local cost;
    Sakoe–Chiba band of width ``band_frac * max(T1, T2)`` (the reference's
    window constraint, 05/dtw_alignment.py:737-787).
    """
    t1, t2 = len(a), len(b)
    if t1 == 0 or t2 == 0:
        return []
    band = max(1, int(band_frac * max(t1, t2)))
    if t1 > 1:
        center = np.rint(np.arange(t1) * (t2 - 1) / (t1 - 1)).astype(np.int64) + 1
    else:
        center = np.ones(1, dtype=np.int64)
    lo = np.maximum(1, center - band)
    hi = np.minimum(t2, center + band)
    return _banded_dtw(a, b, lo, hi)


def evaluate_alignment(
    path: list[tuple[int, int]],
    ts_a_us: np.ndarray,
    ts_b_us: np.ndarray,
) -> dict[str, float]:
    """Alignment quality in milliseconds — the reference's evaluation
    (RMSE / correspondence within ±250 ms, 05/dtw_alignment.py:1092-1193),
    with the frame axis replaced by real event timestamps."""
    if not path:
        return {
            "rmse_ms": float("inf"),
            "correspondence": 0.0,
            "path_len": 0.0,
            "meets_rmse": False,
            "meets_correspondence": False,
        }
    # compare relative offsets so absolute epoch differences don't count
    a0, b0 = ts_a_us[0], ts_b_us[0]
    diffs_ms = np.array(
        [((ts_a_us[i] - a0) - (ts_b_us[j] - b0)) / 1000.0 for i, j in path], dtype=np.float64
    )
    rmse = float(np.sqrt(np.mean(diffs_ms**2)))
    corr = float(np.mean(np.abs(diffs_ms) <= CORRESPONDENCE_TOL_MS))
    return {
        "rmse_ms": rmse,
        "correspondence": corr,
        "path_len": float(len(path)),
        "meets_rmse": bool(rmse <= RMSE_STANDARD_MS),
        "meets_correspondence": bool(corr >= CORRESPONDENCE_STANDARD),
    }


def _project_band(
    coarse_path: list[tuple[int, int]], t1: int, t2: int, factor: int, radius: int
) -> np.ndarray:
    """Project a coarse-resolution DTW path to fine resolution: per fine row i,
    the [j_lo, j_hi] window the refined DP may visit (coarse cell ± radius,
    reference's multi-scale projection, 05/dtw_alignment.py:669-701)."""
    lo = np.full(t1, t2, dtype=np.int64)
    hi = np.full(t1, -1, dtype=np.int64)
    for ci, cj in coarse_path:
        i0, i1 = ci * factor, min((ci + 1) * factor, t1)
        j0 = max(0, (cj - radius) * factor)
        j1 = min(t2 - 1, (cj + 1 + radius) * factor - 1)
        lo[i0:i1] = np.minimum(lo[i0:i1], j0)
        hi[i0:i1] = np.maximum(hi[i0:i1], j1)
    # fill any rows the coarse path skipped (t1 not divisible by factor)
    lo = np.minimum.accumulate(lo[::-1])[::-1]
    hi = np.maximum.accumulate(hi)
    lo = np.clip(lo, 0, t2 - 1)
    hi = np.clip(hi, 0, t2 - 1)
    return np.stack([lo, hi], axis=1)


def dtw_align_multiscale(
    a: np.ndarray,
    b: np.ndarray,
    factor: int = 4,
    min_size: int = 64,
    band_frac: float = 0.2,
    radius: int = 2,
) -> list[tuple[int, int]]:
    """Coarse-to-fine banded DTW (the reference's multi-scale alignment,
    05/dtw_alignment.py:669-701): recursively align ``factor``-downsampled
    sequences, then refine inside a tube around the projected coarse path.
    O(T·factor·radius) instead of O(T·band) per level — the long-sequence
    path; falls back to :func:`dtw_align` below ``min_size``.
    """
    t1, t2 = len(a), len(b)
    if t1 <= min_size or t2 <= min_size:
        return dtw_align(a, b, band_frac)
    coarse = dtw_align_multiscale(a[::factor], b[::factor], factor, min_size, band_frac, radius)
    if not coarse:
        return dtw_align(a, b, band_frac)
    win = _project_band(coarse, t1, t2, factor, radius)
    return _banded_dtw(a, b, win[:, 0] + 1, win[:, 1] + 1)


def smooth_path(path: list[tuple[int, int]], width: int = 3) -> list[tuple[int, int]]:
    """Median-smooth the path's j-axis then re-enforce monotonicity — the
    reference's path post-processing (05/dtw_alignment.py:789-849, monotonic
    enforcement :1087-1088). Keeps endpoints fixed."""
    if len(path) <= width:
        return path
    js = np.array([j for _, j in path], dtype=np.int64)
    half = width // 2
    sm = js.copy()
    for k in range(half, len(js) - half):
        sm[k] = np.median(js[k - half : k + half + 1])
    np.maximum.accumulate(sm, out=sm)  # monotone non-decreasing
    sm[0], sm[-1] = js[0], js[-1]
    return [(i, int(j)) for (i, _), j in zip(path, sm)]


def align_pairs(
    ds: ray.data.Dataset,
    pair_col: str,
    role_col: str,
    ts_col: str,
    emb_col: str,
    band_frac: float = 0.2,
    roles: tuple[str, str] = ("teacher", "student"),
    multiscale: bool = False,
    smooth: bool = False,
) -> ray.data.Dataset:
    """Distributed pairwise DTW: one row per pair with alignment scores.

    Input rows: (pair, role, ts, embedding). Each pair's two time-sorted
    sequences are aligned inside one ``map_groups`` call — the reference's
    1632-line serial loop becomes a per-group function behind one shuffle.
    Pairs missing either role emit status='missing_counterpart' (the
    ``missing_student_audio`` analog, 05/dtw_alignment.py:1466-1468).
    """
    ds, _schema = arrow_schema_of(ds)
    out_schema = pa.schema(
        [
            pa.field(pair_col, pa.string()),
            pa.field("status", pa.string()),
            pa.field("rmse_ms", pa.float64()),
            pa.field("correspondence", pa.float64()),
            pa.field("path_len", pa.float64()),
            pa.field("meets_rmse", pa.bool_()),
            pa.field("meets_correspondence", pa.bool_()),
        ]
    )

    def _seq(group: pa.Table, role: str) -> tuple[np.ndarray, np.ndarray]:
        import pyarrow.compute as pc

        part = group.filter(pc.equal(group.column(role_col), role))
        # Null embedding slots are skipped by Arrow's flatten(), which would
        # misalign the stacked matrix against the timestamp vector — drop
        # them WITH their timestamp rows first (similarity._stack_embeddings
        # contract; same fix as the knn/semantic-dedup stages).
        part = _drop_null_embeddings(part, emb_col)
        ts = part.column(ts_col)
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"), safe=False).cast(pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _stack_embeddings(part.column(emb_col))
        order = np.argsort(tsv, kind="stable")
        return mat[order], tsv[order]

    def per_pair(group: pa.Table) -> pa.Table:
        pid = group.column(pair_col)[0].as_py()
        a_mat, a_ts = _seq(group, roles[0])
        b_mat, b_ts = _seq(group, roles[1])
        if len(a_mat) == 0 or len(b_mat) == 0:
            return pa.table(
                {
                    pair_col: [pid], "status": ["missing_counterpart"],
                    "rmse_ms": [None], "correspondence": [None], "path_len": [None],
                    "meets_rmse": [None], "meets_correspondence": [None],
                },
                schema=out_schema,
            )
        if multiscale:
            path = dtw_align_multiscale(a_mat, b_mat, band_frac=band_frac)
        else:
            path = dtw_align(a_mat, b_mat, band_frac)
        if smooth:
            path = smooth_path(path)
        ev = evaluate_alignment(path, a_ts, b_ts)
        return pa.table(
            {
                pair_col: [pid], "status": ["ok"],
                "rmse_ms": [ev["rmse_ms"]], "correspondence": [ev["correspondence"]],
                "path_len": [ev["path_len"]], "meets_rmse": [ev["meets_rmse"]],
                "meets_correspondence": [ev["meets_correspondence"]],
            },
            schema=out_schema,
        )

    return ds.groupby(pair_col).map_groups(per_pair, batch_format="pyarrow")


def alignment_report(
    pairs: ray.data.Dataset,
    group_col: str,
    pair_col: str = "pair",
) -> ray.data.Dataset:
    """A7: grouped alignment report over :func:`align_pairs` output — per-group
    pair counts, mean RMSE / correspondence, and %-meeting-standards (the
    reference's per-group deliverable, 05/dtw_alignment.py:1504-1567).

    Runs as a map-side combine + small groupby (``grouped_agg_fast``); only
    per-group partials shuffle. Float means are rounded to 6 decimals for
    run-to-run determinism.
    """
    import pyarrow.compute as pc

    from .aggregates import grouped_agg_fast

    def flags(t: pa.Table) -> pa.Table:
        ok = pc.equal(t.column("status"), "ok")
        okf = pc.cast(ok, pa.float64())
        both = pc.and_kleene(
            pc.fill_null(t.column("meets_rmse"), False),
            pc.fill_null(t.column("meets_correspondence"), False),
        )
        return pa.table(
            {
                group_col: t.column(group_col),
                "is_ok": okf,
                "rmse_ms": pc.if_else(ok, t.column("rmse_ms"), pa.nulls(t.num_rows, pa.float64())),
                "correspondence": pc.if_else(
                    ok, t.column("correspondence"), pa.nulls(t.num_rows, pa.float64())
                ),
                "f_meets_rmse": pc.cast(pc.fill_null(t.column("meets_rmse"), False), pa.float64()),
                "f_meets_corr": pc.cast(
                    pc.fill_null(t.column("meets_correspondence"), False), pa.float64()
                ),
                "f_meets_both": pc.cast(both, pa.float64()),
            }
        )

    agg = grouped_agg_fast(
        pairs.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        keys=[group_col],
        specs=[
            ("n_ok", "is_ok", "sum"),
            ("mean_rmse_ms", "rmse_ms", "mean"),
            ("mean_correspondence", "correspondence", "mean"),
            ("pct_meets_rmse", "f_meets_rmse", "mean"),
            ("pct_meets_correspondence", "f_meets_corr", "mean"),
            ("pct_meets_both", "f_meets_both", "mean"),
        ],
        count_alias="n_pairs",
        num_final_partitions=1,  # report groups are few by construction
    )

    def finish(t: pa.Table) -> pa.Table:
        out = {n: t.column(n) for n in t.column_names}
        out["n_ok"] = t.column("n_ok").cast(pa.int64())
        for c in ("mean_rmse_ms", "mean_correspondence", "pct_meets_rmse",
                  "pct_meets_correspondence", "pct_meets_both"):
            arr = t.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
            r = np.where(np.isnan(arr), np.nan, round_half_away(arr, 6))
            out[c] = pa.array(r, pa.float64(), from_pandas=True)
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def pairwise_quality(
    ds: ray.data.Dataset,
    pair_col: str,
    role_col: str,
    emb_col: str,
    roles: tuple[str, str] = ("teacher", "student"),
    peak: float = 1.0,
) -> ray.data.Dataset:
    """Q6: pairwise quality scoring after pairing — PSNR between the two
    roles' mean feature vectors per pair, bucketed into a rating (the
    reference's PESQ/STOI pairwise assessment recast,
    00_audio_data_collection_experiment/audio_quality_assessment.py:118-281;
    rating thresholds follow its excellent/good/poor buckets).
    """
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [
            pa.field(pair_col, pa.string()),
            pa.field("status", pa.string()),
            pa.field("psnr_db", pa.float64()),
            pa.field("rating", pa.string()),
        ]
    )

    def _mean_vec(group: pa.Table, role: str) -> np.ndarray | None:
        part = _drop_null_embeddings(
            group.filter(pc.equal(group.column(role_col), role)), emb_col
        )
        if part.num_rows == 0:
            return None
        return _stack_embeddings(part.column(emb_col)).mean(axis=0)

    def per_pair(group: pa.Table) -> pa.Table:
        pid = group.column(pair_col)[0].as_py()
        va = _mean_vec(group, roles[0])
        vb = _mean_vec(group, roles[1])
        if va is None or vb is None:
            return pa.table(
                {pair_col: [pid], "status": ["missing_counterpart"],
                 "psnr_db": [None], "rating": [None]},
                schema=out_schema,
            )
        mse = float(np.mean((va - vb) ** 2))
        psnr = float("inf") if mse == 0 else 10.0 * np.log10(peak * peak / mse)
        rating = "excellent" if psnr >= 40 else ("good" if psnr >= 30 else "poor")
        return pa.table(
            {pair_col: [pid], "status": ["ok"],
             "psnr_db": [min(psnr, 99.0)], "rating": [rating]},
            schema=out_schema,
        )

    return ds.groupby(pair_col).map_groups(per_pair, batch_format="pyarrow")
