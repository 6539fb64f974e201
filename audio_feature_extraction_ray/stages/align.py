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

from .util import arrow_schema_of

RMSE_STANDARD_MS = 200.0  # reference: 05/dtw_alignment.py:1137-1141
CORRESPONDENCE_TOL_MS = 250.0
CORRESPONDENCE_STANDARD = 0.95


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
    inf = np.inf
    acc = np.full((t1 + 1, t2 + 1), inf)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        center = int(round((i - 1) * (t2 - 1) / max(t1 - 1, 1))) + 1 if t1 > 1 else 1
        j_lo = max(1, center - band)
        j_hi = min(t2, center + band)
        costs = np.linalg.norm(a[i - 1][None, :] - b[j_lo - 1 : j_hi], axis=1)
        for idx, j in enumerate(range(j_lo, j_hi + 1)):
            best_prev = min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
            acc[i, j] = costs[idx] + best_prev
    # backtrack
    path = []
    i, j = t1, t2
    if not np.isfinite(acc[i, j]):
        # clamp to the best reachable end cell in the last row
        j = int(np.argmin(acc[t1, 1:]) + 1)
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = [(acc[i - 1, j - 1], i - 1, j - 1), (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1)]
        _, i, j = min(moves, key=lambda m: m[0])
    path.reverse()
    return path


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


def align_pairs(
    ds: ray.data.Dataset,
    pair_col: str,
    role_col: str,
    ts_col: str,
    emb_col: str,
    band_frac: float = 0.2,
    roles: tuple[str, str] = ("teacher", "student"),
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
        ts = part.column(ts_col)
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"), safe=False).cast(pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        emb = part.column(emb_col)
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        if pa.types.is_fixed_size_list(emb.type):
            mat = emb.flatten().to_numpy(zero_copy_only=False).reshape(
                -1, emb.type.list_size
            ).astype(np.float64)
        else:
            lst = emb.to_pylist()
            mat = np.array(lst, dtype=np.float64) if lst else np.zeros((0, 1))
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
        path = dtw_align(a_mat, b_mat, band_frac)
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
