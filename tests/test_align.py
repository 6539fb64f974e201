"""Pairwise constrained-DTW alignment (the reference's J4 operator) — path
properties, scoring thresholds, and the distributed per-pair stage."""

import numpy as np
import pandas as pd
import ray

from audio_feature_extraction_ray.stages.align import (
    align_pairs,
    dtw_align,
    evaluate_alignment,
)


def _seq(n, d=4, seed=0, offset=0.0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d)).cumsum(axis=0)
    return base + offset


def test_dtw_identical_sequences_diagonal():
    a = _seq(30)
    path = dtw_align(a, a)
    assert path[0] == (0, 0) and path[-1] == (29, 29)
    # identical sequences align on the diagonal
    assert all(i == j for i, j in path)
    ts = np.arange(30, dtype=np.int64) * 10_000  # 10ms hops
    ev = evaluate_alignment(path, ts, ts)
    assert ev["rmse_ms"] == 0.0 and ev["correspondence"] == 1.0
    assert ev["meets_rmse"] and ev["meets_correspondence"]


def test_dtw_monotonic_path():
    a, b = _seq(25, seed=1), _seq(40, seed=2)
    path = dtw_align(a, b)
    xs, ys = zip(*path)
    assert all(x2 >= x1 for x1, x2 in zip(xs, xs[1:]))  # monotone, like the
    assert all(y2 >= y1 for y1, y2 in zip(ys, ys[1:]))  # reference's :1087-1088
    assert path[0] == (0, 0)


def test_dtw_detects_tempo_stretch():
    # constant start offsets are normalized away (relative-time scoring);
    # a tempo stretch accumulates real misalignment
    ts_a = np.arange(40, dtype=np.int64) * 100_000  # 100ms hops
    ts_b = (np.arange(40, dtype=np.int64) * 150_000)  # student 1.5x slower
    path = [(i, i) for i in range(40)]
    ev = evaluate_alignment(path, ts_a, ts_b)
    assert ev["rmse_ms"] > 200.0 and not ev["meets_rmse"]
    assert ev["correspondence"] < 0.95 and not ev["meets_correspondence"]


def test_align_pairs_distributed():
    rows = []
    rng = np.random.default_rng(5)
    for pid in range(4):
        a = _seq(20, seed=pid)
        for role, jitter in (("teacher", 0), ("student", 1)):
            seq = a + rng.normal(scale=0.01, size=a.shape) * jitter
            for i in range(20):
                rows.append(
                    {
                        "pair": f"p{pid}",
                        "role": role,
                        "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(milliseconds=10 * i),
                        "embedding": seq[i].astype(np.float32),
                    }
                )
    # a pair with a missing student
    for i in range(10):
        rows.append(
            {
                "pair": "p_missing",
                "role": "teacher",
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(milliseconds=10 * i),
                "embedding": np.zeros(4, dtype=np.float32),
            }
        )
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = align_pairs(ds, pair_col="pair", role_col="role", ts_col="ts",
                      emb_col="embedding").to_pandas().set_index("pair")
    assert out.loc["p_missing", "status"] == "missing_counterpart"
    for pid in range(4):
        r = out.loc[f"p{pid}"]
        assert r["status"] == "ok"
        # near-identical sequences on identical time grids meet both standards
        assert r["rmse_ms"] <= 200.0 and r["correspondence"] >= 0.95
        assert r["meets_rmse"] and r["meets_correspondence"]
