"""Single-process pure-NumPy/pandas oracle (FIXTURES.md F4).

Plays the role the reference's committed golden CSV/NPZ artifacts play
(04_feature_extraction_experiment/feature_evaluation/*.csv, features/*.npz):
a trusted serial implementation the distributed pipeline must match with
``allclose`` at every entity×timestamp. It reuses the pure kernels in
functions/ — the thing under test is the distributed plumbing (partitioning,
shuffles, actor pools, ordering), not the math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import codecs
from .imagefx import (
    channel_stats,
    phash64,
    phash_embedding,
    quality_from_stats,
    spectral_profile,
    tokenize_caption,
)


def oracle_features(images: pa.Table) -> pd.DataFrame:
    """Serial decode + feature extraction over an input_hint-shaped table."""
    rows = []
    for i in range(images.num_rows):
        rec = {
            "image_id": images["image_id"][i].as_py(),
            "ts": images["ts"][i].as_py(),
            "caption": images["caption"][i].as_py(),
            "phash": images["phash"][i].as_py(),
        }
        try:
            px = codecs.decode_image(images["bytes"][i].as_py())
        except codecs.DecodeError as e:
            rec["status"] = f"decode_error:{str(e).split(':')[0]}"
            rows.append(rec)
            continue
        rec["status"] = "ok"
        rec["pixels"] = px
        rec["embedding"] = phash_embedding(px)
        rec["phash_calc"] = phash64(px)
        rec.update(channel_stats(px))
        rec.update(quality_from_stats(channel_stats(px), px.shape[0], px.shape[1]))
        rec.update(spectral_profile(px))
        toks = tokenize_caption(rec["caption"])
        rec["caption_tokens"] = toks
        rec["token_count"] = len(toks)
        rows.append(rec)
    return pd.DataFrame(rows)


def oracle_asof(
    features: pd.DataFrame,
    queries: pd.DataFrame,
    on: str = "image_id",
    left_ts: str = "query_ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("quality_score",),
) -> pd.DataFrame:
    """Point-in-time join oracle: for each probe row, the feature row with the
    greatest right_ts <= left_ts; nulls when none (zero temporal leakage)."""
    out = queries.copy()
    feats = features.sort_values([on, right_ts]).reset_index(drop=True)
    matched = {c: [] for c in value_cols}
    matched_ts = []
    grouped = {k: g for k, g in feats.groupby(on)}
    for _, q in queries.iterrows():
        g = grouped.get(q[on])
        if g is None:
            for c in value_cols:
                matched[c].append(None)
            matched_ts.append(pd.NaT)
            continue
        ts = g[right_ts].to_numpy()
        idx = np.searchsorted(ts, np.datetime64(q[left_ts], "us"), side="right") - 1
        if idx < 0:
            for c in value_cols:
                matched[c].append(None)
            matched_ts.append(pd.NaT)
        else:
            for c in value_cols:
                matched[c].append(g.iloc[idx][c])
            matched_ts.append(g.iloc[idx][right_ts])
    for c in value_cols:
        out[f"{c}_asof"] = matched[c]
    out["matched_ts"] = matched_ts
    return out


def oracle_windows(
    df: pd.DataFrame,
    key: str,
    ts: str,
    value: str,
    session_gap_us: int | None = None,
) -> pd.DataFrame:
    """lag/lead/delta/delta2, ffill/bfill and gap sessionization per entity,
    serial pandas (the Δ/Δ² recast, core/feature_extractor.py:136-138)."""
    df = df.sort_values([key, ts]).reset_index(drop=True)
    g = df.groupby(key, sort=False)[value]
    df["lag_1"] = g.shift(1)
    df["lead_1"] = g.shift(-1)
    df["delta"] = df[value] - df["lag_1"]
    df["delta2"] = df["delta"] - df.groupby(key, sort=False)["delta"].shift(1)
    df["filled_ffill"] = df.groupby(key, sort=False)[value].ffill()
    df["filled_bfill"] = df.groupby(key, sort=False)[value].bfill()
    if session_gap_us is not None:
        ts_us = df[ts].astype("int64")
        new_sess = ts_us.groupby(df[key]).diff().gt(session_gap_us).fillna(False)
        df["session_id"] = new_sess.groupby(df[key]).cumsum().astype("int64")
    return df
