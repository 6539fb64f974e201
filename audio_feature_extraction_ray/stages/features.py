"""Per-image feature stage: the reference's F1–F13 "wide map" (SURVEY.md §2.3)
recast as one vectorized ``map_batches`` producing an Arrow feature table.

Outputs per row: 64-d phash-derived embedding (``fixed_size_list<float32>``),
recomputed phash, per-channel stats, quality flags + score (-0.3 per failed
check, 04_feature_extraction_experiment/feature_extractor.py:219-227), caption
tokens + count, and pass-through identity/caption columns.

``DecodeFeaturize`` fuses decode+features in one actor so raw pixels never
enter the object store at all — the anti-capability fix for the reference's
5x-redundant-decode-per-record pattern (04/feature_extractor.py:641-658):
decode once, fan all features out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs
from ..functions.imagefx import (
    EMBED_DIM,
    channel_stats,
    phash64,
    phash_embedding,
    quality_from_stats,
    tokenize_caption,
)

STAT_NAMES = [
    f"{s}_{c}" for c in ("r", "g", "b") for s in ("mean", "std", "cv", "min", "max")
] + ["gray_mean"]
FLAG_NAMES = ["size_ok", "contrast_ok", "exposure_ok", "range_ok"]

# Default feature selection — the reference's `features_to_extract` surface
# (F13, README.md:141-147).
ALL_FEATURES = ("embedding", "stats", "quality", "caption_tokens")


def _feature_columns(n: int, features: tuple[str, ...]) -> dict[str, list]:
    cols: dict[str, list] = {}
    if "embedding" in features:
        cols["embedding"] = [None] * n
        cols["phash_calc"] = [None] * n
    if "stats" in features:
        for s in STAT_NAMES:
            cols[s] = [None] * n
    if "quality" in features:
        for f in FLAG_NAMES:
            cols[f] = [None] * n
        cols["quality_score"] = [None] * n
    return cols


def _fill_feature_row(cols: dict[str, list], i: int, px: np.ndarray, features: tuple[str, ...]) -> None:
    if "embedding" in features:
        cols["embedding"][i] = phash_embedding(px)
        cols["phash_calc"][i] = phash64(px)
    stats = None
    if "stats" in features or "quality" in features:
        stats = channel_stats(px)
    if "stats" in features:
        for s in STAT_NAMES:
            cols[s][i] = stats[s]
    if "quality" in features:
        q = quality_from_stats(stats, px.shape[0], px.shape[1])
        for f in FLAG_NAMES:
            cols[f][i] = q[f]
        cols["quality_score"][i] = q["quality_score"]


def _finish_table(
    batch: pa.Table,
    cols: dict[str, list],
    status: list[str],
    features: tuple[str, ...],
    drop: tuple[str, ...],
) -> pa.Table:
    out = {n: batch.column(n) for n in batch.column_names if n not in drop}
    out["status"] = pa.array(status, pa.string())
    if "embedding" in features:
        # Failed rows carry an all-zero embedding (status != 'ok' marks them);
        # a non-null fixed_size_list column stays zero-copy through shuffles.
        flat = np.zeros((len(status), EMBED_DIM), dtype=np.float32)
        for i, e in enumerate(cols["embedding"]):
            if e is not None:
                flat[i] = e
        out["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), pa.float32()), EMBED_DIM
        )
        # 0 (not null) for failed rows: a nullable int64 would round-trip
        # through pandas as float64 and corrupt 64-bit hash values
        out["phash_calc"] = pa.array(
            [v if v is not None else 0 for v in cols["phash_calc"]], pa.int64()
        )
    if "stats" in features:
        for s in STAT_NAMES:
            out[s] = pa.array(cols[s], pa.float64())
    if "quality" in features:
        for f in FLAG_NAMES:
            out[f] = pa.array(cols[f], pa.bool_())
        out["quality_score"] = pa.array(cols["quality_score"], pa.float64())
    if "caption_tokens" in features and "caption" in batch.column_names:
        caps = batch.column("caption").to_pylist()
        toks = [tokenize_caption(c) if c is not None else [] for c in caps]
        out["caption_tokens"] = pa.array(toks, pa.list_(pa.string()))
        out["token_count"] = pa.array([len(t) for t in toks], pa.int32())
    return pa.table(out)


class ImageFeatures:
    """Feature stage over already-decoded ``pixels`` (from DecodeImage)."""

    def __init__(self, features: tuple[str, ...] = ALL_FEATURES, drop_pixels: bool = True):
        self.features = tuple(features)
        self.drop_pixels = drop_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = _feature_columns(n, self.features)
        status = batch.column("status").to_pylist()
        pixels = batch.column("pixels")
        hs = batch.column("dec_h").to_numpy(zero_copy_only=False)
        ws = batch.column("dec_w").to_numpy(zero_copy_only=False)
        for i in range(n):
            if status[i] != "ok":
                continue
            px = np.frombuffer(pixels[i].as_py(), dtype=np.uint8).reshape(int(hs[i]), int(ws[i]), 3)
            _fill_feature_row(cols, i, px, self.features)
        drop = ("pixels",) if self.drop_pixels else ()
        return _finish_table(batch, cols, status, self.features, drop)


class DecodeFeaturize:
    """Fused decode+feature actor: bytes in, features out, pixels never shipped."""

    def __init__(self, features: tuple[str, ...] = ALL_FEATURES):
        self.features = tuple(features)
        _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = _feature_columns(n, self.features)
        status = ["ok"] * n
        raw = batch.column("bytes")
        for i in range(n):
            try:
                px = codecs.decode_image(raw[i].as_py())
            except codecs.DecodeError as e:
                status[i] = f"decode_error:{str(e).split(':')[0]}"
                continue
            _fill_feature_row(cols, i, px, self.features)
        return _finish_table(batch, cols, status, self.features, drop=("bytes",))


def feature_stage(
    ds: ray.data.Dataset,
    features: tuple[str, ...] = ALL_FEATURES,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 256,
    fused: bool = True,
) -> ray.data.Dataset:
    """bytes→features in one fused actor pool (default), or pixels→features."""
    cls = DecodeFeaturize if fused else ImageFeatures
    return ds.map_batches(
        cls,
        fn_constructor_kwargs={"features": tuple(features)},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
