"""Pure-NumPy per-image feature kernels.

Image recast of the reference's per-record feature extractors (SURVEY.md §2.3):

- phash + phash-derived embedding  ≅ MFCC summary vector (F1/F2,
  04_feature_extraction_experiment/feature_extractor.py:156-241)
- per-channel pixel stats (mean/std/cv/min/max)  ≅ energy/ZCR stats with
  validity flags (F5/F6, 04/feature_extractor.py:341-483)
- quality flags + "-0.3 per failed check" score  ≅ the reference scoring rule
  (04/feature_extractor.py:219-227)
- caption tokenization  ≅ ZCR-style counting features (F6)

All math uses float64 accumulators for determinism (`allclose` gate).
"""

from __future__ import annotations

import numpy as np

from .codecs import _dct_matrix

EMBED_DIM = 64

_D32 = _dct_matrix(32)
_GRAY_W = np.array([0.299, 0.587, 0.114], dtype=np.float64)


def to_gray(px: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 → HxW float64 luminance in [0, 255]."""
    return px.astype(np.float64) @ _GRAY_W


def _pool_axis(a: np.ndarray, out: int, axis: int) -> np.ndarray:
    """Deterministic area-mean downsample (or nearest upsample) along one axis."""
    n = a.shape[axis]
    if n == out:
        return a
    if n > out:
        bounds = (np.arange(out + 1) * n) // out
        sums = np.add.reduceat(a, bounds[:-1], axis=axis)
        counts = np.diff(bounds).astype(np.float64)
        shape = [1] * a.ndim
        shape[axis] = out
        return sums / counts.reshape(shape)
    idx = np.minimum((np.arange(out) * n) // out, n - 1)
    return np.take(a, idx, axis=axis)


def resize_area(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-pooling resize; nearest-neighbor when upsampling. Handles any HxW ≥ 1."""
    return _pool_axis(_pool_axis(gray.astype(np.float64), out_h, 0), out_w, 1)


def _low_freq_dct(px: np.ndarray) -> np.ndarray:
    """32x32 area-resized luminance → 2-D DCT → low-frequency 8x8 block."""
    g = resize_area(to_gray(px), 32, 32)
    return (_D32 @ g @ _D32.T)[:8, :8]


def u64_to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64(px: np.ndarray) -> int:
    """Classic perceptual hash: low-freq DCT block thresholded at its median.

    Returned as a signed int64 (Arrow ``int64`` column).
    """
    block = _low_freq_dct(px).flatten()
    bits = (block > np.median(block)).astype(np.uint8)
    return u64_to_i64(int(np.packbits(bits).view(">u8")[0]))


def phash_embedding(px: np.ndarray) -> np.ndarray:
    """L2-normalized 64-d float32 embedding from the low-frequency DCT block.

    DC coefficient zeroed so the embedding is brightness-invariant; this is the
    similarity-search / near-dup feature vector.
    """
    v = _low_freq_dct(px).flatten()
    v[0] = 0.0
    norm = np.linalg.norm(v)
    return (v / (norm + 1e-12)).astype(np.float32)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))


def channel_stats(px: np.ndarray) -> dict[str, float]:
    """Per-channel mean/std/cv/min/max over pixels scaled to [0, 1]."""
    x = px.astype(np.float64) / 255.0
    out: dict[str, float] = {}
    for ci, name in enumerate(("r", "g", "b")):
        ch = x[:, :, ci]
        m = float(ch.mean())
        s = float(ch.std())
        out[f"mean_{name}"] = m
        out[f"std_{name}"] = s
        out[f"cv_{name}"] = s / (abs(m) + 1e-12)
        out[f"min_{name}"] = float(ch.min())
        out[f"max_{name}"] = float(ch.max())
    out["gray_mean"] = float(to_gray(px).mean() / 255.0)
    return out


def quality_from_stats(stats: dict[str, float], h: int, w: int) -> dict[str, object]:
    """Boolean quality gates + score, reference "-0.3 per failed check" rule
    (04/feature_extractor.py:219-227)."""
    size_ok = bool(h >= 8 and w >= 8)
    contrast = (stats["std_r"] + stats["std_g"] + stats["std_b"]) / 3.0
    contrast_ok = bool(contrast >= 0.01)
    exposure_ok = bool(0.05 <= stats["gray_mean"] <= 0.95)
    range_ok = bool(
        max(stats["max_r"], stats["max_g"], stats["max_b"])
        > min(stats["min_r"], stats["min_g"], stats["min_b"])
    )
    failed = sum(not f for f in (size_ok, contrast_ok, exposure_ok, range_ok))
    return {
        "size_ok": size_ok,
        "contrast_ok": contrast_ok,
        "exposure_ok": exposure_ok,
        "range_ok": range_ok,
        "quality_score": max(0.0, 1.0 - 0.3 * failed),
    }


def tokenize_caption(caption: str) -> list[str]:
    """Whitespace tokenization (``str.split``) — byte-exact caption itself is
    passed through untouched; tokens are a derived feature."""
    return caption.split()
