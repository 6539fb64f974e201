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


def batch_gray(stack: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 → (N, H, W) float64 luminance."""
    return stack.astype(np.float64) @ _GRAY_W


def batch_low_freq_dct(stack: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) → (N, 8, 8) low-frequency DCT blocks, vectorized.

    Bitwise-identical to :func:`_low_freq_dct` per image: the pooling
    (reduceat over the same memory layout) and matmul broadcasting reduce in
    the same order as the single-image path — required for the ``allclose``
    gate against the serial oracle.
    """
    g = batch_gray(stack)
    g = _pool_axis(_pool_axis(g, 32, 1), 32, 2)
    return (_D32 @ g @ _D32.T)[:, :8, :8]


def batch_phash_embedding(stack: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized phash + embedding for N same-shape images.

    Returns (phash int64 (N,), embedding float32 (N, 64)).
    """
    blocks = batch_low_freq_dct(stack).reshape(len(stack), 64)
    med = np.median(blocks, axis=1, keepdims=True)
    bits = (blocks > med).astype(np.uint8)
    ph = np.packbits(bits, axis=1).view(">u8").ravel().astype(np.uint64)
    ph_i64 = ph.view(np.int64)
    emb = blocks.copy()
    emb[:, 0] = 0.0
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = (emb / (norms + 1e-12)).astype(np.float32)
    return ph_i64, emb


_UV = np.add.outer(np.arange(32), np.arange(32))  # coefficient "frequency" u+v
_AC = np.ones((32, 32), dtype=bool)
_AC[0, 0] = False  # DC excluded from energy ratios
_LOW_M = (_UV < 8) & _AC
_MID_M = (_UV >= 8) & (_UV < 20)
_HIGH_M = _UV >= 20


def spectral_profile(px: np.ndarray) -> dict[str, float]:
    """F7–F10 spectral-family analog: radial band-energy ratios + spectral
    centroid of the 32×32 DCT spectrum (the image recast of spectral
    centroid / bandwidth / rolloff / harmonic-energy features,
    04_feature_extraction_experiment/feature_extractor.py:369-447).

    Ratios are AC-energy fractions in three u+v-radius bands; centroid is
    the energy-weighted mean frequency (0 = all energy at DC-adjacent
    coefficients, rises with texture/detail — the 'brightness' analog).
    """
    g = _pool_axis(_pool_axis(to_gray(px)[None, :, :], 32, 1), 32, 2)
    full = (_D32 @ g @ _D32.T)[0]
    e = full * full
    tot = float(e[_AC].sum())
    if tot <= 0:
        return {"spec_low_ratio": 0.0, "spec_mid_ratio": 0.0,
                "spec_high_ratio": 0.0, "spec_centroid": 0.0}
    return {
        "spec_low_ratio": float(e[_LOW_M].sum() / tot),
        "spec_mid_ratio": float(e[_MID_M].sum() / tot),
        "spec_high_ratio": float(e[_HIGH_M].sum() / tot),
        "spec_centroid": float((e * _UV)[_AC].sum() / tot),
    }


def batch_spectral_profile(stack: np.ndarray) -> dict[str, np.ndarray]:
    """Vectorized :func:`spectral_profile` for N same-shape images."""
    g = _pool_axis(_pool_axis(batch_gray(stack), 32, 1), 32, 2)
    full = _D32 @ g @ _D32.T  # (N, 32, 32)
    e = full * full
    tot = e[:, _AC].sum(axis=1)
    safe = np.maximum(tot, 1e-300)
    out = {
        "spec_low_ratio": np.where(tot > 0, e[:, _LOW_M].sum(axis=1) / safe, 0.0),
        "spec_mid_ratio": np.where(tot > 0, e[:, _MID_M].sum(axis=1) / safe, 0.0),
        "spec_high_ratio": np.where(tot > 0, e[:, _HIGH_M].sum(axis=1) / safe, 0.0),
        "spec_centroid": np.where(tot > 0, (e * _UV[None]).reshape(len(stack), -1)[
            :, _AC.ravel()].sum(axis=1) / safe, 0.0),
    }
    return out


def batch_channel_stats(
    stack: np.ndarray, gray: np.ndarray | None = None
) -> dict[str, np.ndarray]:
    """Vectorized per-channel stats for N same-shape images (float64).

    ``gray`` accepts a precomputed :func:`batch_gray` result so fused
    pipelines compute luminance once per stack (bitwise-identical either
    way)."""
    x = stack.astype(np.float64) / 255.0
    out: dict[str, np.ndarray] = {}
    for ci, name in enumerate(("r", "g", "b")):
        ch = x[:, :, :, ci]
        m = ch.mean(axis=(1, 2))
        s = ch.std(axis=(1, 2))
        out[f"mean_{name}"] = m
        out[f"std_{name}"] = s
        out[f"cv_{name}"] = s / (np.abs(m) + 1e-12)
        out[f"min_{name}"] = ch.min(axis=(1, 2))
        out[f"max_{name}"] = ch.max(axis=(1, 2))
    if gray is None:
        gray = batch_gray(stack)
    out["gray_mean"] = gray.mean(axis=(1, 2)) / 255.0
    return out


def batch_visual_features(
    stack: np.ndarray,
    want_embedding: bool = True,
    want_spectral: bool = True,
) -> dict[str, object]:
    """Fused per-stack visual features: luminance, the pooled 32×32 DCT and
    its products computed ONCE and shared — phash/embedding consume the
    low-frequency 8×8 corner, the spectral profile the full spectrum, and
    ``gray`` feeds channel stats. Bitwise-identical to calling the
    individual batch kernels (full-matrix matmul then slice is exactly what
    :func:`batch_low_freq_dct` computes)."""
    out: dict[str, object] = {}
    g = batch_gray(stack)
    out["gray"] = g
    if not (want_embedding or want_spectral):
        return out
    g32 = _pool_axis(_pool_axis(g, 32, 1), 32, 2)
    full = _D32 @ g32 @ _D32.T  # (N, 32, 32)
    if want_embedding:
        blocks = full[:, :8, :8].reshape(len(stack), 64)
        med = np.median(blocks, axis=1, keepdims=True)
        bits = (blocks > med).astype(np.uint8)
        ph = np.packbits(bits, axis=1).view(">u8").ravel().astype(np.uint64)
        out["phash"] = ph.view(np.int64)
        emb = blocks.copy()
        emb[:, 0] = 0.0
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        out["embedding"] = (emb / (norms + 1e-12)).astype(np.float32)
    if want_spectral:
        e = full * full
        tot = e[:, _AC].sum(axis=1)
        safe = np.maximum(tot, 1e-300)
        out["spec_low_ratio"] = np.where(tot > 0, e[:, _LOW_M].sum(axis=1) / safe, 0.0)
        out["spec_mid_ratio"] = np.where(tot > 0, e[:, _MID_M].sum(axis=1) / safe, 0.0)
        out["spec_high_ratio"] = np.where(tot > 0, e[:, _HIGH_M].sum(axis=1) / safe, 0.0)
        out["spec_centroid"] = np.where(
            tot > 0,
            (e * _UV[None]).reshape(len(stack), -1)[:, _AC.ravel()].sum(axis=1) / safe,
            0.0,
        )
    return out


def batch_quality(stats: dict[str, np.ndarray], h: int, w: int) -> dict[str, np.ndarray]:
    """Vectorized quality flags + score (same rule as quality_from_stats)."""
    n = len(stats["gray_mean"])
    size_ok = np.full(n, h >= 8 and w >= 8)
    contrast = (stats["std_r"] + stats["std_g"] + stats["std_b"]) / 3.0
    contrast_ok = contrast >= 0.01
    exposure_ok = (stats["gray_mean"] >= 0.05) & (stats["gray_mean"] <= 0.95)
    range_ok = np.maximum.reduce([stats["max_r"], stats["max_g"], stats["max_b"]]) > \
        np.minimum.reduce([stats["min_r"], stats["min_g"], stats["min_b"]])
    failed = (~size_ok).astype(np.int64) + (~contrast_ok) + (~exposure_ok) + (~range_ok)
    return {
        "size_ok": size_ok,
        "contrast_ok": contrast_ok,
        "exposure_ok": exposure_ok,
        "range_ok": range_ok,
        "quality_score": np.maximum(0.0, 1.0 - 0.3 * failed),
    }


def tokenize_caption(caption: str) -> list[str]:
    """Whitespace tokenization (``str.split``) — byte-exact caption itself is
    passed through untouched; tokens are a derived feature."""
    return caption.split()
