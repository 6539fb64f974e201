"""Deterministic image augmentation — the training-data-expansion stage of a
multimodal pipeline (flip / crop / brightness), as an actor-pool
``map_batches`` over the binary image column.

Augmentations are a PURE FUNCTION of (image_id, aug_index, salt): each row's
parameters come from an md5-seeded Generator, so re-running the pipeline —
or resuming a failed partition — reproduces byte-identical outputs with no
global RNG state (the same determinism contract as the synthetic source and
the sampling stages). Failures become ``status`` rows, never exceptions,
matching the decode stage's failures-are-data convention
(reference analog: the per-file try/except status accounting,
04_feature_extraction_experiment/feature_extraction.py:168-174).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs


def _rng_for(image_id: str, aug_index: int, salt: str) -> np.random.Generator:
    h = hashlib.md5(f"{salt}|{image_id}|{aug_index}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def augment_pixels(
    px: np.ndarray, rng: np.random.Generator
) -> tuple[np.ndarray, dict[str, float]]:
    """Apply flip → crop → brightness to one HxWx3 uint8 array. Returns the
    augmented pixels and the parameter record (flipped, crop fraction,
    brightness gain) so the lineage of every training row is queryable."""
    params: dict[str, float] = {}
    flipped = bool(rng.integers(0, 2))
    if flipped:
        px = px[:, ::-1]
    params["flipped"] = float(flipped)
    # random crop to a [0.8, 1.0] fraction of each side, offset uniform
    frac = float(rng.uniform(0.8, 1.0))
    h, w = px.shape[0], px.shape[1]
    ch, cw = max(int(round(h * frac)), 1), max(int(round(w * frac)), 1)
    oy = int(rng.integers(0, h - ch + 1))
    ox = int(rng.integers(0, w - cw + 1))
    px = px[oy:oy + ch, ox:ox + cw]
    params["crop_frac"] = frac
    # brightness gain in [0.9, 1.1], clipped to uint8 range
    gain = float(rng.uniform(0.9, 1.1))
    px = np.clip(px.astype(np.float32) * gain, 0.0, 255.0).astype(np.uint8)
    params["gain"] = gain
    return np.ascontiguousarray(px), params


class AugmentImage:
    """Actor-pool stage: ``n_augs`` augmented copies per input image.

    Output rows: (image_id, aug_id, bytes, w, h, fmt, flipped, crop_frac,
    gain, status). Decode failures emit ONE status row per input (aug_id -1,
    null payload) so downstream accounting sees every input exactly once.
    ``out_fmt`` defaults to lossless PNG so augmented bytes round-trip
    exactly; pass 'jpgl' to trade bytes for the lossy path (PSNR≥40 gate
    still holds there).
    """

    def __init__(self, n_augs: int = 1, salt: str = "aug-v1", out_fmt: str = "png"):
        if n_augs < 1:
            raise ValueError("n_augs must be >= 1")
        self.n_augs = n_augs
        self.salt = salt
        self.out_fmt = out_fmt
        _ = codecs._D8, codecs._QSTEP  # warm codec tables once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        raw = batch.column("bytes")
        out_id: list[str] = []
        out_aug: list[int] = []
        out_bytes: list[bytes | None] = []
        out_h: list[int] = []
        out_w: list[int] = []
        out_flip: list[float | None] = []
        out_crop: list[float | None] = []
        out_gain: list[float | None] = []
        out_status: list[str] = []
        for i, image_id in enumerate(ids):
            try:
                px = codecs.decode_image(raw[i].as_py())
            except codecs.DecodeError as e:
                out_id.append(image_id)
                out_aug.append(-1)
                out_bytes.append(None)
                out_h.append(0)
                out_w.append(0)
                out_flip.append(None)
                out_crop.append(None)
                out_gain.append(None)
                out_status.append(f"decode_error:{str(e).split(':')[0]}")
                continue
            for a in range(self.n_augs):
                ap, params = augment_pixels(px, _rng_for(image_id, a, self.salt))
                out_id.append(image_id)
                out_aug.append(a)
                out_bytes.append(codecs.encode_image(ap, self.out_fmt))
                out_h.append(ap.shape[0])
                out_w.append(ap.shape[1])
                out_flip.append(params["flipped"])
                out_crop.append(params["crop_frac"])
                out_gain.append(params["gain"])
                out_status.append("ok")
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "aug_id": pa.array(out_aug, pa.int64()),
            "bytes": pa.array(out_bytes, pa.binary()),
            "h": pa.array(out_h, pa.int32()),
            "w": pa.array(out_w, pa.int32()),
            "fmt": pa.array([self.out_fmt] * len(out_id), pa.string()),
            "flipped": pa.array(out_flip, pa.float64()),
            "crop_frac": pa.array(out_crop, pa.float64()),
            "gain": pa.array(out_gain, pa.float64()),
            "status": pa.array(out_status, pa.string()),
        })


def augment_stage(
    ds: ray.data.Dataset,
    n_augs: int = 1,
    salt: str = "aug-v1",
    out_fmt: str = "png",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Augment the image table: small batches (binary payloads ×n_augs leave
    this stage), actor pool so codec state loads once per worker."""
    return ds.map_batches(
        AugmentImage,
        fn_constructor_kwargs={"n_augs": n_augs, "salt": salt, "out_fmt": out_fmt},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
