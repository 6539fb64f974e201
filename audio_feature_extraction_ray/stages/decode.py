"""Image decode stage: bytes → pixels, as a stateful actor-pool ``map_batches``.

Recast of the reference's multi-format decoder with fallback chain (S4,
04_feature_extraction_experiment/feature_extractor.py:62-131): format sniffed
from magic bytes, per-row failures become ``status != 'ok'`` rows (sentinel
precedent 04/feature_extractor.py:25-40) — a UDF never raises.

Scale notes: ``bytes`` dominates block size, so callers should use a small
``batch_size`` and drop ``bytes`` immediately after decode (this stage does)
so downstream shuffles move features, not payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs

DECODE_BATCH_SIZE = 256


class DecodeImage:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    Holds reusable per-actor state (DCT basis matrices are module-level
    constants warmed on first import; a real JPEG/video decoder would keep its
    codec contexts here, like the reference reuses librosa state per process).
    """

    def __init__(self, keep_bytes: bool = False):
        self.keep_bytes = keep_bytes
        # touch the lossy-codec tables once per actor so per-batch work is pure compute
        _ = codecs._D8, codecs._QSTEP

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        raw = batch.column("bytes")
        pixels: list[bytes | None] = [None] * n
        dec_h = np.zeros(n, dtype=np.int32)
        dec_w = np.zeros(n, dtype=np.int32)
        status: list[str] = ["ok"] * n
        for i in range(n):
            buf = raw[i].as_py()
            try:
                px = codecs.decode_image(buf)
            except codecs.DecodeError as e:
                status[i] = f"decode_error:{str(e).split(':')[0]}"
                continue
            pixels[i] = px.tobytes()
            dec_h[i], dec_w[i] = px.shape[0], px.shape[1]
        cols = {name: batch.column(name) for name in batch.column_names}
        if not self.keep_bytes:
            cols.pop("bytes")  # early projection: payloads never leave this stage
        cols["pixels"] = pa.array(pixels, pa.binary())
        cols["dec_h"] = pa.array(dec_h)
        cols["dec_w"] = pa.array(dec_w)
        cols["status"] = pa.array(status, pa.string())
        return pa.table(cols)


def decode_stage(
    ds: ray.data.Dataset,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = DECODE_BATCH_SIZE,
    keep_bytes: bool = False,
) -> ray.data.Dataset:
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"keep_bytes": keep_bytes},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
