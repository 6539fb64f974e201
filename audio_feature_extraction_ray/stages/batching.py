"""Training-batch shaping: aspect-ratio bucketing + global batch assignment.

Training dataloaders over variable-shape images group samples into
near-uniform aspect buckets so each batch pads to one target shape (the
standard trick in large-scale vision/diffusion training). The reference's
analog is the dynamic frame-length adjuster that groups equal-shape frame
matrices before stacking (04_feature_extraction_experiment/.../
feature_extractor.py dynamic n_fft sizing); here the grouping is explicit,
distributed, and deterministic.

``assign_aspect_buckets`` is a stateless metadata map (never decodes bytes);
``with_batch_ids`` adds a per-bucket global batch id via ONE bucket-hash
exchange — batch ids are deterministic (ordered by (image_id, ts)), so a
resumed job rebuilds the same batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_BUCKETS: tuple[float, ...] = (0.5, 2 / 3, 0.75, 1.0, 4 / 3, 1.5, 2.0)


def assign_aspect_buckets(
    ds: ray.data.Dataset,
    w_col: str = "w",
    h_col: str = "h",
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Append ``aspect`` (w/h, float64) and ``aspect_bucket`` (int32 index of
    the nearest bucket ratio in LOG space — so 1:2 and 2:1 are equidistant
    from square). Pure vectorized metadata math; bytes never touched."""
    b = np.asarray(sorted(buckets), dtype=np.float64)
    log_b = np.log(b)
    # midpoints in log space: searchsorted boundary = nearest-neighbor assign
    mids = (log_b[1:] + log_b[:-1]) / 2.0

    def fn(t: pa.Table) -> pa.Table:
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = t.column(h_col).to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            aspect = w / h
            idx = np.searchsorted(mids, np.log(np.maximum(aspect, 1e-12)))
        t = t.append_column("aspect", pa.array(aspect, pa.float64(), from_pandas=True))
        return t.append_column("aspect_bucket", pa.array(idx.astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def with_batch_ids(
    ds: ray.data.Dataset,
    batch_size: int,
    order_cols: tuple[str, str] = ("image_id", "ts"),
    bucket_col: str = "aspect_bucket",
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Append a global, deterministic ``batch_id`` within each aspect bucket:
    rows ordered by ``order_cols`` inside their bucket, chunked into
    ``batch_size`` groups. One bucket-hash exchange co-locates each bucket;
    the id is (bucket << 32) | (row_number // batch_size), collision-free up
    to 2^32 batches per bucket.

    SCALE NOTE: one bucket = one task's sort (buckets are few and balanced
    by construction — ratios cluster near the chosen grid). For a corpus
    where a single bucket exceeds task memory, pre-split by a coarse hash of
    ``order_cols[0]`` and accept per-split batch numbering (documented
    trade; training only needs uniform-shape batches, not a global order).
    """

    def per_bucket(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("batch_id", pa.array([], pa.int64()))
        t = t.combine_chunks()
        a = t.column(order_cols[0]).to_numpy(zero_copy_only=False)
        b = t.column(order_cols[1]).to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        t = t.take(pa.array(order, pa.int64()))
        bucket = int(t.column(bucket_col)[0].as_py())
        bid = (np.int64(bucket) << np.int64(32)) | (np.arange(n, dtype=np.int64) // batch_size)
        return t.append_column("batch_id", pa.array(bid, pa.int64()))

    return ds.groupby(bucket_col).map_groups(per_bucket, batch_format="pyarrow")


def resize_to_bucket_stage(
    ds: ray.data.Dataset,
    target_area: int = 256 * 256,
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
    keep_pixels: bool = False,
) -> ray.data.Dataset:
    """Decode + resize every image to its aspect bucket's canonical shape —
    the step after :func:`assign_aspect_buckets` that makes batches
    uniform-shape (constant ``target_area`` pixels, bucket's ratio): all
    rows in a bucket come back ``(th, tw)``-identical, ready to stack.

    Area-pooling resize per channel (the engine's shared kernel, mean-
    preserving); actor pool warms decoder state once; resized pixels ship
    only when ``keep_pixels`` (stats + dims otherwise — training sinks
    re-encode per shard instead of shipping raw float planes).
    """
    from ..functions import codecs
    from ..functions.imagefx import resize_area

    b = np.asarray(sorted(buckets), dtype=np.float64)
    targets = []
    for r in b:
        th = int(round(np.sqrt(target_area / r)))
        tw = int(round(np.sqrt(target_area * r)))
        targets.append((max(th, 1), max(tw, 1)))

    class ResizeToBucket:
        def __init__(self):
            _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            raw = batch.column("bytes")
            bkt = batch.column("aspect_bucket").to_numpy(zero_copy_only=False)
            out: dict[str, list] = {
                "image_id": batch.column("image_id").to_pylist(),
                "ts": batch.column("ts").to_pylist(),
                "aspect_bucket": bkt.tolist(),
                "th": [], "tw": [], "mean_px": [], "std_px": [], "status": [],
            }
            if keep_pixels:
                out["pixels"] = []
            for i in range(n):
                th, tw = targets[int(bkt[i])]
                try:
                    px = codecs.decode_image(raw[i].as_py())
                except codecs.DecodeError as e:
                    out["th"].append(0); out["tw"].append(0)
                    out["mean_px"].append(None); out["std_px"].append(None)
                    out["status"].append(f"decode_error:{str(e).split(':')[0]}")
                    if keep_pixels:
                        out["pixels"].append(None)
                    continue
                rz = np.stack(
                    [resize_area(px[:, :, c].astype(np.float64), th, tw)
                     for c in range(px.shape[2])], axis=2)
                out["th"].append(th); out["tw"].append(tw)
                out["mean_px"].append(float(rz.mean()))
                out["std_px"].append(float(rz.std()))
                out["status"].append("ok")
                if keep_pixels:
                    out["pixels"].append(
                        np.clip(np.rint(rz), 0, 255).astype(np.uint8).tobytes())
            fields = [
                pa.field("image_id", pa.string()), pa.field("ts", pa.timestamp("us")),
                pa.field("aspect_bucket", pa.int32()),
                pa.field("th", pa.int32()), pa.field("tw", pa.int32()),
                pa.field("mean_px", pa.float64()), pa.field("std_px", pa.float64()),
                pa.field("status", pa.string()),
            ]
            if keep_pixels:
                fields.append(pa.field("pixels", pa.binary()))
            sch = pa.schema(fields)
            return pa.table({f.name: pa.array(out[f.name], f.type) for f in sch},
                            schema=sch)

    return ds.map_batches(
        ResizeToBucket,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
