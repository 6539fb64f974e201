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

Vectorization: rows are grouped by image shape and stacked into (N, H, W, 3)
tensors, so all feature math runs as whole-stack numpy kernels
(functions/imagefx.py batch_*) rather than per-row tiny-array calls — the
hot path has no per-pixel Python. The batch kernels reduce in the same
order as the single-image kernels, so the serial-oracle allclose gate holds
bitwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs
from ..functions.imagefx import (
    EMBED_DIM,
    batch_channel_stats,
    batch_quality,
    batch_visual_features,
    tokenize_caption,
)

STAT_NAMES = [
    f"{s}_{c}" for c in ("r", "g", "b") for s in ("mean", "std", "cv", "min", "max")
] + ["gray_mean"]
FLAG_NAMES = ["size_ok", "contrast_ok", "exposure_ok", "range_ok"]
SPECTRAL_NAMES = ["spec_low_ratio", "spec_mid_ratio", "spec_high_ratio", "spec_centroid"]

# Default feature selection — the reference's `features_to_extract` surface
# (F13, README.md:141-147).
ALL_FEATURES = ("embedding", "stats", "quality", "spectral", "caption_tokens")


def _compute_feature_columns(
    pixels: list[np.ndarray | None], n: int, features: tuple[str, ...]
) -> dict[str, np.ndarray]:
    """Shape-grouped vectorized feature computation; failed rows stay zero."""
    cols: dict[str, np.ndarray] = {}
    if "embedding" in features:
        cols["embedding"] = np.zeros((n, EMBED_DIM), dtype=np.float32)
        cols["phash_calc"] = np.zeros(n, dtype=np.int64)
    if "stats" in features:
        for s in STAT_NAMES:
            cols[s] = np.full(n, np.nan)
    if "quality" in features:
        for f in FLAG_NAMES:
            cols[f] = np.zeros(n, dtype=bool)
        cols["quality_score"] = np.full(n, np.nan)
    if "spectral" in features:
        for s in SPECTRAL_NAMES:
            cols[s] = np.full(n, np.nan)

    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, px in enumerate(pixels):
        if px is not None:
            by_shape.setdefault((px.shape[0], px.shape[1]), []).append(i)

    for (h, w), idxs in by_shape.items():
        ii = np.asarray(idxs, dtype=np.int64)
        stack = np.stack([pixels[i] for i in idxs])
        # fused visual kernel: luminance + pooled DCT computed once per
        # stack, shared by phash/embedding, spectral profile and gray_mean
        vf = batch_visual_features(
            stack,
            want_embedding="embedding" in features,
            want_spectral="spectral" in features,
        )
        if "embedding" in features:
            cols["phash_calc"][ii] = vf["phash"]
            cols["embedding"][ii] = vf["embedding"]
        if "stats" in features or "quality" in features:
            stats = batch_channel_stats(stack, gray=vf["gray"])
        if "stats" in features:
            for s in STAT_NAMES:
                cols[s][ii] = stats[s]
        if "quality" in features:
            q = batch_quality(stats, h, w)
            for f in FLAG_NAMES:
                cols[f][ii] = q[f]
            cols["quality_score"][ii] = q["quality_score"]
        if "spectral" in features:
            for s in SPECTRAL_NAMES:
                cols[s][ii] = vf[s]
    return cols


def _finish_table(
    batch: pa.Table,
    cols: dict[str, np.ndarray],
    status: list[str],
    features: tuple[str, ...],
    drop: tuple[str, ...],
) -> pa.Table:
    out = {n: batch.column(n) for n in batch.column_names if n not in drop}
    out["status"] = pa.array(status, pa.string())
    if "embedding" in features:
        # Failed rows carry an all-zero embedding and phash 0 (status != 'ok'
        # marks them); non-null fixed-width columns survive pandas round-trips
        # without the nullable-int64→float64 corruption.
        out["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(cols["embedding"].ravel(), pa.float32()), EMBED_DIM
        )
        out["phash_calc"] = pa.array(cols["phash_calc"], pa.int64())
    if "stats" in features:
        for s in STAT_NAMES:
            out[s] = pa.array(cols[s], pa.float64(), from_pandas=True)  # NaN → null
    if "quality" in features:
        for f in FLAG_NAMES:
            out[f] = pa.array(cols[f], pa.bool_())
        out["quality_score"] = pa.array(cols["quality_score"], pa.float64(), from_pandas=True)
    if "spectral" in features:
        for s in SPECTRAL_NAMES:
            out[s] = pa.array(cols[s], pa.float64(), from_pandas=True)
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
        status = batch.column("status").to_pylist()
        pix_col = batch.column("pixels")
        hs = batch.column("dec_h").to_numpy(zero_copy_only=False)
        ws = batch.column("dec_w").to_numpy(zero_copy_only=False)
        pixels: list[np.ndarray | None] = [
            np.frombuffer(pix_col[i].as_py(), dtype=np.uint8).reshape(int(hs[i]), int(ws[i]), 3)
            if status[i] == "ok"
            else None
            for i in range(n)
        ]
        cols = _compute_feature_columns(pixels, n, self.features)
        drop = ("pixels",) if self.drop_pixels else ()
        return _finish_table(batch, cols, status, self.features, drop)


class DecodeFeaturize:
    """Fused decode+feature actor: bytes in, features out, pixels never shipped."""

    def __init__(self, features: tuple[str, ...] = ALL_FEATURES):
        self.features = tuple(features)
        _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        status = ["ok"] * n
        raw = batch.column("bytes")
        pixels: list[np.ndarray | None] = [None] * n
        for i in range(n):
            try:
                pixels[i] = codecs.decode_image(raw[i].as_py())
            except codecs.DecodeError as e:
                status[i] = f"decode_error:{str(e).split(':')[0]}"
        cols = _compute_feature_columns(pixels, n, self.features)
        return _finish_table(batch, cols, status, self.features, drop=("bytes",))


# per-worker-process featurizer cache for the task-pool path: Ray's
# prestarted task workers persist across datasets, so stage state (decoder
# tables, feature kernels) is built once per worker process — the same
# load-once-per-worker semantics as an actor pool's __init__, without the
# pool's per-execution actor spin-up (measured ~2.5 s per Dataset run for a
# 32-actor pool, paid again on EVERY execution because Ray Data tears actor
# pools down with the run).
_WORKER_FEATURIZERS: dict[tuple, "DecodeFeaturize | ImageFeatures"] = {}


def _decode_featurize_task(batch: pa.Table, *, features: tuple[str, ...], fused: bool) -> pa.Table:
    key = (features, fused)
    f = _WORKER_FEATURIZERS.get(key)
    if f is None:
        cls = DecodeFeaturize if fused else ImageFeatures
        f = _WORKER_FEATURIZERS[key] = cls(features=features)
    return f(batch)


def feature_stage(
    ds: ray.data.Dataset,
    features: tuple[str, ...] = ALL_FEATURES,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    fused: bool = True,
    pool: str = "task",
) -> ray.data.Dataset:
    """bytes→features, fused decode+featurize (default) or pixels→features.

    ``pool="task"`` (default) runs on Ray's prestarted task workers with the
    featurizer cached once per worker process — zero per-execution spin-up,
    and the stage fuses with the upstream source and downstream per-block
    windows into ONE map operator. ``pool="actor"`` is the actor-pool
    variant for genuinely heavyweight stage state (model weights): same
    semantics, but pays pool startup per Dataset execution.

    ``concurrency=None`` autoscales (task pool: Ray schedules to all CPUs;
    actor pool: sized to the cluster's CPU count — a fixed cap silently
    pinned the decode stage to 8 actors no matter the cluster).
    ``batch_size=None`` keeps one fused task per upstream block (the
    entity-partitioned source sizes blocks for even fan-out); a row-count
    batch size makes Ray re-bundle small blocks into fewer, bigger tasks."""
    if pool == "task":
        # honor a concurrency cap on the task path too (a caller throttling
        # the memory-heavy decode stage must not silently get unbounded task
        # parallelism); tuples take their max — tasks have no pool floor
        cap = (max(concurrency) if isinstance(concurrency, tuple)
               else concurrency)
        return ds.map_batches(
            _decode_featurize_task,
            fn_kwargs={"features": tuple(features), "fused": fused},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=cap,
        )
    if concurrency is None:
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        concurrency = (1, max(2, ncpu))
    cls = DecodeFeaturize if fused else ImageFeatures
    return ds.map_batches(
        cls,
        fn_constructor_kwargs={"features": tuple(features)},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class PatchFeatures:
    """Actor-pool tile extractor: decode bytes once per image, split into a
    ``grid``×``grid`` tile lattice, emit one row per tile with its offsets
    and luminance stats — the ViT-style patch fan-out of a vision training
    pipeline (reference analog: framing a signal into overlapping windows,
    04_feature_extraction_experiment/.../feature_extractor.py frame split).

    Decoder state warms once per actor; pixel arrays never leave the task —
    only (grid² × small-scalar) rows ship. Failed decodes emit a single
    status row (failures are data, never exceptions)."""

    def __init__(self, grid: int = 4):
        if grid < 1:
            raise ValueError(f"grid must be >= 1, got {grid}")
        self.grid = grid
        _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

    def _schema(self) -> pa.schema:
        return pa.schema([
            pa.field("image_id", pa.string()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("tile_row", pa.int32()),
            pa.field("tile_col", pa.int32()),
            pa.field("y0", pa.int32()),
            pa.field("x0", pa.int32()),
            pa.field("th", pa.int32()),
            pa.field("tw", pa.int32()),
            pa.field("tile_mean", pa.float64()),
            pa.field("tile_std", pa.float64()),
            pa.field("status", pa.string()),
        ])

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        raw = batch.column("bytes")
        ids = batch.column("image_id").to_pylist()
        tss = batch.column("ts").to_pylist()
        out: dict[str, list] = {k: [] for k in (
            "image_id", "ts", "tile_row", "tile_col", "y0", "x0", "th", "tw",
            "tile_mean", "tile_std", "status")}
        for i in range(batch.num_rows):
            try:
                px = codecs.decode_image(raw[i].as_py())
            except codecs.DecodeError as e:
                out["image_id"].append(ids[i]); out["ts"].append(tss[i])
                out["tile_row"].append(-1); out["tile_col"].append(-1)
                out["y0"].append(0); out["x0"].append(0)
                out["th"].append(0); out["tw"].append(0)
                out["tile_mean"].append(None); out["tile_std"].append(None)
                out["status"].append(f"decode_error:{str(e).split(':')[0]}")
                continue
            hh, ww = px.shape[0], px.shape[1]
            # ITU-R 601 luminance, same kernel the feature stage uses
            lum = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2])
            ys = np.linspace(0, hh, g + 1).astype(np.int64)
            xs = np.linspace(0, ww, g + 1).astype(np.int64)
            for r in range(g):
                for c in range(g):
                    tile = lum[ys[r]:ys[r + 1], xs[c]:xs[c + 1]]
                    out["image_id"].append(ids[i]); out["ts"].append(tss[i])
                    out["tile_row"].append(r); out["tile_col"].append(c)
                    out["y0"].append(int(ys[r])); out["x0"].append(int(xs[c]))
                    out["th"].append(int(ys[r + 1] - ys[r]))
                    out["tw"].append(int(xs[c + 1] - xs[c]))
                    if tile.size:
                        out["tile_mean"].append(float(tile.mean()))
                        out["tile_std"].append(float(tile.std()))
                    else:
                        out["tile_mean"].append(None); out["tile_std"].append(None)
                    out["status"].append("ok")
        sch = self._schema()
        return pa.table({f.name: pa.array(out[f.name], f.type) for f in sch}, schema=sch)


def patch_stage(
    ds: ray.data.Dataset,
    grid: int = 4,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 128,
) -> ray.data.Dataset:
    """bytes → grid²-tile feature rows in one actor pool (smaller
    ``batch_size`` than the feature stage: output fans out grid²×)."""
    return ds.map_batches(
        PatchFeatures,
        fn_constructor_kwargs={"grid": grid},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ChannelHistogram:
    """Corpus-level per-channel pixel histogram: each batch decodes its
    images and emits ONE partial (channel, bin, count) table — 768 rows per
    batch regardless of image count, the fixed-size-partial shape that
    scales to any corpus (same pattern as the HLL register rows)."""

    def __init__(self, bins: int = 256):
        if not (1 <= bins <= 256) or 256 % bins != 0:
            # scale = 256 // bins: bins > 256 would floor-divide pixels by 0
            # (numpy yields 0s -> every pixel lands in bin 0, silently) and
            # a non-divisor leaves pixels past the last bin (bincount shape
            # mismatch crashes the actor mid-stream)
            raise ValueError(f"bins must divide 256 (1..256), got {bins}")
        self.bins = bins
        _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = np.zeros((3, self.bins), dtype=np.int64)
        raw = batch.column("bytes")
        scale = 256 // self.bins
        for i in range(batch.num_rows):
            try:
                px = codecs.decode_image(raw[i].as_py())
            except codecs.DecodeError:
                continue
            for c in range(3):
                counts[c] += np.bincount(
                    px[:, :, c].reshape(-1) // scale, minlength=self.bins
                ).astype(np.int64)
        ch = np.repeat(np.arange(3, dtype=np.int32), self.bins)
        bn = np.tile(np.arange(self.bins, dtype=np.int32), 3)
        return pa.table({
            "channel": pa.array(ch, pa.int32()),
            "bin": pa.array(bn, pa.int32()),
            "count": pa.array(counts.reshape(-1), pa.int64()),
        })


def channel_histogram(
    ds: ray.data.Dataset,
    bins: int = 256,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 128,
) -> ray.data.Dataset:
    """bytes → global per-channel histogram: actor-pool partials combined
    with the map-side grouped sum (3×bins final rows)."""
    from .aggregates import grouped_agg_fast

    partials = ds.map_batches(
        ChannelHistogram,
        fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return grouped_agg_fast(
        partials, keys=["channel", "bin"],
        specs=[("count", "count", "sum")], num_final_partitions=1,
    )
