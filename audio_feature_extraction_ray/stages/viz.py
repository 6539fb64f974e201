"""K5: PNG visualization sink — the reference's per-file feature plots
(04_feature_extraction_experiment/feature_extraction.py:361-437: a stacked
matplotlib figure of an MFCC heatmap + F0 / energy / ZCR line plots saved as
one PNG per input) recast as a distributed Ray Data sink: pure-NumPy
rendering (colormap LUT heatmap + rasterized polylines), the engine's own
PNG encoder (functions/codecs.py), one file per row written from
``map_batches`` tasks with skip-if-exists resume, and a manifest dataset as
the stage output.

No matplotlib/seaborn in this environment — the renderer is deliberately
minimal (heatmap + line strips + separators), but the sink plumbing
(distributed write, resume, manifest lineage) is the real deliverable at
100 TB: rendering is embarrassingly parallel and never shuffles.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.codecs import _encode_png

# viridis anchor points (public domain colormap definition, 9 anchors
# linearly interpolated to a 256-entry LUT — visually close to the
# reference's `cmap='viridis'` heatmaps)
_VIRIDIS_ANCHORS = np.array(
    [
        (68, 1, 84), (72, 40, 120), (62, 74, 137), (49, 104, 142),
        (38, 130, 142), (31, 158, 137), (53, 183, 121), (109, 205, 89),
        (180, 222, 44), (253, 231, 37),
    ],
    dtype=np.float64,
)


def _viridis_lut() -> np.ndarray:
    """(256, 3) uint8 LUT from the anchor points."""
    xs = np.linspace(0.0, 1.0, len(_VIRIDIS_ANCHORS))
    t = np.linspace(0.0, 1.0, 256)
    lut = np.stack(
        [np.interp(t, xs, _VIRIDIS_ANCHORS[:, c]) for c in range(3)], axis=1
    )
    return np.clip(np.rint(lut), 0, 255).astype(np.uint8)


_LUT = _viridis_lut()


def render_heatmap(mat: np.ndarray, scale: int = 4) -> np.ndarray:
    """Matrix → viridis heatmap, nearest-neighbor upscaled ``scale``×.

    NaNs render black. Degenerate (constant) matrices render mid-scale.
    """
    m = np.asarray(mat, dtype=np.float64)
    if m.ndim == 1:
        m = m[None, :]
    finite = np.isfinite(m)
    if finite.any():
        lo = float(m[finite].min())
        hi = float(m[finite].max())
    else:
        lo, hi = 0.0, 1.0
    rng = hi - lo
    norm = (m - lo) / rng if rng > 0 else np.full_like(m, 0.5)
    idx = np.clip(np.rint(np.nan_to_num(norm, nan=0.0) * 255), 0, 255).astype(np.uint8)
    px = _LUT[idx]
    px[~finite] = 0
    if scale > 1:
        px = np.repeat(np.repeat(px, scale, axis=0), scale, axis=1)
    return px


def render_line_strip(
    y: np.ndarray, height: int = 48, width: int | None = None,
    color: tuple[int, int, int] = (253, 231, 37), bg: int = 16,
) -> np.ndarray:
    """Rasterize a 1-D series as a connected polyline strip (vectorized:
    adjacent samples paint the vertical span between their pixel rows, so
    the line is gapless like a plot trace). NaN samples leave gaps."""
    y = np.asarray(y, dtype=np.float64).ravel()
    n = len(y)
    width = width or max(n, 2)
    px = np.full((height, width, 3), bg, dtype=np.uint8)
    finite = np.isfinite(y)
    if n == 0 or not finite.any():
        return px
    lo, hi = float(y[finite].min()), float(y[finite].max())
    rng = hi - lo
    norm = (y - lo) / rng if rng > 0 else np.full_like(y, 0.5)
    rows = (height - 2) - np.rint(np.nan_to_num(norm, nan=0.0) * (height - 3)).astype(
        np.int64
    )
    cols = (
        np.rint(np.linspace(0, width - 1, n)).astype(np.int64)
        if n > 1
        else np.array([width // 2])
    )
    col_arr = np.array(color, dtype=np.uint8)
    # vertical span between consecutive finite samples → gapless trace
    for i in range(n):
        if not finite[i]:
            continue
        r1 = rows[i]
        if i > 0 and finite[i - 1]:
            r0 = rows[i - 1]
            a, b = (r0, r1) if r0 <= r1 else (r1, r0)
            px[a : b + 1, cols[i]] = col_arr
        else:
            px[r1, cols[i]] = col_arr
    return px


def render_feature_panel(
    heatmap: np.ndarray | None,
    series: list[np.ndarray],
    width: int = 256,
    heat_scale: int = 4,
) -> np.ndarray:
    """Stack a heatmap + line strips into one image (the reference's
    4-subplot figure), separated by 2-px rules, padded/cropped to ``width``."""
    panels = []
    if heatmap is not None:
        panels.append(render_heatmap(heatmap, scale=heat_scale))
    for s in series:
        panels.append(render_line_strip(s, width=width))
    sep = np.full((2, width, 3), 96, dtype=np.uint8)
    fitted = []
    for p in panels:
        h, w = p.shape[:2]
        if w < width:
            pad = np.zeros((h, width - w, 3), dtype=np.uint8)
            p = np.concatenate([p, pad], axis=1)
        elif w > width:
            p = p[:, :width]
        fitted.append(p)
        fitted.append(sep)
    return np.concatenate(fitted[:-1], axis=0) if fitted else sep


def write_feature_pngs(
    ds: ray.data.Dataset,
    out_dir: str,
    id_col: str,
    matrix_col: str | None = None,
    matrix_shape: tuple[int, int] | None = None,
    series_cols: list[str] | None = None,
    width: int = 256,
    overwrite: bool = False,
) -> ray.data.Dataset:
    """Distributed K5 sink: one ``<id>.png`` per row under ``out_dir``.

    ``matrix_col`` is a list<float> column reshaped to ``matrix_shape`` for
    the heatmap panel; each of ``series_cols`` (list<float>) adds a line
    strip. Existing files are skipped unless ``overwrite`` (task-level
    resume — re-running a failed job only renders missing ids). Returns the
    manifest dataset (id, path, w, h, n_bytes, skipped); consuming it drives
    the write.
    """
    series_cols = series_cols or []
    os.makedirs(out_dir, exist_ok=True)

    def render_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        mats = t.column(matrix_col).to_pylist() if matrix_col else [None] * len(ids)
        series_vals = {c: t.column(c).to_pylist() for c in series_cols}
        paths, ws, hs, sizes, skipped = [], [], [], [], []
        for i, rid in enumerate(ids):
            path = os.path.join(out_dir, f"{rid}.png")
            if not overwrite and os.path.exists(path):
                paths.append(path)
                ws.append(0)
                hs.append(0)
                sizes.append(os.path.getsize(path))
                skipped.append(True)
                continue
            heat = None
            if mats[i] is not None:
                m = np.asarray(mats[i], dtype=np.float64)
                heat = m.reshape(matrix_shape) if matrix_shape else m[None, :]
            panel = render_feature_panel(
                heat, [np.asarray(series_vals[c][i], dtype=np.float64)
                       for c in series_cols], width=width,
            )
            data = _encode_png(panel)
            # uuid-suffixed tmp (checkpoint.py protocol): a retried/duplicate
            # task writing the same id must never interleave into one tmp
            # file and publish a torn PNG via os.replace.
            tmp = f"{path}.tmp-{uuid.uuid4().hex}"
            try:
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)  # atomic: resume never sees partial files
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            paths.append(path)
            ws.append(panel.shape[1])
            hs.append(panel.shape[0])
            sizes.append(len(data))
            skipped.append(False)
        return pa.table(
            {
                id_col: t.column(id_col),
                "path": pa.array(paths, pa.string()),
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "skipped": pa.array(skipped, pa.bool_()),
            }
        )

    return ds.map_batches(render_batch, batch_format="pyarrow", zero_copy_batch=True)
