"""Per-record preprocessing chain — the image recast of the reference's
waveform preprocessing operators (SURVEY.md §2.2, M1–M15), as one fused
vectorized ``map_batches`` stage over decoded pixels.

| here              | reference analog | citation |
|-------------------|------------------|----------|
| peak_normalize    | M1 librosa.util.normalize | 04_feature_extraction_experiment/feature_extractor.py:137 |
| sharpen (3x3)     | M2/M3 pre-emphasis / Butterworth high-pass | core/feature_extractor.py:69; 04/feature_extractor.py:143-146 |
| border_crop       | M4 silence trim (top_db) | core/feature_extractor.py:72 |
| median3           | M5 medfilt(kernel=3) | 04/feature_extractor.py:264 |
| box_smooth (3x3)  | M6 Savitzky–Golay smoothing | 04/feature_extractor.py:290 |
| zscore_clip       | M7 z-score standardize + clip | 04/feature_extraction.py:122-141 |
| robust_iqr        | M8 median/IQR normalize | 05_dtw_alignment_experiment/dtw_alignment.py:388-411 |
| content_region    | M9/M10 VAD gating → content bounding box | 04/process_audio.py:100-132 |

Each op consumes/produces float64 HxWx3 in [0,1] (chain order preserved);
the stage decodes bytes, applies the configured chain, and re-emits processed
pixels (+ per-op metadata columns). A config list drives chain construction —
the validated-config answer to the reference's YAML pipeline (S6,
04/process_audio.py:14-26); unknown op names fail at construction, not
mid-job (anti-capability: dead config, SURVEY.md §7.7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs

# ---------------------------------------------------------------- kernels
# all kernels: (H, W, 3) float64 in [0, 1] → same


def peak_normalize(x: np.ndarray) -> np.ndarray:
    peak = np.abs(x).max()
    return x / peak if peak > 0 else x


def _conv3(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """3x3 convolution with edge padding, vectorized via shifted adds."""
    p = np.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros_like(x)
    for di in range(3):
        for dj in range(3):
            if k[di, dj] != 0.0:
                out += k[di, dj] * p[di : di + x.shape[0], dj : dj + x.shape[1], :]
    return out


_SHARPEN_K = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], dtype=np.float64)
_BOX_K = np.full((3, 3), 1.0 / 9.0)


def sharpen(x: np.ndarray) -> np.ndarray:
    return np.clip(_conv3(x, _SHARPEN_K), 0.0, 1.0)


def box_smooth(x: np.ndarray) -> np.ndarray:
    return _conv3(x, _BOX_K)


def median3(x: np.ndarray) -> np.ndarray:
    """3x3 median filter (impulse denoise), vectorized via stacked shifts."""
    p = np.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    shifts = [
        p[di : di + x.shape[0], dj : dj + x.shape[1], :] for di in range(3) for dj in range(3)
    ]
    return np.median(np.stack(shifts), axis=0)


def zscore_clip(x: np.ndarray, clip: float = 3.0) -> np.ndarray:
    m, s = x.mean(), x.std()
    if s == 0:
        return np.zeros_like(x)
    return np.clip((x - m) / s, -clip, clip)


def robust_iqr(x: np.ndarray, clip: float = 3.0) -> np.ndarray:
    med = np.median(x)
    q1, q3 = np.percentile(x, [25.0, 75.0])
    iqr = q3 - q1
    if iqr == 0:
        return np.zeros_like(x)
    return np.clip((x - med) / iqr, -clip, clip)


def border_crop(x: np.ndarray, threshold: float = 0.02) -> np.ndarray:
    """Trim near-constant borders (silence-trim analog): drop leading/trailing
    rows/cols whose deviation from the image mean is below ``threshold``."""
    dev = np.abs(x - x.mean()).mean(axis=2)
    row_act = dev.mean(axis=1) > threshold
    col_act = dev.mean(axis=0) > threshold
    if not row_act.any() or not col_act.any():
        return x
    r0, r1 = np.argmax(row_act), len(row_act) - np.argmax(row_act[::-1])
    c0, c1 = np.argmax(col_act), len(col_act) - np.argmax(col_act[::-1])
    return x[r0:r1, c0:c1, :]


def content_region(x: np.ndarray, threshold: float = 0.01) -> np.ndarray:
    """VAD-gating analog: keep the bounding box of high-local-variance cells
    (8x8 tiles), i.e. the "speech" region of the image."""
    h, w, _ = x.shape
    th, tw = max(1, h // 8), max(1, w // 8)
    act_rows, act_cols = [], []
    for i in range(0, h, th):
        if x[i : i + th].std() > threshold:
            act_rows.append(i)
    for j in range(0, w, tw):
        if x[:, j : j + tw].std() > threshold:
            act_cols.append(j)
    if not act_rows or not act_cols:
        return x
    return x[
        act_rows[0] : min(h, act_rows[-1] + th),
        act_cols[0] : min(w, act_cols[-1] + tw),
        :,
    ]


def spectral_subtract(x: np.ndarray, strength: float = 1.0) -> np.ndarray:
    """Noise-floor subtraction (M11–M13 spectral-subtraction / Wiener
    denoise analog, 04_feature_extraction_experiment/process_audio.py:75-98):
    estimate the smooth background with a box blur and subtract it from the
    signal, keeping the positive residual plus the background mean — removes
    slowly-varying 'noise floor' while preserving detail energy."""
    background = _conv3(x, _BOX_K)
    residual = x - strength * background
    return np.clip(residual + background.mean(), 0.0, 1.0)


def rms_normalize(x: np.ndarray, target_rms: float = 0.25) -> np.ndarray:
    """Gain normalization to a target RMS level (M14/M15 loudness / RMS gain
    analog, 04/feature_extractor.py:137-141): scale pixel energy so the
    root-mean-square equals ``target_rms``, clipped back into [0, 1]."""
    rms = float(np.sqrt(np.mean(x**2)))
    if rms == 0:
        return x
    return np.clip(x * (target_rms / rms), 0.0, 1.0)


OPS = {
    "peak_normalize": peak_normalize,
    "sharpen": sharpen,
    "box_smooth": box_smooth,
    "median3": median3,
    "zscore_clip": zscore_clip,
    "robust_iqr": robust_iqr,
    "border_crop": border_crop,
    "content_region": content_region,
    "spectral_subtract": spectral_subtract,
    "rms_normalize": rms_normalize,
}


class Preprocess:
    """Actor stage: decode → apply configured op chain → emit processed pixels.

    The chain is validated at construction; per-row failures become
    status rows (never exceptions).
    """

    def __init__(self, chain: tuple[str, ...] = ("peak_normalize", "sharpen")):
        unknown = [op for op in chain if op not in OPS]
        if unknown:
            raise ValueError(f"unknown preprocess ops: {unknown}; valid: {sorted(OPS)}")
        self.chain = [(name, OPS[name]) for name in chain]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        raw = batch.column("bytes")
        status = ["ok"] * n
        out_px: list[bytes | None] = [None] * n
        out_h = np.zeros(n, dtype=np.int32)
        out_w = np.zeros(n, dtype=np.int32)
        for i in range(n):
            try:
                px = codecs.decode_image(raw[i].as_py())
            except codecs.DecodeError as e:
                status[i] = f"decode_error:{str(e).split(':')[0]}"
                continue
            x = px.astype(np.float64) / 255.0
            for _name, fn in self.chain:
                x = fn(x)
            # re-quantize for the sink (normalized chains re-expand to [0,1])
            lo, hi = float(x.min()), float(x.max())
            if hi > lo:
                x = (x - lo) / (hi - lo)
            q = np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)
            out_px[i] = q.tobytes()
            out_h[i], out_w[i] = q.shape[0], q.shape[1]
        cols = {name: batch.column(name) for name in batch.column_names if name != "bytes"}
        cols["pixels"] = pa.array(out_px, pa.binary())
        cols["proc_h"] = pa.array(out_h)
        cols["proc_w"] = pa.array(out_w)
        cols["status"] = pa.array(status, pa.string())
        return pa.table(cols)


def preprocess_stage(
    ds: ray.data.Dataset,
    chain: tuple[str, ...] = ("peak_normalize", "sharpen"),
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> ray.data.Dataset:
    return ds.map_batches(
        Preprocess,
        fn_constructor_kwargs={"chain": tuple(chain)},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------- entity parser

def parse_entity_columns(
    ds: ray.data.Dataset,
    path_col: str = "image_id",
    pattern: str = r"(?P<session>[a-z]+)(?P<entity_no>\d+)",
) -> ray.data.Dataset:
    """Filename→entity parser kept for ingest parity (M16/M17,
    00_audio_data_collection_experiment/audio_quality_assessment.py:74-89) —
    real pipelines should carry id columns instead (SURVEY.md §7.7)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(path_col)
        ex = pc.extract_regex(col, pattern)
        session = pc.struct_field(ex, "session")
        entity_no = pc.struct_field(ex, "entity_no")
        t = t.append_column("session", session)
        t = t.append_column("entity_no", pc.cast(entity_no, pa.int64()))
        role = pc.if_else(
            pc.match_substring(col, "student"), pa.scalar("student"), pa.scalar("teacher")
        )
        return t.append_column("role", role)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
