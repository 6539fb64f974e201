"""Text-analysis stage over a documents table: token counting, quality
signals, language ID, fingerprints, SimHash — one vectorized ``map_batches``.

The training-data-pipeline operators a 100 TB corpus needs (language ID,
quality scoring, exact-dup fingerprinting), recast from the reference's
per-record quality gates (Q5, 00_audio_data_collection_experiment/
audio_format_assessment.py:48-300). Stateful pieces (compiled regexes,
stopword tables) live in the actor (once per worker), per-batch work is pure
string kernels.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.textfx import (
    detect_lang,
    md5_fingerprint,
    rolling_fingerprint,
    simhash64,
    text_quality,
    ws_tokens,
)

QUALITY_COLS = ("n_chars_calc", "n_tokens", "punct_ratio", "digit_ratio", "upper_ratio", "avg_token_len")


class TextFeatures:
    """Callable-class actor stage: documents → per-doc text features."""

    def __init__(
        self,
        text_col: str = "text",
        quality: bool = True,
        lang: bool = True,
        fingerprints: bool = True,
        simhash: bool = False,
    ):
        self.text_col = text_col
        self.quality = quality
        self.lang = lang
        self.fingerprints = fingerprints
        self.simhash = simhash
        # warm compiled regexes once per actor
        from ..functions import textfx  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = {n: batch.column(n) for n in batch.column_names}
        if self.quality:
            qs = [text_quality(t or "") for t in texts]
            out["n_chars_calc"] = pa.array([int(q["n_chars"]) for q in qs], pa.int64())
            out["n_tokens"] = pa.array([int(q["n_tokens"]) for q in qs], pa.int64())
            for c in ("punct_ratio", "digit_ratio", "upper_ratio", "avg_token_len"):
                out[c] = pa.array([q[c] for q in qs], pa.float64())
        if self.lang:
            out["lang_pred"] = pa.array([detect_lang(t or "") for t in texts], pa.string())
        if self.fingerprints:
            out["fingerprint_md5"] = pa.array(
                [md5_fingerprint(t or "") for t in texts], pa.string()
            )
            out["fingerprint_rolling"] = pa.array(
                [rolling_fingerprint(t or "") for t in texts], pa.int64()
            )
        if self.simhash:
            out["simhash"] = pa.array([simhash64(t or "") for t in texts], pa.int64())
        return pa.table(out)


def text_features(
    ds: ray.data.Dataset,
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 1024,
    **kwargs,
) -> ray.data.Dataset:
    return ds.map_batches(
        TextFeatures,
        fn_constructor_kwargs={"text_col": text_col, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def token_count_table(ds: ray.data.Dataset, id_col: str, text_col: str = "text") -> ray.data.Dataset:
    """Minimal projection: (id, token_count) with python str.split semantics."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "token_count": pa.array([len(ws_tokens(t or "")) for t in texts], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
