"""Preprocessing chain (M1–M15 recast), entity parser, evaluation report."""

import json

import numpy as np
import pytest
import ray

from audio_feature_extraction_ray.functions import codecs
from audio_feature_extraction_ray.pipelines.evaluator import generate_evaluation_report
from audio_feature_extraction_ray.sources.images import synth_images
from audio_feature_extraction_ray.stages.features import feature_stage
from audio_feature_extraction_ray.stages.preprocess import (
    OPS,
    Preprocess,
    border_crop,
    content_region,
    median3,
    parse_entity_columns,
    peak_normalize,
    preprocess_stage,
    robust_iqr,
    sharpen,
    zscore_clip,
)


def test_kernels_shapes_and_ranges():
    rng = np.random.default_rng(0)
    x = rng.random((16, 24, 3))
    for name, fn in OPS.items():
        out = fn(x)
        assert out.ndim == 3 and out.shape[2] == 3, name
        assert np.isfinite(out).all(), name
    assert peak_normalize(x).max() == pytest.approx(1.0)
    assert abs(zscore_clip(x).mean()) < 0.1
    assert np.all(np.abs(robust_iqr(x)) <= 3.0)


def test_border_crop_trims_constant_borders():
    x = np.zeros((20, 20, 3)) + 0.5
    x[5:15, 5:15, :] = np.random.default_rng(1).random((10, 10, 3))
    out = border_crop(x)
    assert out.shape[0] <= 14 and out.shape[1] <= 14


def test_median3_removes_impulse():
    x = np.full((9, 9, 3), 0.5)
    x[4, 4, :] = 1.0  # impulse
    out = median3(x)
    assert out[4, 4, 0] == pytest.approx(0.5)


def test_preprocess_stage_runs_and_flags_failures():
    ds = synth_images(10, seed=42)
    out = preprocess_stage(ds, chain=("peak_normalize", "median3"), concurrency=(1, 2)).to_pandas()
    assert (out["status"] != "ok").sum() >= 0
    ok = out[out["status"] == "ok"]
    assert len(ok) > 0
    px = np.frombuffer(ok.iloc[0]["pixels"], np.uint8)
    assert len(px) == ok.iloc[0]["proc_h"] * ok.iloc[0]["proc_w"] * 3


def test_preprocess_invalid_chain_fails_fast():
    with pytest.raises(ValueError, match="unknown preprocess ops"):
        Preprocess(chain=("peak_normalize", "nonsense"))


def test_parse_entity_columns():
    ds = synth_images(5, seed=42).select_columns(["image_id"])
    out = parse_entity_columns(ds).to_pandas()
    assert (out["session"] == "img").all()
    assert out["entity_no"].between(0, 4).all()
    assert set(out["role"]) <= {"teacher", "student"}


def test_evaluation_report(tmp_path):
    feats = feature_stage(synth_images(15, seed=42), concurrency=(1, 2), batch_size=32)
    path = str(tmp_path / "report.json")
    report = generate_evaluation_report(
        feats.drop_columns(["caption_tokens", "embedding"]),
        stat_cols=["gray_mean", "std_r"],
        flag_cols=["contrast_ok", "exposure_ok"],
        quantile_col="quality_score",
        out_path=path,
    )
    assert report["feature_statistics"]["n_rows"] > 0
    assert 0.0 <= report["quality_metrics"]["contrast_ok_rate"] <= 1.0
    assert 0.0 <= report["distribution"]["quality_score_p50"] <= 1.0
    on_disk = json.load(open(path))
    assert on_disk["feature_statistics"]["n_rows"] == report["feature_statistics"]["n_rows"]
