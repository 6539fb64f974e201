"""Distributed decode+feature pipeline vs serial oracle (FIXTURES.md invariants
1, 3, 4, 5, 6): feature allclose per entity×timestamp, decoded-pixel parity,
byte-exact captions, failure rows as data, finiteness."""

import numpy as np
import pandas as pd
import pyarrow as pa

from audio_feature_extraction_ray.functions import codecs
from audio_feature_extraction_ray.functions.imagefx import hamming64
from audio_feature_extraction_ray.functions.oracle import oracle_features
from audio_feature_extraction_ray.sources.images import generate_entity_events, synth_images
from audio_feature_extraction_ray.stages.decode import decode_stage
from audio_feature_extraction_ray.stages.features import STAT_NAMES, feature_stage

N_ENTITIES = 40


def _engine_df() -> pd.DataFrame:
    ds = synth_images(N_ENTITIES, seed=42)
    out = feature_stage(ds, concurrency=(1, 2), batch_size=64)
    return out.to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)


def _oracle_df() -> pd.DataFrame:
    t = generate_entity_events(np.arange(N_ENTITIES), N_ENTITIES, seed=42)
    return oracle_features(t).sort_values(["image_id", "ts"]).reset_index(drop=True)


def test_pipeline_matches_oracle():
    eng, orc = _engine_df(), _oracle_df()
    assert len(eng) == len(orc)
    assert (eng["image_id"].to_numpy() == orc["image_id"].to_numpy()).all()
    assert (eng["status"].to_numpy() == orc["status"].to_numpy()).all()
    # byte-exact caption passthrough
    assert (eng["caption"].to_numpy() == orc["caption"].to_numpy()).all()
    ok = (eng["status"] == "ok").to_numpy()
    assert ok.sum() > 0 and (~ok).sum() > 0  # corrupt rows present, as data
    # scalar feature allclose at every entity×timestamp
    from audio_feature_extraction_ray.stages.features import SPECTRAL_NAMES

    for col in STAT_NAMES + SPECTRAL_NAMES + ["quality_score"]:
        a = eng.loc[ok, col].to_numpy(dtype=np.float64)
        b = orc.loc[ok, col].to_numpy(dtype=np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12, err_msg=col)
        assert np.isfinite(a).all(), col
    # embedding allclose
    ea = np.stack(eng.loc[ok, "embedding"].to_list()).astype(np.float64)
    eb = np.stack(orc.loc[ok, "embedding"].to_list()).astype(np.float64)
    np.testing.assert_allclose(ea, eb, rtol=1e-6, atol=1e-7)
    # recomputed phash equals stored phash for lossless fmts; near for lossy
    lossless = ok & eng["fmt"].isin(["raw", "ppm", "png"]).to_numpy()
    assert (eng.loc[lossless, "phash_calc"].to_numpy() == orc.loc[lossless, "phash"].to_numpy()).all()
    # perceptual-hash proximity under lossy encoding (tiny images excluded —
    # the authoritative lossy parity gate is PSNR >= 40 dB, test_codecs.py)
    lossy = ok & (eng["fmt"] == "jpgl").to_numpy() & (eng[["w", "h"]].min(axis=1) >= 8).to_numpy()
    hams = [hamming64(int(a), int(b)) for a, b in
            zip(eng.loc[lossy, "phash_calc"], eng.loc[lossy, "phash"])]
    assert max(hams, default=0) <= 8
    assert (eng.loc[ok, "token_count"].to_numpy() == orc.loc[ok, "token_count"].to_numpy()).all()


def test_decoded_pixel_parity_and_psnr():
    t = generate_entity_events(np.arange(10), 10, seed=42)
    import ray

    ds = ray.data.from_arrow(t)
    dec = decode_stage(ds, concurrency=(1, 2), batch_size=32, keep_bytes=True).to_pandas()
    for _, row in dec.iterrows():
        if row["status"] != "ok":
            continue
        px = np.frombuffer(row["pixels"], np.uint8).reshape(row["dec_h"], row["dec_w"], 3)
        ref = codecs.decode_image(row["bytes"])
        assert np.array_equal(px, ref)  # decoded pixels exactly reproducible
        if row["fmt"] == "jpgl":
            assert row["dec_h"] == row["h"] and row["dec_w"] == row["w"]


def test_unfused_path_matches_fused():
    ds = synth_images(10, seed=42)
    fused = feature_stage(ds, concurrency=(1, 2), batch_size=64, fused=True).to_pandas()
    ds2 = synth_images(10, seed=42)
    dec = decode_stage(ds2, concurrency=(1, 2), batch_size=64)
    unfused = feature_stage(dec, concurrency=(1, 2), batch_size=64, fused=False).to_pandas()
    f = fused.sort_values(["image_id", "ts"]).reset_index(drop=True)
    u = unfused.sort_values(["image_id", "ts"]).reset_index(drop=True)
    assert (f["status"].to_numpy() == u["status"].to_numpy()).all()
    ok = (f["status"] == "ok").to_numpy()
    for col in ["quality_score", "token_count"]:
        assert (f.loc[ok, col].to_numpy() == u.loc[ok, col].to_numpy()).all(), col


def test_feature_selection_subset():
    ds = synth_images(5, seed=42)
    out = feature_stage(ds, features=("stats",), concurrency=1, batch_size=64)
    cols = set(out.schema().names)
    assert "mean_r" in cols and "embedding" not in cols and "quality_score" not in cols
