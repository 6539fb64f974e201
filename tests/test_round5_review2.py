"""Regression pins for the round-5 second review sweep (less-audited
modules): target_encode NaN poisoning, align null-embedding stacking,
codec dimension contract, shard-manifest resume completeness, banded-DTW
memory bound, synth-source prefix lockstep, viz tmp hygiene."""

import math
import os
import struct
import tracemalloc
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def test_target_encode_all_null_category_gets_prior(ray_session):
    """A category whose targets are ALL null must get the smoothed prior,
    not poison the global mean into NaN for every category."""
    from audio_feature_extraction_ray.stages.scaling import target_encode

    t = pa.table({"cat": ["a", "a", "b", "b", "c"],
                  "y": [1.0, 3.0, 5.0, None, None]})
    out = target_encode(rd.from_arrow(t), "cat", "y", smoothing=2.0).to_pandas()
    assert not out["cat_te"].isna().any()
    mu = (1 + 3 + 5) / 3  # global mean over non-null targets
    c_enc = out.loc[out["cat"] == "c", "cat_te"].iloc[0]
    assert math.isclose(c_enc, mu)  # n_g -> 0 limit
    a_enc = out.loc[out["cat"] == "a", "cat_te"].iloc[0]
    assert math.isclose(a_enc, (4 + 2.0 * mu) / (2 + 2.0))


def test_align_pairs_null_embedding_rows_drop_not_crash(ray_session):
    """A null embedding slot must be dropped WITH its timestamp (no
    flatten() misalignment, no IndexError killing the group task)."""
    from audio_feature_extraction_ray.stages.align import (align_pairs,
                                                           pairwise_quality)

    def tbl(emb_rows):
        n = len(emb_rows)
        roles = ["teacher"] * (n // 2) + ["student"] * (n - n // 2)
        return pa.table({
            "pair": ["p1"] * n,
            "role": roles,
            "ts": pa.array([1_000_000 * i for i in range(n)], pa.int64()),
            "emb": pa.array(emb_rows, pa.list_(pa.float64(), 2)),
        })

    rows = [[1.0, 0.0], [0.0, 1.0], None, [1.0, 1.0], [0.5, 0.5], [0.1, 0.9]]
    res = align_pairs(rd.from_arrow(tbl(rows)), "pair", "role", "ts", "emb").to_pandas()
    assert list(res["status"]) == ["ok"]
    # dropping the null row must equal aligning the null-free sequence
    clean = [r for r in rows if r is not None]
    ts_keep = [i for i, r in enumerate(rows) if r is not None]
    t2 = pa.table({
        "pair": ["p1"] * 5,
        "role": ["teacher", "teacher", "student", "student", "student"],
        "ts": pa.array([1_000_000 * i for i in ts_keep], pa.int64()),
        "emb": pa.array(clean, pa.list_(pa.float64(), 2)),
    })
    ref = align_pairs(rd.from_arrow(t2), "pair", "role", "ts", "emb").to_pandas()
    assert res["rmse_ms"].iloc[0] == ref["rmse_ms"].iloc[0]

    q = pairwise_quality(rd.from_arrow(tbl(rows)), "pair", "role", "emb").to_pandas()
    assert list(q["status"]) == ["ok"]
    assert np.isfinite(q["psnr_db"].iloc[0])


def test_decode_contract_rejects_non_hxwx3():
    """Header-consistent but contract-violating payloads (c != 3, zero
    dims) must raise DecodeError at decode time, not crash feature kernels
    downstream with IndexError/ValueError."""
    from audio_feature_extraction_ray.functions import codecs

    bad = [
        b"RAW1" + struct.pack("<III", 2, 2, 4) + b"\0" * 16,   # 4 channels
        b"RAW1" + struct.pack("<III", 0, 2, 3),                # zero dim
        b"RAW1" + struct.pack("<III", 2, 0, 3),
    ]
    for data in bad:
        with pytest.raises(codecs.DecodeError):
            codecs.decode_image(data)
    ihdr = struct.pack(">IIBBBBB", 0, 2, 8, 2, 0, 0, 0)  # w=0
    png = (codecs._PNG_SIG + codecs._png_chunk(b"IHDR", ihdr)
           + codecs._png_chunk(b"IDAT", zlib.compress(b""))
           + codecs._png_chunk(b"IEND", b""))
    with pytest.raises(codecs.DecodeError):
        codecs._decode_png(png)


def test_partial_resume_manifest_is_row_complete(ray_session, tmp_path):
    """After a partial resume, write_training_shards must return one
    manifest row per shard — committed shards included — not only the
    shards rewritten this run."""
    from audio_feature_extraction_ray.sources.images import synth_images
    from audio_feature_extraction_ray.stages.batching import \
        write_training_shards

    out = str(tmp_path / "shards")
    man1 = write_training_shards(synth_images(16, seed=5), out,
                                 batch_size=4, n_shards=4)
    assert man1.num_rows == 4
    # simulate a crash that lost two shards' commit markers
    removed = sorted(os.listdir(os.path.join(out, "_manifest")))[:2]
    for name in removed:
        if name.startswith("_"):
            continue
        os.remove(os.path.join(out, "_manifest", name))
    man2 = write_training_shards(synth_images(16, seed=5), out,
                                 batch_size=4, n_shards=4)
    assert man2.num_rows == 4, "resume manifest must cover ALL shards"
    assert sorted(man2.column("partition_id").to_pylist()) == sorted(
        man1.column("partition_id").to_pylist())


def test_banded_dtw_memory_is_band_bounded():
    """The DP accumulator must be O(T * band), not O(T^2): a 2000x2000
    pair at band 5% allocates ~3.5 MB banded vs 32 MB full-matrix."""
    from audio_feature_extraction_ray.stages.align import dtw_align

    rng = np.random.default_rng(0)
    a = rng.normal(size=(2000, 4))
    b = rng.normal(size=(2000, 4))
    tracemalloc.start()
    try:
        path = dtw_align(a, b, band_frac=0.05)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    assert peak < 12e6, f"full-matrix regression: peak {peak/1e6:.1f} MB"
    # path still valid + monotone, endpoints anchored
    assert path[0] == (0, 0) and path[-1] == (1999, 1999)
    di = np.diff([p[0] for p in path])
    dj = np.diff([p[1] for p in path])
    assert ((di >= 0) & (dj >= 0) & ((di + dj) > 0)).all()


def test_entity_meta_is_entity_plan_prefix():
    """_entity_meta and _entity_plan share the rng-draw prefix helper; any
    drift silently corrupts the hot-chunk plan (clamped ranges drop a hot
    entity's trailing events)."""
    from audio_feature_extraction_ray.sources.images import (_entity_meta,
                                                             _entity_plan)

    for eid in range(0, 40):
        meta = _entity_meta(eid, 40, 7, 4, 0.05, 8)
        plan = _entity_plan(eid, 40, 7, 4, 0.05, 8)
        assert meta == plan[:3]
        n_ev, h, w = meta
        assert plan[3].shape == (h, w, 3)
        assert len(plan[4]) == n_ev


def test_viz_writer_leaves_no_tmp_files(ray_session, tmp_path):
    from audio_feature_extraction_ray.sources.images import synth_images
    from audio_feature_extraction_ray.stages.features import feature_stage
    from audio_feature_extraction_ray.stages.viz import write_feature_pngs

    out = str(tmp_path / "pngs")
    feats = feature_stage(synth_images(6, seed=3), concurrency=(1, 2))
    res = write_feature_pngs(feats.filter(expr="status == 'ok'"), out,
                             id_col="image_id")
    res.materialize()
    names = os.listdir(out)
    assert names and all(n.endswith(".png") for n in names)
