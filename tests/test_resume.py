"""Kill-and-resume equivalence (FIXTURES.md invariant 7): an interrupted
partitioned write, resumed, must produce byte-identical content and skip
committed partitions."""

import glob
import os

import pyarrow.parquet as pq
import pytest
import ray

from audio_feature_extraction_ray.sources.images import synth_images
from audio_feature_extraction_ray.stages.features import feature_stage
from audio_feature_extraction_ray.state.checkpoint import (
    read_manifest,
    write_partitioned_resumable,
)


def _features(tmp=None):
    ds = synth_images(20, seed=42)
    return feature_stage(ds, concurrency=(1, 2), batch_size=64).drop_columns(
        ["caption_tokens", "embedding"]
    )


def test_clean_write_and_manifest(tmp_path):
    out = str(tmp_path / "clean")
    manifest = write_partitioned_resumable(_features(), out, key="image_id", n_partitions=8)
    rows = read_manifest(out)
    assert len(rows) == manifest.num_rows
    assert sum(r["rows"] for r in rows) == sum(
        pq.read_metadata(p).num_rows for p in glob.glob(f"{out}/part-*.parquet")
    )
    assert all(not r["skipped"] for r in manifest.to_pylist())
    assert all("content_hash" in r and r["rows_per_sec"] >= 0 for r in rows)


def test_kill_and_resume_identical(tmp_path):
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")
    write_partitioned_resumable(_features(), clean_dir, key="image_id", n_partitions=8)

    # first run crashes on two partitions
    with pytest.raises(Exception):
        write_partitioned_resumable(
            _features(), crash_dir, key="image_id", n_partitions=8, fail_partitions=(3, 6)
        )
    committed_before = {r["partition_id"] for r in read_manifest(crash_dir)}
    assert 3 not in committed_before and 6 not in committed_before

    # resume: no injected failures; committed partitions must be skipped
    manifest2 = write_partitioned_resumable(
        _features(), crash_dir, key="image_id", n_partitions=8
    )
    rows2 = {r["partition_id"]: r for r in manifest2.to_pylist()}
    for pid in committed_before:
        assert rows2[pid]["skipped"] is True
    assert rows2[3]["skipped"] is False and rows2[6]["skipped"] is False

    # content equality with the uninterrupted run, partition by partition
    clean = {r["partition_id"]: r["content_hash"] for r in read_manifest(clean_dir)}
    resumed = {r["partition_id"]: r["content_hash"] for r in read_manifest(crash_dir)}
    assert clean == resumed
    # and the actual files are byte-identical
    for p in sorted(glob.glob(f"{clean_dir}/part-*.parquet")):
        q = os.path.join(crash_dir, os.path.basename(p))
        assert pq.read_table(p).equals(pq.read_table(q)), p


def test_checkpoint_readback_preserves_entity_partitioning(tmp_path):
    """Files written by write_partitioned_resumable keep every entity's rows
    in one file; reading them back one-file-per-block lets window ops use the
    shuffle-free assume_partitioned path with identical results (the
    documented partitioning contract, stages/window.py)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from audio_feature_extraction_ray.stages.window import window_features

    out = str(tmp_path / "feats")
    feats = _features().drop_columns(["pixels"] if False else [])
    write_partitioned_resumable(feats, out, key="image_id", n_partitions=6)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    # entity never split across files
    seen: dict[str, str] = {}
    for f in files:
        for eid in set(pq.read_table(f, columns=["image_id"])["image_id"].to_pylist()):
            assert seen.setdefault(eid, f) == f, (eid, f, seen[eid])

    from audio_feature_extraction_ray.state.checkpoint import read_partitioned

    back = read_partitioned(out)
    fast = (
        window_features(back, key="image_id", ts="ts", value_cols=["quality_score"],
                        assume_partitioned=True)
        .to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    slow = (
        window_features(ray.data.read_parquet(files), key="image_id", ts="ts",
                        value_cols=["quality_score"])
        .to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    for c in ("quality_score_lag_1", "quality_score_delta"):
        np.testing.assert_allclose(fast[c], slow[c], equal_nan=True)
