"""Interval (range-containment) join + exact substring-overlap pairs vs
brute-force oracles, incl. multi-bucket intervals, inclusive bounds, nulls,
and the max_group truncation cap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from audio_feature_extraction_ray.stages.dedup import substring_dup_pairs
from audio_feature_extraction_ray.stages.interval import interval_join


def _mk_intervals_points(seed=11, n_keys=8, n_iv=120, n_pt=500):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    iv = pd.DataFrame(
        {
            "iv_id": np.arange(n_iv, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_iv),
            "start": base + rng.integers(0, 10_000_000, n_iv),
        }
    )
    # lengths from sub-bucket to many-bucket so replication paths all run
    iv["end"] = iv["start"] + rng.integers(0, 3_000_000, n_iv)
    pt = pd.DataFrame(
        {
            "pt_id": np.arange(n_pt, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_pt),
            "ts": base + rng.integers(-1_000_000, 14_000_000, n_pt),
            "v": rng.normal(0, 5, n_pt).round(3),
        }
    )
    return iv, pt


def _brute_pairs(iv: pd.DataFrame, pt: pd.DataFrame) -> pd.DataFrame:
    m = iv.merge(pt, on="k", suffixes=("", "_p"))
    m = m[(m["ts"] >= m["start"]) & (m["ts"] <= m["end"])]
    return m[["iv_id", "pt_id"]].sort_values(["iv_id", "pt_id"]).reset_index(drop=True)


@pytest.mark.parametrize("bucket_us", [500_000, 5_000_000])
def test_interval_join_matches_bruteforce(bucket_us):
    iv, pt = _mk_intervals_points()
    out = interval_join(
        ray.data.from_pandas(iv),
        ray.data.from_pandas(pt),
        on="k",
        start_col="start",
        end_col="end",
        ts_col="ts",
        value_cols=["pt_id", "v"],
        bucket_us=bucket_us,
    ).to_pandas()
    got = (
        out[["iv_id", "pt_id_pt"]]
        .rename(columns={"pt_id_pt": "pt_id"})
        .sort_values(["iv_id", "pt_id"])
        .reset_index(drop=True)
    )
    want = _brute_pairs(iv, pt)
    pd.testing.assert_frame_equal(got, want)


def test_interval_join_inclusive_bounds_and_nulls():
    iv = pd.DataFrame(
        {
            "iv_id": [0, 1, 2],
            "k": pd.array([1, 1, None], dtype="Int64"),
            "start": pd.array([100, 200, 100], dtype="Int64"),
            "end": pd.array([110, None, 110], dtype="Int64"),
        }
    )
    pt = pd.DataFrame(
        {
            "k": pd.array([1, 1, 1, None], dtype="Int64"),
            "ts": pd.array([100, 110, 111, 105], dtype="Int64"),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = interval_join(
        ray.data.from_pandas(iv),
        ray.data.from_pandas(pt),
        on="k",
        start_col="start",
        end_col="end",
        ts_col="ts",
        value_cols=["v"],
        bucket_us=50,
    ).to_pandas()
    # interval 0 matches ts 100 and 110 (both ends inclusive); null-bound
    # interval 1, null-key interval 2, and null-key/null-ts points never match
    assert sorted(out["v_pt"].tolist()) == [1.0, 2.0]
    assert set(out["iv_id"]) == {0}


def test_interval_join_empty_sides():
    iv = pd.DataFrame({"iv_id": [], "k": [], "start": [], "end": []}).astype(
        {"iv_id": "int64", "k": "int64", "start": "int64", "end": "int64"}
    )
    pt = pd.DataFrame({"k": [0], "ts": [5], "v": [1.0]}).astype({"k": "int64", "ts": "int64"})
    out = interval_join(
        ray.data.from_pandas(iv),
        ray.data.from_pandas(pt),
        on="k",
        start_col="start",
        end_col="end",
        ts_col="ts",
        value_cols=["v"],
        bucket_us=10,
    )
    assert out.count() == 0


def test_interval_join_suffix_collision_raises():
    iv = pd.DataFrame({"k": [1], "start": [0], "end": [10], "v_pt": [9.0]})
    pt = pd.DataFrame({"k": [1], "ts": [5], "v": [1.0]})
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            ray.data.from_pandas(iv),
            ray.data.from_pandas(pt),
            on="k",
            start_col="start",
            end_col="end",
            ts_col="ts",
            value_cols=["v"],
            bucket_us=10,
        )


def _brute_substring_pairs(texts: dict[int, str], window: int) -> dict[tuple, int]:
    from audio_feature_extraction_ray.functions.textfx import ngram_window_hashes

    sets = {i: ngram_window_hashes(t, window) for i, t in texts.items()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = len(sets[a] & sets[b])
            if n:
                out[(a, b)] = n
    return out


def test_substring_pairs_match_serial_oracle():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for i in range(30):
        texts[i] = " ".join(rng.choice(vocab, rng.integers(2, 60)))
    # planted: 40 shares a long run with 41; 42 short (< window) never pairs
    shared = " ".join(rng.choice(vocab, 20))
    texts[40] = "alpha beta " + shared
    texts[41] = shared + " gamma delta"
    texts[42] = "tiny doc only"
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = substring_dup_pairs(ds, "doc_id", window=8, max_group=1000).to_pandas()
    got_map = {
        (a, b): n for a, b, n in zip(got["id_a"], got["id_b"], got["n_shared"])
    }
    assert got_map == _brute_substring_pairs(texts, 8)
    assert (40, 41) in got_map and got_map[(40, 41)] == 13  # 20-token run -> 13 windows


def test_substring_pairs_max_group_caps_hot_gram():
    # one 8-gram shared by 10 docs; cap at 4 -> only the 4 smallest ids pair
    shared = " ".join(f"t{i}" for i in range(8))
    rows = {i: f"doc{i} unique{i} " + shared for i in range(10)}
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(rows), "text": list(rows.values())})
    )
    got = substring_dup_pairs(ds, "doc_id", window=8, max_group=4).to_pandas()
    ids_in_pairs = set(got["id_a"]) | set(got["id_b"])
    assert ids_in_pairs <= {0, 1, 2, 3}
    assert len(got) <= 6  # C(4,2)
