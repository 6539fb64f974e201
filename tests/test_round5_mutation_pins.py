"""Fast unit pins for the adversarial-mutation-sweep contracts (round 5,
batches 2-7). The full cross-engine certification lives in
jobs/mutation_sweep.py (nulls / skew / unicode / empty vs DuckDB); these
pins keep the headline semantics from silently regressing between sweeps.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _pdf(ds):
    return ds.to_pandas()


def test_window_null_ts_orders_last_and_chains(ray_session):
    """NULL ts rows are the partition TAIL (DuckDB ORDER BY ASC): lag of the
    first null-ts row is the last real row's value; null-ts rows chain."""
    from audio_feature_extraction_ray.stages.window import window_features

    t = pa.table({
        "eid": pa.array([1, 2, 3, 4], pa.int64()),
        "u": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": pa.array([100, 200, None, None], pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    out = _pdf(window_features(rd.from_arrow(t), key="u", ts="ts",
                               value_cols=["v"], tiebreak="eid")) \
        .set_index("eid").sort_index()
    assert out.loc[3, "v_lag_1"] == 2.0   # first null-ts row lags the last real
    assert out.loc[4, "v_lag_1"] == 3.0   # null-ts rows chain through
    assert np.isnan(out.loc[1, "v_lag_1"])
    assert out.loc[2, "v_lead_1"] == 3.0  # lead INTO the null-ts tail


def test_sessionize_null_ts_extends_open_session(ray_session):
    """A null-ts event can never PROVE a gap — it extends the open session
    (and never starts a new one, unlike the naive prev_ts IS NULL idiom)."""
    from audio_feature_extraction_ray.stages.window import sessionize

    HOUR = 3_600_000_000
    t = pa.table({
        "u": pa.array([1] * 5, pa.int64()),
        "ts": pa.array([0, HOUR * 3, HOUR * 3 + 60, None, None],
                       pa.timestamp("us")),
        "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    out = _pdf(sessionize(rd.from_arrow(t), key="u", ts="ts", gap_us=HOUR)) \
        .set_index("eid").sort_index()
    assert out.loc[0, "session_id"] == 0
    assert out.loc[1, "session_id"] == 1  # 3h gap -> new session
    assert out.loc[2, "session_id"] == 1
    assert out.loc[3, "session_id"] == 1  # null ts: extends the open session
    assert out.loc[4, "session_id"] == 1


def test_grouped_topk_null_key_is_one_group_values_last(ray_session):
    from audio_feature_extraction_ray.stages.util import grouped_topk

    t = pa.table({
        "k": pa.array([None, None, None, "a", "a"], pa.string()),
        "v": pa.array([5.0, None, 7.0, 1.0, 2.0], pa.float64()),
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = _pdf(grouped_topk(rd.from_arrow(t), key="k",
                            sort_keys=["v", "id"], k=2,
                            descending=[True, False]))
    nul = out[out["k"].isna()].sort_values("id")
    # ONE null group (not one per row), top-2 by value DESC NULLS LAST
    assert sorted(nul["id"].tolist()) == [1, 3]
    assert len(out[out["k"] == "a"]) == 2


def test_pack_sequences_null_token_doc_is_unpackable(ray_session):
    """A NULL-token doc takes no pack slot (boundaries of later docs do not
    shift) and comes back with NULL pack columns."""
    from audio_feature_extraction_ray.stages.text import pack_sequences

    ids = list(range(8))
    toks = [100, None, 100, 100, 100, None, 100, 100]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "n_tokens": pa.array(toks, pa.int64())})
    withn = _pdf(pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens",
                                budget=256, n_partitions=1)) \
        .set_index("doc_id").sort_index()
    assert len(withn) == 8, "row-complete output"
    assert withn.loc[1, "pack_id"] is None or np.isnan(withn.loc[1, "pack_id"])
    # the packable docs pack exactly as if the null docs were absent
    nn = withn[withn["n_tokens"].notna()]
    ref = _pdf(pack_sequences(
        rd.from_arrow(t.filter(pa.array([x is not None for x in toks]))),
        "doc_id", "n_tokens", budget=256, n_partitions=1)) \
        .set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(
        nn[["pack_id", "pack_pos", "pack_fill"]].astype("float64"),
        ref[["pack_id", "pack_pos", "pack_fill"]].astype("float64"))


def test_md5_fingerprint_canonical_token_join():
    """Whitespace-variant duplicates hash identically: lowercase + collapse
    Unicode whitespace + strip — ' '.join(text.lower().split())."""
    import hashlib

    from audio_feature_extraction_ray.functions.textfx import md5_fingerprint

    a = md5_fingerprint("\x0b\xa0Query  scan　slow ")
    b = md5_fingerprint("query scan slow")
    assert a == b == hashlib.md5(b"query scan slow").hexdigest()


def test_one_hot_null_category_is_null(ray_session):
    from audio_feature_extraction_ray.stages.reshape import one_hot

    t = pa.table({"id": pa.array([0, 1], pa.int64()),
                  "c": pa.array(["x", None], pa.string())})
    out = _pdf(one_hot(rd.from_arrow(t), "c")).set_index("id").sort_index()
    assert out.loc[0, "c_x"] == 1
    assert pd.isna(out.loc[1, "c_x"])  # NULL category -> NULL indicator
