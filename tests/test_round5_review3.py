"""Regression pins for the round-5 third review sweep (null semantics and
contracts in the shared join/aggregate/dedup primitives)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def test_broadcast_lookup_null_probe_keeps_int64_precision(ray_session):
    """One null probe key must not degrade the batch to float64 — int keys
    above 2^53 would silently match the WRONG small-side row."""
    from audio_feature_extraction_ray.stages.joins import broadcast_lookup

    k1, k2 = 9007199254740992, 9007199254740993  # differ only below float53
    small = pa.table({"k": pa.array([k1, k2], pa.int64()),
                      "v": pa.array(["a", "b"], pa.string())})
    big = rd.from_arrow(pa.table(
        {"k": pa.array([k2, None], pa.int64())}))
    res = broadcast_lookup(big, small, "k", ["v"], how="left")
    out = pa.concat_tables(
        res.iter_batches(batch_format="pyarrow", batch_size=None))
    rows = {r["k"]: r["v"] for r in out.to_pylist()}
    assert rows[k2] == "b", "float64 degradation matched the wrong dim row"
    assert rows[None] is None  # null probe is a miss, row preserved


def test_broadcast_lookup_drops_null_small_key(ray_session):
    """A null dim key can never match (SQL equi-join) — the row is dropped
    up front instead of degrading the int64 key vector to float64 (or
    rejecting dim tables that are otherwise fine)."""
    from audio_feature_extraction_ray.stages.joins import broadcast_lookup

    small = pa.table({"k": pa.array([1, None], pa.int64()),
                      "v": pa.array([1.0, 2.0])})
    big = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    out = pa.concat_tables(
        broadcast_lookup(big, small, "k", ["v"], how="left")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    rows = {r["k"]: r["v"] for r in out.to_pylist()}
    assert rows == {1: 1.0, 2: None}


def test_broadcast_lookup_null_string_probe_is_a_miss(ray_session):
    from audio_feature_extraction_ray.stages.joins import broadcast_lookup

    small = pa.table({"k": pa.array(["a", ""], pa.string()),
                      "v": pa.array([1.0, 2.0])})
    big = rd.from_arrow(pa.table(
        {"k": pa.array(["a", None, ""], pa.string())}))
    out = pa.concat_tables(
        broadcast_lookup(big, small, "k", ["v"], how="left")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    rows = {r["k"]: r["v"] for r in out.to_pylist()}
    # the null probe fills to the "" sentinel internally but must NOT take
    # the empty-string dim row's value
    assert rows == {"a": 1.0, None: None, "": 2.0}


def test_approx_distinct_excludes_null_values(ray_session):
    """SQL COUNT(DISTINCT col) excludes NULL — both the global sketch and
    the grouped one (and an all-null group still emits its key with 0)."""
    from audio_feature_extraction_ray.stages.aggregates import (
        approx_distinct, approx_distinct_grouped)

    t = pa.table({
        "k": pa.array(["a"] * 3 + ["b"] * 2, pa.string()),
        "x": pa.array([1.0, 2.0, None, None, None]),
    })
    ds = rd.from_arrow(t)
    assert approx_distinct(ds, "x") == 2
    g = approx_distinct_grouped(ds, "k", "x").to_pandas()
    got = dict(zip(g.iloc[:, 0], g.iloc[:, 1]))
    assert got == {"a": 2, "b": 0}


def test_bucket_hash_join_left_suffix_collision_raises(ray_session):
    """left(k, x, x_r) join right(k, x): right's x suffixes to x_r, which
    would silently null the left's native x_r — must raise."""
    from audio_feature_extraction_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "x": pa.array([1.0, 2.0]),
        "x_r": pa.array([10.0, 20.0]),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "x": pa.array([5.0, 6.0]),
    }))
    with pytest.raises(ValueError, match="collide"):
        bucket_hash_join(left, right, on="k")


def test_asof_null_entity_is_a_miss_on_both_routes(ray_session):
    """SQL ASOF semantics: a NULL entity key never matches — the shuffle
    route must agree with the broadcast route (it used to match null
    probes against null builds via the shared dictionary code)."""
    from audio_feature_extraction_ray.stages.asof import (asof_join,
                                                          asof_join_broadcast)

    left = pa.table({
        "e": pa.array(["a", None], pa.string()),
        "lts": pa.array([10_000_000, 10_000_000], pa.int64()),
    })
    right = pa.table({
        "e": pa.array(["a", None], pa.string()),
        "rts": pa.array([5_000_000, 5_000_000], pa.int64()),
        "v": pa.array([1.0, 2.0]),
    })
    for fn in (asof_join, asof_join_broadcast):
        out = fn(rd.from_arrow(left), rd.from_arrow(right), on="e",
                 left_ts="lts", right_ts="rts", value_cols=["v"]).to_pandas()
        assert len(out) == 2
        a_row = out[out["e"] == "a"].iloc[0]
        assert a_row["v_asof"] == 1.0
        null_row = out[out["e"].isna()].iloc[0]
        assert np.isnan(null_row["v_asof"]), f"{fn.__name__}: null matched"
        assert null_row["matched_ts"] is None or (
            isinstance(null_row["matched_ts"], float)
            and np.isnan(null_row["matched_ts"]))


def test_asof_bucketed_null_entity_is_a_miss(ray_session):
    from audio_feature_extraction_ray.stages.asof import asof_join_bucketed

    left = pa.table({
        "e": pa.array(["a", None], pa.string()),
        "lts": pa.array([10_000_000, 10_000_000], pa.int64()),
    })
    right = pa.table({
        "e": pa.array(["a", None], pa.string()),
        "rts": pa.array([5_000_000, 5_000_000], pa.int64()),
        "v": pa.array([1.0, 2.0]),
    })
    out = asof_join_bucketed(rd.from_arrow(left), rd.from_arrow(right),
                             on="e", left_ts="lts", right_ts="rts",
                             value_cols=["v"],
                             bucket_us=3_600_000_000).to_pandas()
    assert len(out) == 2
    assert out[out["e"] == "a"]["v_asof"].iloc[0] == 1.0
    assert np.isnan(out[out["e"].isna()]["v_asof"].iloc[0])


def test_null_group_keys_do_not_crash_grouped_stats(ray_session):
    """funnel / grouped_spearman / ks_by_group / approx_distinct_grouped on
    a table with one NULL group-key row: no INT64_MIN scatter crash;
    grouped ops keep the null group (SQL GROUP BY), funnel excludes null
    users (SQL COUNT)."""
    from audio_feature_extraction_ray.stages.aggregates import (
        approx_distinct_grouped, funnel, grouped_spearman, ks_by_group)

    t = pa.table({
        "k": pa.array(["a", "a", None, "b", "b", None], pa.string()),
        "x": pa.array([1.0, 2.0, 3.0, 1.0, 3.0, 4.0]),
        "y": pa.array([1.0, 2.0, 3.0, 3.0, 1.0, 5.0]),
        "ts": pa.array([1_000_000 * i for i in range(6)]).cast(
            pa.timestamp("us")),
        "typ": pa.array(["s1", "s2", "s1", "s1", "s2", "s2"], pa.string()),
        "ref": pa.array([0, 1, 0, 1, 0, 1], pa.int64()),
    })
    ds = rd.from_arrow(t)

    sp = grouped_spearman(ds, "k", "x", "y").to_pandas()
    assert len(sp) == 3  # a, b, and the null group
    assert sp["k"].isna().sum() == 1

    f = funnel(ds, "k", "ts", "typ", ["s1", "s2"]).to_pandas()
    users = {r["step"]: r["users"] for _, r in f.iterrows()}
    assert users["s1"] == 2  # null users excluded

    ad = approx_distinct_grouped(ds, "k", "x").to_pandas()
    assert len(ad) == 3 and ad["k"].isna().sum() == 1

    ks = ks_by_group(ds, "k", "x", "ref", cutoff_us=1).to_pandas()
    assert len(ks) == 3 and ks["k"].isna().sum() == 1


def test_pagerank_drops_null_endpoint_edges(ray_session):
    from audio_feature_extraction_ray.stages.graph import pagerank

    edges = rd.from_arrow(pa.table({
        "s": pa.array(["a", "b", "a", None], pa.string()),
        "d": pa.array(["b", "a", None, "b"], pa.string()),
    }))
    out = pagerank(edges, "s", "d", iters=3).to_pandas()
    assert sorted(out["node"]) == ["a", "b"]
    clean = rd.from_arrow(pa.table({
        "s": pa.array(["a", "b"], pa.string()),
        "d": pa.array(["b", "a"], pa.string()),
    }))
    ref = pagerank(clean, "s", "d", iters=3).to_pandas()
    assert out.sort_values("node").reset_index(drop=True).equals(
        ref.sort_values("node").reset_index(drop=True))


def test_hamming_and_embedding_pairs_flag_truncation(ray_session):
    """Degenerate bands/buckets beyond max_group must FLAG truncation (the
    module contract), not silently drop candidate pairs' rows."""
    from audio_feature_extraction_ray.stages.dedup import (
        embedding_dedup_pairs, hamming_dedup_pairs)

    n = 12
    sigs = rd.from_arrow(pa.table({
        "id": pa.array(list(range(n)), pa.int64()),
        "sig": pa.array([0] * n, pa.int64()),  # identical → one band group
    }))
    pairs = hamming_dedup_pairs(sigs, "id", "sig", max_hamming=3,
                                max_group=6).to_pandas()
    assert "truncated" in pairs.columns and pairs["truncated"].all()
    assert len(pairs) == 6 * 5 // 2  # capped group still emits its pairs

    emb = rd.from_arrow(pa.table({
        "id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * n, pa.list_(pa.float64(), 2)),
    }))
    ep = embedding_dedup_pairs(emb, id_col="id", threshold=0.9,
                               max_group=6).to_pandas()
    assert "truncated" in ep.columns and ep["truncated"].all()


def test_weighted_sample_excludes_null_and_nan_weights(ray_session):
    from audio_feature_extraction_ray.stages.sampling import weighted_sample

    t = pa.table({
        "id": pa.array([f"d{i}" for i in range(25)], pa.string()),
        "w": pa.array([1.0] * 5 + [None] * 10 + [float("nan")] * 10),
    })
    out = weighted_sample(rd.from_arrow(t), ["id"], "w", k=10).to_pandas()
    assert len(out) == 5, "null/NaN-weight rows entered the sample"
    assert not out["score"].isna().any()
