"""As-of join + window ops vs pandas oracles, incl. the zero-temporal-leakage
invariant (FIXTURES.md F2) and session semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from audio_feature_extraction_ray.stages.asof import asof_join
from audio_feature_extraction_ray.stages.window import sessionize, time_bucket, window_features


def _mk_events(seed=7, n_users=12, n_events=400):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, n_events)
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 3_600_000_000 * 24, n_events)
    # ensure unique (user, ts) so oracle comparisons are order-stable
    df = pd.DataFrame(
        {
            "user_id": user,
            "ts": pd.to_datetime(np.sort(ts), unit="us"),
            "value": rng.normal(0, 10, n_events).round(3),
            "event_id": np.arange(n_events, dtype=np.int64),
        }
    )
    return df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def events_df():
    return _mk_events()


def test_asof_backward_matches_pandas_merge_asof(events_df):
    df = events_df
    probes = df.sample(frac=0.5, random_state=3)[["user_id", "ts", "event_id"]].copy()
    probes["ts"] = probes["ts"] + pd.to_timedelta(
        np.random.default_rng(5).integers(-7_200, 7_200, len(probes)), unit="s"
    )
    probes = probes.rename(columns={"ts": "query_ts", "event_id": "query_id"})
    # add guaranteed-miss keys
    miss = pd.DataFrame(
        {"user_id": [999, 998], "query_ts": [probes["query_ts"].iloc[0]] * 2, "query_id": [-1, -2]}
    )
    probes = pd.concat([probes, miss], ignore_index=True)

    left = ray.data.from_pandas(probes)
    right = ray.data.from_pandas(df[["user_id", "ts", "value", "event_id"]])
    out = (
        asof_join(left, right, on="user_id", left_ts="query_ts", right_ts="ts",
                  value_cols=["value", "event_id"])
        .to_pandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )

    oracle = pd.merge_asof(
        probes.sort_values("query_ts"),
        df[["user_id", "ts", "value", "event_id"]].sort_values("ts"),
        left_on="query_ts",
        right_on="ts",
        by="user_id",
        direction="backward",
    ).sort_values("query_id").reset_index(drop=True)

    assert len(out) == len(oracle)
    np.testing.assert_allclose(
        out["value_asof"].to_numpy(dtype=np.float64),
        oracle["value"].to_numpy(dtype=np.float64),
        rtol=0, atol=0, equal_nan=True,
    )
    a = out["matched_ts"].astype("int64", errors="ignore")
    assert out["matched_ts"].isna().equals(oracle["ts"].isna())
    both = ~out["matched_ts"].isna()
    assert (out.loc[both, "matched_ts"].to_numpy() == oracle.loc[both, "ts"].to_numpy()).all()
    # miss keys yield nulls, not dropped rows (anti-join coverage)
    assert out[out["query_id"] < 0]["value_asof"].isna().all()


def test_asof_zero_leakage(events_df):
    """Features recomputed with all rows ts > query_ts deleted must give an
    identical join result (FIXTURES.md invariant 2)."""
    df = events_df
    cutoff = df["ts"].quantile(0.6)
    probes = pd.DataFrame(
        {"user_id": df["user_id"].unique(), "query_ts": cutoff, "query_id":
         np.arange(df["user_id"].nunique())}
    )
    full = asof_join(
        ray.data.from_pandas(probes), ray.data.from_pandas(df[["user_id", "ts", "value"]]),
        on="user_id", left_ts="query_ts", right_ts="ts", value_cols=["value"],
    ).to_pandas().sort_values("query_id").reset_index(drop=True)
    pruned_df = df[df["ts"] <= cutoff]
    pruned = asof_join(
        ray.data.from_pandas(probes), ray.data.from_pandas(pruned_df[["user_id", "ts", "value"]]),
        on="user_id", left_ts="query_ts", right_ts="ts", value_cols=["value"],
    ).to_pandas().sort_values("query_id").reset_index(drop=True)
    np.testing.assert_allclose(
        full["value_asof"].to_numpy(np.float64), pruned["value_asof"].to_numpy(np.float64),
        equal_nan=True,
    )


def test_asof_tolerance_and_forward(events_df):
    df = events_df
    probes = df[["user_id", "ts"]].copy().rename(columns={"ts": "query_ts"})
    probes["query_id"] = np.arange(len(probes))
    out = asof_join(
        ray.data.from_pandas(probes), ray.data.from_pandas(df[["user_id", "ts", "value"]]),
        on="user_id", left_ts="query_ts", right_ts="ts", value_cols=["value"],
        direction="forward", tolerance_us=0,
    ).to_pandas()
    # forward with tolerance 0 matches only the exactly-equal timestamp
    merged = out.merge(df, left_on=["user_id", "query_ts"], right_on=["user_id", "ts"])
    np.testing.assert_allclose(merged["value_asof"], merged["value"])


def test_window_features_match_pandas(events_df):
    df = events_df
    ds = ray.data.from_pandas(df)
    out = (
        window_features(ds, key="user_id", ts="ts", value_cols=["value"],
                        session_gap_us=1_800_000_000)
        .to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    )
    o = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    g = o.groupby("user_id", sort=False)["value"]
    lag1, lead1 = g.shift(1), g.shift(-1)
    delta = o["value"] - lag1
    delta2 = delta - delta.groupby(o["user_id"], sort=False).shift(1)
    np.testing.assert_allclose(out["value_lag_1"], lag1, equal_nan=True)
    np.testing.assert_allclose(out["value_lead_1"], lead1, equal_nan=True)
    np.testing.assert_allclose(out["value_delta"], delta, equal_nan=True)
    np.testing.assert_allclose(out["value_delta2"], delta2, equal_nan=True)
    sess_oracle = (
        (o["ts"].astype("int64") // 1000).groupby(o["user_id"], sort=False).diff()
        .gt(1_800_000_000).fillna(False).groupby(o["user_id"], sort=False).cumsum()
    )
    assert (out["session_id"].to_numpy() == sess_oracle.to_numpy()).all()


def test_fill_columns():
    df = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 3,
            "ts": pd.to_datetime(np.arange(9), unit="s"),
            "v": [np.nan, 1.0, np.nan, np.nan, 4.0, np.nan, np.nan, 7.0, np.nan],
        }
    )
    out = (
        window_features(ray.data.from_pandas(df), key="k", ts="ts", value_cols=[],
                        fill_cols=["v"], deltas=False, lags=(), leads=())
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    o = df.sort_values(["k", "ts"]).reset_index(drop=True)
    np.testing.assert_allclose(out["v_ffill"], o.groupby("k")["v"].ffill(), equal_nan=True)
    np.testing.assert_allclose(out["v_bfill"], o.groupby("k")["v"].bfill(), equal_nan=True)


def test_sessionize_min_filters():
    base = 1_000_000_000_000_000
    rows = []
    # user "a": 3 events tightly packed, then 1 isolated event
    for i, off in enumerate([0, 10, 20, 10_000]):
        rows.append({"k": "a", "ts": base + off * 1_000_000})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    out = sessionize(
        ray.data.from_pandas(df), key="k", ts="ts", gap_us=60_000_000, min_events=2
    ).to_pandas()
    # isolated event's session (1 event) dropped
    assert len(out) == 3 and set(out["session_id"]) == {0}


def test_time_bucket():
    df = pd.DataFrame({"ts": pd.to_datetime([0, 3599, 3600, 7200], unit="s"), "v": [1, 2, 3, 4]})
    out = time_bucket(ray.data.from_pandas(df), "ts", width_us=3_600_000_000).to_pandas()
    assert out["bucket"].tolist() == [0, 0, 1, 2]


def test_window_assume_partitioned_matches_shuffle():
    """The shuffle-free path must equal the groupby path when the input is
    entity-partitioned (one block per key set)."""
    from audio_feature_extraction_ray.sources.images import synth_images

    ds1 = synth_images(30, seed=42).drop_columns(["bytes", "caption"])
    ds2 = synth_images(30, seed=42).drop_columns(["bytes", "caption"])
    a = (
        window_features(ds1, key="image_id", ts="ts", value_cols=["phash"],
                        session_gap_us=120_000_000, assume_partitioned=True)
        .to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    b = (
        window_features(ds2, key="image_id", ts="ts", value_cols=["phash"],
                        session_gap_us=120_000_000)
        .to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    )
    assert (a.columns == b.columns).all()
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            assert ((x == y) | (np.isnan(x) & np.isnan(y))).all(), c
        else:
            assert (x == y).all(), c


def test_asof_bucketed_equivalent(events_df):
    """Bounded-memory (entity, time-bucket) as-of must equal the plain
    per-entity as-of, including cross-bucket lookbacks over empty buckets,
    misses, and before-first-event probes."""
    from audio_feature_extraction_ray.stages.asof import asof_join_bucketed

    df = events_df
    rng = np.random.default_rng(17)
    probes = df.sample(frac=0.4, random_state=8)[["user_id", "ts"]].copy()
    probes["query_ts"] = probes["ts"] + pd.to_timedelta(
        rng.integers(-48 * 3600, 48 * 3600, len(probes)), unit="s"
    )
    probes = probes.drop(columns=["ts"])
    probes["query_id"] = np.arange(len(probes))
    miss = pd.DataFrame({"user_id": [777], "query_ts": [probes["query_ts"].iloc[0]],
                         "query_id": [-1]})
    probes = pd.concat([probes, miss], ignore_index=True)

    plain = asof_join(
        ray.data.from_pandas(probes), ray.data.from_pandas(df[["user_id", "ts", "value"]]),
        on="user_id", left_ts="query_ts", right_ts="ts", value_cols=["value"],
    ).to_pandas().sort_values("query_id").reset_index(drop=True)

    bucketed = asof_join_bucketed(
        ray.data.from_pandas(probes), ray.data.from_pandas(df[["user_id", "ts", "value"]]),
        on="user_id", left_ts="query_ts", right_ts="ts", value_cols=["value"],
        bucket_us=6 * 3_600_000_000,  # 6h buckets force many cross-bucket lookbacks
    ).to_pandas().sort_values("query_id").reset_index(drop=True)

    assert len(plain) == len(bucketed)
    np.testing.assert_allclose(
        plain["value_asof"].to_numpy(np.float64),
        bucketed["value_asof"].to_numpy(np.float64), equal_nan=True,
    )
    assert plain["matched_ts"].isna().equals(bucketed["matched_ts"].isna())
    both = ~plain["matched_ts"].isna()
    assert (plain.loc[both, "matched_ts"].to_numpy()
            == bucketed.loc[both, "matched_ts"].to_numpy()).all()


def test_salt_hot_keys_two_phase_equivalence():
    """Salted two-phase aggregation over a hot key equals the unsalted
    result — the skew-mitigation pattern for map_groups paths
    (SURVEY.md §7.5)."""
    from ray.data.aggregate import Count, Sum

    from audio_feature_extraction_ray.stages.asof import salt_hot_keys

    df = pd.DataFrame(
        {
            "k": ["hot"] * 5000 + ["a"] * 10 + ["b"] * 7,
            "v": np.arange(5017, dtype=np.float64),
        }
    )
    ds = salt_hot_keys(ray.data.from_pandas(df), "k", hot_keys=["hot"], salt_buckets=8)
    # phase 1: aggregate per (key, salt); phase 2: combine per key
    p1 = ds.groupby(["k", "__salt"]).aggregate(
        Sum(on="v", alias_name="s"), Count(alias_name="n")
    )
    p2 = (
        p1.groupby("k").aggregate(Sum(on="s", alias_name="s"), Sum(on="n", alias_name="n"))
        .to_pandas().set_index("k").sort_index()
    )
    oracle = df.groupby("k").agg(s=("v", "sum"), n=("v", "count")).sort_index()
    assert (p2["n"] == oracle["n"]).all()
    np.testing.assert_allclose(p2["s"], oracle["s"])
    # the hot key was actually spread over multiple salt buckets
    hot_parts = p1.to_pandas().query("k == 'hot'")
    assert hot_parts["__salt"].nunique() > 1


def test_auto_salt_detects_hot_key_and_bounds_tasks():
    """auto_salt_hot_keys needs no hand list: one entity owning 50% of the
    rows is detected by the heavy-hitters pre-pass and spread over salt
    buckets (bounding the largest per-task group), tail keys stay on salt
    0, and the two-phase result is identical to the unsalted oracle."""
    from ray.data.aggregate import Count, Sum

    from audio_feature_extraction_ray.stages.asof import auto_salt_hot_keys

    n = 20_000
    rng = np.random.default_rng(3)
    tail = rng.integers(0, 100, n // 2)
    df = pd.DataFrame({
        "k": ["hot"] * (n // 2) + [f"t{v}" for v in tail],  # 50% one entity
        "v": np.arange(n, dtype=np.float64),
    })
    ds = ray.data.from_pandas(df).repartition(8)

    salted, hot_keys = auto_salt_hot_keys(ds, "k", phi=0.2, salt_buckets=8)
    assert hot_keys == ["hot"]

    p1 = salted.groupby(["k", "__salt"]).aggregate(
        Sum(on="v", alias_name="s"), Count(alias_name="n")).to_pandas()
    # per-task bound: the biggest (key, salt) group is far below the hot
    # key's 10k rows — content-hash salting splits it ~uniformly over 8
    assert p1.n.max() < 0.35 * (n // 2)
    assert p1.query("k == 'hot'")["__salt"].nunique() == 8
    # tail keys keep salt 0 (no pointless group splitting)
    assert (p1.query("k != 'hot'")["__salt"] == 0).all()

    p2 = p1.groupby("k").agg(s=("s", "sum"), n=("n", "sum")).sort_index()
    oracle = df.groupby("k").agg(s=("v", "sum"), n=("v", "count")).sort_index()
    assert (p2["n"] == oracle["n"]).all()
    np.testing.assert_allclose(p2["s"], oracle["s"])

    # sampled pre-pass finds the same hot key deterministically
    _, hot2 = auto_salt_hot_keys(ds, "k", phi=0.2, sample_fraction=0.25)
    assert hot2 == ["hot"]
    _, hot3 = auto_salt_hot_keys(ds.repartition(3), "k", phi=0.2,
                                 sample_fraction=0.25)
    assert hot3 == hot2  # layout-independent (content-hash sample)
