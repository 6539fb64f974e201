"""group_standardize + quantile_bucketize vs pandas/numpy oracles, incl.
zero-variance groups, null inputs, and the shuffle-join stats path."""

import numpy as np
import pandas as pd
import pytest
import ray

from audio_feature_extraction_ray.stages.scaling import group_standardize, quantile_bucketize


def _mk(seed=5, n=400, groups=6):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, groups, n),
            "x": rng.normal(3, 7, n).round(3),
        }
    )
    df.loc[df.index[:10], "x"] = np.nan  # null inputs
    df.loc[df["g"] == 0, "x"] = 42.0  # zero-variance group
    return df


@pytest.mark.parametrize("method", ["broadcast", "shuffle"])
def test_group_standardize_matches_pandas(method):
    df = _mk()
    out = (
        group_standardize(ray.data.from_pandas(df), "g", ["x"], method=method)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    grp = df.groupby("g")["x"]
    mean = df["g"].map(grp.mean())
    std = df["g"].map(grp.std(ddof=0))
    want = (df["x"] - mean) / std.replace(0.0, np.nan)
    got = out["x_z"]
    both_nan = got.isna() & want.isna()
    assert both_nan[df["g"] == 0].all()  # zero-variance -> null
    assert both_nan[df["x"].isna()].all()  # null input -> null
    np.testing.assert_allclose(got[~both_nan], want[~both_nan], rtol=1e-9, atol=1e-12)


def test_quantile_bucketize_matches_numpy():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"rid": np.arange(300, dtype=np.int64), "v": rng.normal(0, 50, 300).round(2)})
    df.loc[df.index[:5], "v"] = np.nan
    out = (
        quantile_bucketize(ray.data.from_pandas(df), "v", [0.2, 0.4, 0.6, 0.8])
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    # boundaries over NON-NULL values only (SQL quantile_cont semantics)
    bounds = np.quantile(df["v"].dropna(), [0.2, 0.4, 0.6, 0.8])
    got = out["bucket"]
    assert got[df["v"].isna()].isna().all()
    valid = df["v"].notna()
    want = np.searchsorted(bounds, df.loc[valid, "v"].to_numpy(), side="right")
    np.testing.assert_array_equal(got[valid].to_numpy(dtype=np.int64), want)


def test_quantile_bucketize_exact_boundaries_no_nulls():
    # no-null column: engine boundaries == numpy linear-interp quantiles,
    # buckets == count of boundaries <= v
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"rid": np.arange(500, dtype=np.int64), "v": rng.uniform(0, 100, 500).round(2)})
    out = (
        quantile_bucketize(ray.data.from_pandas(df), "v", [0.25, 0.5, 0.75])
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    bounds = np.quantile(df["v"], [0.25, 0.5, 0.75])
    want = np.searchsorted(bounds, df["v"].to_numpy(), side="right")
    np.testing.assert_array_equal(out["bucket"].to_numpy(), want)


def test_melt_and_one_hot():
    from audio_feature_extraction_ray.stages.reshape import melt, one_hot

    df = pd.DataFrame(
        {
            "rid": [0, 1, 2],
            "a": [1.5, 2.5, np.nan],
            "b": [10, 20, 30],
            "cat": ["x", None, "y"],
        }
    )
    long = melt(ray.data.from_pandas(df), ["rid"], ["a", "b"]).to_pandas()
    assert len(long) == 6 and set(long["variable"]) == {"a", "b"}
    assert long[(long.rid == 1) & (long.variable == "b")]["value"].iloc[0] == 20.0
    assert long[(long.rid == 2) & (long.variable == "a")]["value"].isna().all()

    oh = one_hot(ray.data.from_pandas(df), "cat").to_pandas().sort_values("rid")
    assert list(oh.columns[-2:]) == ["cat_x", "cat_y"]  # sorted, null excluded
    # NULL category -> NULL indicators (SQL x = c comparison semantics)
    assert oh["cat_x"].tolist()[0] == 1 and oh["cat_x"].tolist()[2] == 0
    assert np.isnan(oh["cat_x"].tolist()[1]) and np.isnan(oh["cat_y"].tolist()[1])
    assert oh["cat_y"].tolist()[0] == 0 and oh["cat_y"].tolist()[2] == 1

    with pytest.raises(ValueError, match="distinct"):
        one_hot(ray.data.from_pandas(df), "cat", max_categories=1)
