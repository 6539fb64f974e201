"""Regression pins for the null-safe groupby helpers (round-5 sixth sweep):
``util.null_safe_groupby_aggregate`` / ``util.null_safe_map_groups`` and the
surrogate-key encoding inside ``grouped_agg_fast``.

SQL GROUP BY semantics throughout: NULL group keys form exactly ONE group
(never zero, never duplicated — pyarrow 16's Table.group_by was observed to
duplicate the null group once its hash table grows; Ray's sort-based groupby
crashes outright on None keys), and aggregated VALUES follow SQL aggregate
null rules.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None))


# ---------------------------------------------------------------- grouped_agg_fast


def test_grouped_agg_fast_single_null_group_string_key(ray_session):
    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast

    t = pa.table({
        "k": pa.array(["a", None, "a", None, "b", None], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    out = _collect(grouped_agg_fast(
        rd.from_arrow(t).repartition(3), keys=["k"],
        specs=[("v_sum", "v", "sum")], count_alias="n"))
    rows = {r["k"]: (r["v_sum"], r["n"]) for r in out.to_pylist()}
    assert rows == {"a": (4.0, 2), "b": (5.0, 1), None: (12.0, 3)}
    assert out.num_rows == 3, "null group must appear exactly once"


def test_grouped_agg_fast_null_int_key_not_conflated_with_sentinel(ray_session):
    """The 0 sentinel that fills null int keys must never merge with a REAL
    0 key — the is-null flag column disambiguates."""
    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast

    t = pa.table({
        "k": pa.array([0, None, 0, None], pa.int64()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = _collect(grouped_agg_fast(
        rd.from_arrow(t).repartition(2), keys=["k"],
        specs=[("v_sum", "v", "sum")]))
    rows = {r["k"]: r["v_sum"] for r in out.to_pylist()}
    assert rows == {0: 4, None: 6}
    kcol = out.column("k")
    assert kcol.null_count == 1, "null key must be restored as a real null"


def test_grouped_agg_fast_multikey_null_combinations(ray_session):
    """(NULL, x), (x, NULL) and (NULL, NULL) are three DISTINCT groups."""
    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast

    t = pa.table({
        "a": pa.array([None, "x", None, "x"], pa.string()),
        "b": pa.array([1, None, None, 1], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0]),
    })
    out = _collect(grouped_agg_fast(
        rd.from_arrow(t).repartition(2), keys=["a", "b"],
        specs=[("v_sum", "v", "sum")]))
    rows = {(r["a"], r["b"]): r["v_sum"] for r in out.to_pylist()}
    assert rows == {(None, 1): 10.0, ("x", None): 20.0,
                    (None, None): 30.0, ("x", 1): 40.0}


def test_grouped_agg_fast_null_timestamp_key(ray_session):
    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast

    ts = pa.array([0, None, 0], pa.timestamp("us"))
    t = pa.table({"k": ts, "v": pa.array([1, 2, 3], pa.int64())})
    out = _collect(grouped_agg_fast(
        rd.from_arrow(t), keys=["k"], specs=[("v_sum", "v", "sum")]))
    got = {(r["k"] is None): r["v_sum"] for r in out.to_pylist()}
    assert got == {False: 4, True: 2}


def test_grouped_agg_fast_matches_duckdb_on_null_keys(ray_session):
    """Property-style cross-check: random null-laced keys vs DuckDB."""
    import duckdb

    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast

    rng = np.random.default_rng(7)
    n = 500
    keys = [None if rng.random() < 0.2 else f"k{rng.integers(6)}"
            for _ in range(n)]
    vals = rng.normal(size=n)
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.float64())})
    out = _collect(grouped_agg_fast(
        rd.from_arrow(t).repartition(5), keys=["k"],
        specs=[("v_sum", "v", "sum"), ("v_min", "v", "min")],
        count_alias="n")).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    ora = con.sql("SELECT k, SUM(v) v_sum, MIN(v) v_min, COUNT(*) n "
                  "FROM t GROUP BY k").df()
    got = {r.k: (r.v_sum, r.v_min, r.n) for r in out.itertuples()}
    want = {r.k: (r.v_sum, r.v_min, r.n) for r in ora.itertuples()}
    # normalize pandas NaN key to None
    got = {(None if isinstance(k, float) and np.isnan(k) else k): v
           for k, v in got.items()}
    want = {(None if isinstance(k, float) and np.isnan(k) else k): v
            for k, v in want.items()}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k][0], want[k][0], rtol=1e-12)
        assert got[k][1] == want[k][1]
        assert got[k][2] == want[k][2]


# ------------------------------------------------- null_safe_groupby_aggregate


def test_null_safe_groupby_aggregate_grouped_stats(ray_session):
    from audio_feature_extraction_ray.stages.aggregates import grouped_stats

    t = pa.table({
        "k": pa.array(["a", None, "a", None], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    out = _collect(grouped_stats(
        rd.from_arrow(t).repartition(2), key="k", cols=["v"],
        stats=("mean", "max")))
    rows = {r["k"]: (r["mean_v"], r["max_v"]) for r in out.to_pylist()}
    assert rows == {"a": (2.0, 3.0), None: (3.0, 4.0)}
    # key-first column order survives the decode
    assert out.column_names[0] == "k"


# ------------------------------------------------------- null_safe_map_groups


def test_approx_quantiles_grouped_null_key_group(ray_session):
    from audio_feature_extraction_ray.stages.aggregates import (
        approx_quantiles_grouped,
    )

    rng = np.random.default_rng(3)
    keys = ["a"] * 200 + [None] * 200
    vals = np.concatenate([rng.normal(0, 1, 200), rng.normal(10, 1, 200)])
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.float64())})
    out = _collect(approx_quantiles_grouped(
        rd.from_arrow(t).repartition(4), key="k", col="v", qs=[0.5]))
    rows = {r["k"]: r["p50"] for r in out.to_pylist()}
    assert set(rows) == {"a", None}
    assert abs(rows["a"]) < 0.5
    assert abs(rows[None] - 10.0) < 0.5


def test_winsorize_null_key_rows_survive(ray_session):
    """Null group keys must not CRASH the bounds groupby (the pre-sweep
    failure mode). Contract: SQL PARTITION BY — the NULL group is a real
    group that clips against its OWN quantile bounds (surrogate-keyed
    join-back, same as group_standardize/impute; its oracle joins
    IS NOT DISTINCT FROM)."""
    from audio_feature_extraction_ray.stages.scaling import winsorize

    rng = np.random.default_rng(5)
    keys = ["a"] * 50 + [None] * 50
    vals = np.concatenate([rng.normal(0, 1, 50), rng.normal(0, 1, 50)])
    vals[0] = 100.0   # outlier in the non-null group
    vals[50] = -80.0  # outlier in the NULL group
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.float64())})
    out = _collect(winsorize(
        rd.from_arrow(t).repartition(3), key="k", col="v",
        lo=0.05, hi=0.95)).to_pandas()
    assert len(out) == 100, "null-key rows must survive winsorization"
    a = out[out["k"].notna()]
    nul = out[out["k"].isna()]
    assert a["v_wins"].abs().max() < 50.0, "outlier clipped in the real group"
    assert nul["v_wins"].notna().all(), "NULL group clips like any other"
    assert nul["v_wins"].abs().max() < 50.0, "outlier clipped in the NULL group"


def test_null_safe_map_groups_passes_original_columns(ray_session):
    from audio_feature_extraction_ray.stages.util import null_safe_map_groups

    t = pa.table({
        "k": pa.array([None, "a", None], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })

    def fn(group: pa.Table) -> pa.Table:
        # surrogates must be stripped; key column must keep its nulls
        assert set(group.column_names) == {"k", "v"}
        return pa.table({
            "k": group.column("k")[:1],
            "n": pa.array([group.num_rows], pa.int64()),
        })

    out = _collect(null_safe_map_groups(rd.from_arrow(t), "k", fn))
    rows = {r["k"]: r["n"] for r in out.to_pylist()}
    assert rows == {None: 2, "a": 1}


def test_distinct_count_excludes_nulls(ray_session):
    """SQL COUNT(DISTINCT col) ignores nulls; a null value must also never
    crash the groupby shuffle."""
    from audio_feature_extraction_ray.stages.aggregates import distinct_count

    t = pa.table({"c": pa.array(["a", None, "b", "a", None], pa.string())})
    assert distinct_count(rd.from_arrow(t).repartition(2), "c") == 2


def test_value_partitioned_writer_null_category(ray_session, tmp_path):
    """A NULL partition value forms one 'None' category file instead of
    crashing the sort-based groupby."""
    import glob

    from audio_feature_extraction_ray.state.checkpoint import (
        write_value_partitioned_resumable,
    )

    t = pa.table({
        "cat": pa.array(["x", None, "x", None], pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = str(tmp_path / "parts")
    manifest = write_value_partitioned_resumable(
        rd.from_arrow(t).repartition(2), out, "cat", sort_keys=["v"])
    cats = sorted(manifest.column("category").to_pylist())
    assert cats == ["None", "x"]
    assert sum(manifest.column("rows").to_pylist()) == 4
    files = sorted(glob.glob(out + "/cat-*.parquet"))
    assert len(files) == 2, "one file per category incl. the null category"
    back = pa.concat_tables([pa.parquet.read_table(f) for f in files])
    assert back.num_rows == 4


def test_grouped_agg_fast_null_decimal_key(ray_session):
    import decimal

    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast

    k = pa.array([decimal.Decimal("1.50"), None, decimal.Decimal("1.50")],
                 pa.decimal128(10, 2))
    t = pa.table({"k": k, "v": pa.array([1, 2, 3], pa.int64())})
    out = _collect(grouped_agg_fast(
        rd.from_arrow(t), keys=["k"], specs=[("v_sum", "v", "sum")]))
    got = {(r["k"] is None): r["v_sum"] for r in out.to_pylist()}
    assert got == {False: 4, True: 2}


def test_null_safe_groupby_unsupported_key_type_raises(ray_session):
    """A nullable key type with no sentinel must be LOUD, never silently
    re-expose the duplicate-null-group hazard."""
    from audio_feature_extraction_ray.stages.util import null_filled_key

    arr = pa.array([[1], None], pa.list_(pa.int64()))
    with pytest.raises(TypeError, match="no\\s+null-fill sentinel"):
        null_filled_key(arr, "k")
