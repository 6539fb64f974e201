"""Round-5 regression and operator tests."""
import numpy as np
import pyarrow as pa
import pytest
import ray


def test_split_fractions_summing_to_one_cover_all_rows():
    """ADVICE r5 (medium): when splits sum to 1.0 the final threshold's hex
    string is 5 chars ('10000') and the lexicographic compare mislabeled
    most of the final split as 'rest'. The integer match-all branch must
    cover every row, in every hash-range operator."""
    from audio_feature_extraction_ray.stages.sampling import (
        deterministic_sample, hash_split, leakage_safe_split)

    rows = [{"id": i, "fp": f"g{i % 23}"} for i in range(400)]
    ds = ray.data.from_items(rows).repartition(4)

    out = leakage_safe_split(ds, "fp", "id", {"train": 0.8, "test": 0.2}).take_all()
    labels = {r["split"] for r in out}
    assert "rest" not in labels, f"groups fell off the 1.0 edge: {labels}"
    assert labels == {"train", "test"}

    out2 = hash_split(ds, ["id"], {"train": 0.5, "test": 0.5}).take_all()
    labels2 = {r["split"] for r in out2}
    assert "rest" not in labels2 and labels2 == {"train", "test"}

    # rate=1.0 sampling must keep everything
    kept = deterministic_sample(ds, ["id"], 1.0).count()
    assert kept == 400


def test_semantic_dedup_overflow_rows_not_dropped():
    """ADVICE r5: clusters above max_group used to silently drop overflow
    rows from the output. They must pass through keep=True, truncated=True."""
    from audio_feature_extraction_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    # one tight cluster of 50 near-identical vectors
    base = rng.normal(size=8)
    rows = [{"vec_id": i,
             "embedding": (base + rng.normal(scale=1e-3, size=8)).tolist()}
            for i in range(50)]
    ds = ray.data.from_items(rows).repartition(3)
    out = semantic_dedup(ds, k=1, iters=2, threshold=0.99, max_group=10).take_all()
    assert len(out) == 50, "overflow rows were dropped from the output"
    over = [r for r in out if r["vec_id"] >= 10]
    assert all(r["keep"] for r in over)
    assert all(r["truncated"] for r in over)
    checked = [r for r in out if r["vec_id"] < 10]
    # within the checked prefix, near-identical vectors dedup to the min id
    assert sum(r["keep"] for r in checked) == 1


def test_bpe_train_route_parity():
    """The pinned-table merge loop and the per-merge distributed route must
    learn identical merge tables (same tie-breaks)."""
    from audio_feature_extraction_ray.stages.text import bpe_train

    rows = [{"text": t} for t in [
        "low lower lowest low low", "new newer newest new",
        "wide wider widest wide wide wide", "low new wide er est",
    ] * 5]
    ds = ray.data.from_items(rows).repartition(3)
    a = bpe_train(ds, n_merges=12, distributed=False).take_all()
    b = bpe_train(ds, n_merges=12, distributed=True).take_all()
    assert a == b
    assert len(a) > 0


def test_dtw_band_row_vectorization_matches_serial_dp():
    """The prefix-min row update is value-equivalent to the cell-by-cell
    banded DP: same optimal path COST to fp tolerance, a valid monotonic
    path, deterministic run-to-run. Exact path identity is NOT the
    contract — prefix-sum reassociation (~1e-14 on acc cells) may break
    ties differently on repeated/quantized frames (see _band_row_update's
    docstring)."""
    from audio_feature_extraction_ray.stages.align import dtw_align

    def serial_acc(a, b, band_frac=0.2):
        t1, t2 = len(a), len(b)
        band = max(1, int(band_frac * max(t1, t2)))
        acc = np.full((t1 + 1, t2 + 1), np.inf)
        acc[0, 0] = 0.0
        for i in range(1, t1 + 1):
            center = int(round((i - 1) * (t2 - 1) / max(t1 - 1, 1))) + 1
            j_lo, j_hi = max(1, center - band), min(t2, center + band)
            costs = np.linalg.norm(a[i - 1][None, :] - b[j_lo - 1:j_hi], axis=1)
            for idx, j in enumerate(range(j_lo, j_hi + 1)):
                acc[i, j] = costs[idx] + min(acc[i - 1, j], acc[i, j - 1],
                                             acc[i - 1, j - 1])
        return acc

    def path_cost(path, a, b):
        return float(sum(np.linalg.norm(a[i] - b[j]) for i, j in path))

    rng = np.random.default_rng(3)
    for trial, (t1, t2, d, quantize) in enumerate(
            [(60, 75, 4, False), (34, 36, 1, False), (40, 40, 2, True)]):
        a = rng.normal(size=(t1, d))
        b = rng.normal(size=(t2, d))
        if quantize:  # tie-heavy: repeated/quantized frames
            a, b = np.round(a), np.round(b)
        path = dtw_align(a, b)
        # endpoints + monotonic contiguous steps
        assert path[0] == (0, 0) and path[-1] == (t1 - 1, t2 - 1)
        steps = {(pi - qi, pj - qj)
                 for (qi, qj), (pi, pj) in zip(path, path[1:])}
        assert steps <= {(1, 0), (0, 1), (1, 1)}
        # optimal cost matches the serial DP's optimum to fp tolerance
        acc = serial_acc(a, b)
        assert abs(path_cost(path, a, b) - acc[t1, t2]) < 1e-6, f"trial {trial}"
        # deterministic run-to-run
        assert dtw_align(a, b) == path


def test_triangle_routes_parity():
    """Dense bitset route and sparse wedge-join route must agree on both
    the global count and per-node clustering output."""
    from audio_feature_extraction_ray.stages.graph import (
        local_clustering, triangle_count)

    rng = np.random.default_rng(11)
    edges = [{"src": int(a), "dst": int(b)}
             for a, b in rng.integers(0, 40, size=(500, 2)) if a != b]
    ds = ray.data.from_items(edges).repartition(4)

    td = triangle_count(ds, dense_node_threshold=1_000).take_all()
    ts = triangle_count(ds, dense_node_threshold=0).take_all()
    assert td[0]["n_triangles"] == ts[0]["n_triangles"] > 0

    cd = sorted(local_clustering(ds, dense_node_threshold=1_000).take_all(),
                key=lambda r: r["node"])
    cs = sorted(local_clustering(ds, dense_node_threshold=0).take_all(),
                key=lambda r: r["node"])
    assert cd == cs


def test_dense_triangle_count_matches_bruteforce():
    from itertools import combinations

    from audio_feature_extraction_ray.stages.graph import triangle_count

    rng = np.random.default_rng(23)
    for trial in range(3):
        edges = {(int(min(a, b)), int(max(a, b)))
                 for a, b in rng.integers(0, 25, size=(120, 2)) if a != b}
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        expected = sum(1 for a, b, c in combinations(sorted(adj), 3)
                       if b in adj[a] and c in adj[a] and c in adj[b])
        ds = ray.data.from_items(
            [{"src": u, "dst": v} for u, v in edges]).repartition(3)
        got = triangle_count(ds, dense_node_threshold=1_000).take_all()
        assert got[0]["n_triangles"] == expected, f"trial {trial}"


def test_cooccurrence_pairs_dense_matches_bruteforce():
    from collections import Counter

    from audio_feature_extraction_ray.stages.graph import (
        cooccurrence_pairs_dense)

    rng = np.random.default_rng(31)
    rows = [{"g": int(g), "it": int(i)}
            for g, i in {(int(a), int(b))
                         for a, b in rng.integers(0, 30, size=(400, 2))}]
    support = Counter()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], set()).add(r["it"])
    for g, items in by_g.items():
        for a in items:
            for b in items:
                if a < b:
                    support[(a, b)] += 1
    expected = {(a, b, c) for (a, b), c in support.items() if c >= 2}

    items = np.sort(np.asarray(sorted({r["it"] for r in rows})))
    ds = ray.data.from_items(rows).repartition(4)
    out = cooccurrence_pairs_dense(ds, "g", "it", items, min_support=2,
                                   rows_per_task=7).take_all()
    got = {(r["src"], r["dst"], r["support"]) for r in out}
    assert got == expected


def test_supplier_projection_route_parity():
    """The dense bitset route and the packed-wedge sparse fallback of
    _supplier_projection must emit the identical pruned pair set."""
    from audio_feature_extraction_ray.pipelines.queries import (
        _supplier_projection)

    sf = "/root/testdata/sf0.001"
    dense = {(r["src"], r["dst"])
             for r in _supplier_projection(sf).take_all()}
    sparse = {(r["src"], r["dst"])
              for r in _supplier_projection(sf, dense_max_items=0).take_all()}
    assert dense == sparse and len(dense) > 0


def test_psi_and_ks_exclude_null_values():
    """Null values must carry no probability mass (PSI bin-0 / KS ECDF
    denominators): identical non-null distributions with one-sided nulls
    must report zero drift."""
    from audio_feature_extraction_ray.stages.aggregates import (
        ks_by_group, psi_by_group)

    rows = []
    for i in range(200):
        v = float(i % 20)
        rows.append({"g": "a", "v": v, "ts": 100})            # reference
        rows.append({"g": "a", "v": v, "ts": 300})            # current
    for _ in range(50):  # nulls only in the CURRENT period
        rows.append({"g": "a", "v": None, "ts": 300})
    ds = ray.data.from_items(rows).repartition(3)

    psi = psi_by_group(ds, "g", "v", "ts", cutoff_us=200).take_all()
    assert psi[0]["n_ref"] == 200 and psi[0]["n_cur"] == 200
    assert abs(psi[0]["psi"]) < 1e-9

    ks = ks_by_group(ds, "g", "v", "ts", cutoff_us=200).take_all()
    assert ks[0]["n_ref"] == 200 and ks[0]["n_cur"] == 200
    assert ks[0]["ks_d"] == 0.0


def test_exact_quantiles_ignore_nulls():
    from audio_feature_extraction_ray.stages.aggregates import exact_quantiles

    rows = [{"v": float(i)} for i in range(90)] + [{"v": None}] * 10
    ds = ray.data.from_items(rows).repartition(4)
    q50, q95 = exact_quantiles(ds, "v", [0.5, 0.95])
    # quantile_cont over the 90 non-null values 0..89
    assert abs(q50 - 44.5) < 1e-9
    assert abs(q95 - 84.55) < 1e-9


def test_rollup_agg_integer_sum_keeps_one_dtype():
    from audio_feature_extraction_ray.stages.aggregates import rollup_agg

    rows = [{"a": f"k{i % 2}", "b": f"j{i % 3}", "v": i} for i in range(30)]
    ds = ray.data.from_items(rows).repartition(2)
    out = rollup_agg(ds, ["a", "b"], "v", level_col="lvl")
    types = {str(b.schema.field("sum_v").type)
             for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows}
    assert len(types) == 1, f"union blocks disagree on sum_v dtype: {types}"
    grand = [r for r in out.take_all() if r["lvl"] == 2]
    assert grand[0]["sum_v"] == sum(range(30))


def test_grouped_rank_null_keys_and_null_sort_values():
    """SQL window semantics: NULL keys form ONE partition; NULL sort
    values tie under RANK."""
    from audio_feature_extraction_ray.stages.window import grouped_rank

    rows = [
        {"k": None, "s": 1.0, "i": 0},
        {"k": None, "s": 2.0, "i": 1},
        {"k": "a", "s": None, "i": 2},
        {"k": "a", "s": None, "i": 3},
        {"k": "a", "s": 5.0, "i": 4},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    rn = {r["i"]: r for r in grouped_rank(
        ds, "k", ["s", "i"]).take_all()}
    # NULL partition: two rows, row_numbers 1 and 2 (not two separate
    # partitions each ranking 1)
    assert sorted([rn[0]["row_number"], rn[1]["row_number"]]) == [1, 2]
    out = {r["i"]: r for r in grouped_rank(
        ds, "k", ["s"], tie_aware=True).take_all()}
    # Arrow sorts nulls LAST ascending: s=5.0 ranks 1, the two NULLs tie at 2
    assert out[4]["rank"] == 1
    assert out[2]["rank"] == out[3]["rank"] == 2


def test_value_partitioned_writer_is_byte_deterministic():
    import shutil

    from audio_feature_extraction_ray.state.checkpoint import (
        write_value_partitioned_resumable)

    rows = [{"cat": f"c{i % 3}", "x": i, "r": (i * 7) % 5} for i in range(60)]

    def write_once(seed_order):
        d = f"/tmp/vpw_test_{seed_order}"
        shutil.rmtree(d, ignore_errors=True)
        import os
        os.makedirs(d)
        shuffled = list(rows)
        rng = np.random.default_rng(seed_order)
        rng.shuffle(shuffled)
        ds = ray.data.from_items(shuffled).repartition(5)
        write_value_partitioned_resumable(ds, d, "cat", sort_keys=["x"])
        return {f: open(f"{d}/{f}", "rb").read()
                for f in sorted(os.listdir(d)) if f.endswith(".parquet")}

    a, b = write_once(1), write_once(2)
    assert a.keys() == b.keys()
    for f in a:
        assert a[f] == b[f], f"file bytes differ for {f} across row orders"


def test_salt_hot_keys_empty_hot_list_is_noop():
    """auto-salting an unskewed distribution yields no hot keys; the salter
    must still run (everything salts 0), not crash on a null-typed value
    set."""
    from audio_feature_extraction_ray.stages.asof import (
        auto_salt_hot_keys, salt_hot_keys)

    rows = [{"k": f"u{i}", "v": i} for i in range(200)]  # perfectly uniform
    ds = ray.data.from_items(rows).repartition(3)
    out = salt_hot_keys(ds, "k", []).take_all()
    assert len(out) == 200 and all(r["__salt"] == 0 for r in out)
    salted, hot = auto_salt_hot_keys(ds, "k", phi=0.25)
    assert hot == [] and salted.count() == 200


def test_asof_join_excludes_null_timestamps():
    """Null build timestamps must be unmatchable (not epoch-0); null probe
    timestamps emit the probe row with null match columns."""
    import pyarrow as pa

    from audio_feature_extraction_ray.stages.asof import (
        asof_join, asof_join_broadcast)

    probes = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a"]),
        "ts": pa.array([50, None], pa.int64()),
        "pid": pa.array([0, 1], pa.int64()),
    }))
    build = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a"]),
        # null build ts: never matchable
        "bts": pa.array([None, 40], pa.int64()),
        "price": pa.array([9.0, 7.0], pa.float64()),
    }))
    for fn in (asof_join, asof_join_broadcast):
        out = {r["pid"]: r for r in fn(
            probes, build, on="k", left_ts="ts", right_ts="bts",
            value_cols=["price"]).take_all()}
        assert len(out) == 2, fn.__name__
        assert out[0]["price_asof"] == 7.0 and out[0]["matched_ts"] == 40
        assert out[1]["price_asof"] is None and out[1]["matched_ts"] is None
        # forward direction: a null probe ts must NOT match the earliest build
        fwd = {r["pid"]: r for r in fn(
            probes, build, on="k", left_ts="ts", right_ts="bts",
            value_cols=["price"], direction="forward").take_all()}
        assert fwd[1]["price_asof"] is None, fn.__name__


def test_dedup_exact_collapses_null_keys():
    from audio_feature_extraction_ray.stages.dedup import dedup_exact

    rows = [{"fp": None, "id": 3}, {"fp": None, "id": 1},
            {"fp": "x", "id": 5}, {"fp": "x", "id": 2}]
    ds = ray.data.from_items(rows).repartition(2)
    out = sorted(dedup_exact(ds, ["fp"], "id").take_all(),
                 key=lambda r: (r["fp"] is None, r["id"]))
    # SQL GROUP BY: one row per key INCLUDING the null group, min id kept
    assert [(r["fp"], r["id"]) for r in out] == [("x", 2), (None, 1)]


def test_consecutive_neardups_normalize_ts_unit():
    import pyarrow as pa

    from audio_feature_extraction_ray.stages.dedup import (
        consecutive_neardup_flags)

    t = pa.table({
        "image_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_000, 1_700_000_001_000_000_000],
                       pa.timestamp("ns")),
        "phash": pa.array([0b1010, 0b1011], pa.int64()),
    })
    out = sorted(ray.data.from_arrow(t).map_batches(
        lambda x: x, batch_format="pyarrow") .pipe if False else
        __import__("audio_feature_extraction_ray.stages.dedup",
                   fromlist=["consecutive_neardup_flags"])
        .consecutive_neardup_flags(ray.data.from_arrow(t)).take_all(),
        key=lambda r: r["ts"])
    # ns input must come back as real 2023 timestamps, not year 55969
    assert all(2020 <= r["ts"].year <= 2030 for r in out)
    assert out[1]["prev_hamming"] == 1 and out[1]["is_consecutive_neardup"]


def test_hamming_bands_validation():
    import pytest as _pytest

    from audio_feature_extraction_ray.stages.dedup import hamming_dedup_pairs

    ds = ray.data.from_items([{"id": 1, "sig": 3}])
    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_dedup_pairs(ds, "id", "sig", max_hamming=3, bands=2)


def test_sampling_operators_handle_null_keys():
    """SQL null-comparison semantics: null-keyed rows are no-match (sample
    excludes, split labels 'rest', mix drops) instead of AttributeError."""
    import pyarrow as pa

    from audio_feature_extraction_ray.stages.sampling import (
        deterministic_sample, hash_split, leakage_safe_split, mix_domains,
        stratified_sample, weighted_sample)

    t = pa.table({
        "id": pa.array(list(range(40)), pa.int64()),
        "k": pa.array([None if i % 5 == 0 else f"v{i}" for i in range(40)]),
        "grp": pa.array([None if i < 4 else f"g{i % 7}" for i in range(40)]),
        "w": pa.array([1.0] * 40, pa.float64()),
        "dom": pa.array(["a" if i % 2 else "b" for i in range(40)]),
    })
    ds = ray.data.from_arrow(t).repartition(3)

    kept = deterministic_sample(ds, ["k"], 1.0).take_all()
    assert len(kept) == 32 and all(r["k"] is not None for r in kept)

    split = hash_split(ds, ["k"], {"train": 0.5, "test": 0.5}).take_all()
    assert all(r["split"] == "rest" for r in split if r["k"] is None)

    ws = weighted_sample(ds, ["k"], "w", k=40).take_all()
    assert all(r["k"] is not None for r in ws) and len(ws) == 32

    st = stratified_sample(ds, "dom", ["k"], k=100).take_all()
    assert len(st) == 40  # null keys sample last but are not dropped

    mx = mix_domains(ds, "dom", "w", ["k"]).take_all()
    assert all(r["k"] is not None for r in mx)

    # null GROUP values form one leakage group with a real split label
    ls = leakage_safe_split(ds, "grp", "id", {"train": 0.8, "test": 0.2}).take_all()
    nulls = [r for r in ls if r["grp"] is None]
    assert len(nulls) == 4
    assert len({(r["split"], r["group_rep"]) for r in nulls}) == 1


def test_global_rank_multiblock_matches_pandas_and_edges():
    """global_rank: row_number/percent_rank/ntile over a TOTAL order across
    the WHOLE dataset, computed per sorted block with driver-side offsets —
    must match single-process pandas semantics regardless of block count,
    and handle the empty / fewer-rows-than-tiles edges."""
    from audio_feature_extraction_ray.stages.window import global_rank

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 40, size=200)  # dense repeats → cross-block ties
    rows = [{"id": i, "v": int(vals[i])} for i in range(200)]
    ds = ray.data.from_items(rows).repartition(7)
    out = global_rank(ds, sort_keys=["v", "id"], descending=[True, False],
                      n_tiles=6).to_pandas()

    # serial oracle: stable total order (v DESC, id ASC)
    import pandas as pd
    df = pd.DataFrame(rows).sort_values(["v", "id"], ascending=[False, True]
                                        ).reset_index(drop=True)
    n = len(df)
    exp_rn = np.arange(1, n + 1)
    srt = out.sort_values(["v", "id"], ascending=[False, True]).reset_index(drop=True)
    assert (srt["id"].to_numpy() == df["id"].to_numpy()).all()
    assert (srt["row_number"].to_numpy() == exp_rn).all()
    assert np.array_equal(srt["percent_rank"].to_numpy(), (exp_rn - 1) / (n - 1))
    # NTILE: remainder rows fill leading buckets
    small, big = n // 6, n % 6
    thr = big * (small + 1)
    r = exp_rn - 1
    exp_tile = np.where(r < thr, r // (small + 1), big + (r - thr) // small) + 1
    assert (srt["ntile"].to_numpy() == exp_tile).all()
    # emitted order IS the global order (total-sort surface)
    assert (out["row_number"].to_numpy() == exp_rn).all()

    # empty input
    empty = global_rank(ds.filter(expr="v < 0"), sort_keys=["v", "id"])
    assert empty.count() == 0
    assert set(empty.schema().names) >= {"row_number", "percent_rank"}

    # fewer rows than tiles: one row per leading bucket
    tiny = ray.data.from_items(rows[:3]).repartition(2)
    t = global_rank(tiny, sort_keys=["id"], n_tiles=8).to_pandas()
    t = t.sort_values("id").reset_index(drop=True)
    assert list(t["ntile"]) == [1, 2, 3]
    # single row: percent_rank defined as 0.0
    one = global_rank(ray.data.from_items(rows[:1]), sort_keys=["id"]).to_pandas()
    assert one["percent_rank"].tolist() == [0.0]


def test_broadcast_lookup_matches_hash_join_and_edges():
    """broadcast_lookup (sorted-key searchsorted dim attach) must agree with
    the general hash_join on inner and left semantics, treat NULL probe keys
    as misses, and survive empty probe / empty dim sides."""
    import pyarrow as pa
    from audio_feature_extraction_ray.stages.joins import broadcast_lookup, hash_join

    dim = pa.table({"k": [10, 20, 30, 40], "name": ["a", "b", "c", "d"],
                    "w": [1.5, 2.5, 3.5, 4.5]})
    rows = [{"k": 20, "x": 0}, {"k": 99, "x": 1}, {"k": 10, "x": 2},
            {"k": None, "x": 3}, {"k": 40, "x": 4}, {"k": 20, "x": 5}]
    big = ray.data.from_items(rows).repartition(3)

    inner = broadcast_lookup(big, dim, key="k", value_cols=["name", "w"]
                             ).to_pandas().sort_values("x").reset_index(drop=True)
    assert inner["x"].tolist() == [0, 2, 4, 5]
    assert inner["name"].tolist() == ["b", "a", "d", "b"]
    assert inner["w"].tolist() == [2.5, 1.5, 4.5, 2.5]

    left = broadcast_lookup(big, dim, key="k", value_cols=["name"], how="left"
                            ).to_pandas().sort_values("x").reset_index(drop=True)
    assert left["x"].tolist() == [0, 1, 2, 3, 4, 5]
    assert left["name"].tolist() == ["b", None, "a", None, "d", "b"]

    # parity with the distributed hash join (non-null keys)
    dim_ds = ray.data.from_arrow(dim)
    big_nn = big.map_batches(
        lambda t: t.filter(t.column("k").is_valid()),
        batch_format="pyarrow", zero_copy_batch=True)
    hj = hash_join(big_nn, dim_ds, on="k",
                   right_on="k", join_type="inner", num_partitions=2
                   ).to_pandas().sort_values("x").reset_index(drop=True)
    assert hj["x"].tolist() == inner["x"].tolist()
    assert hj["name"].tolist() == inner["name"].tolist()

    # renamed small-side key
    dim2 = dim.rename_columns(["kk", "name", "w"])
    r = broadcast_lookup(big, dim2, key="k", small_key="kk",
                         value_cols=["name"]).to_pandas()
    assert len(r) == 4

    # empty probe side
    e = broadcast_lookup(big.filter(expr="x > 100"), dim, key="k",
                         value_cols=["name"])
    assert e.count() == 0
    # empty dim side: inner drops everything, left attaches all-null
    edim = dim.slice(0, 0)
    assert broadcast_lookup(big, edim, key="k", value_cols=["name"]).count() == 0
    l2 = broadcast_lookup(big, edim, key="k", value_cols=["name"], how="left"
                          ).to_pandas()
    assert len(l2) == 6 and l2["name"].isna().all()

    # duplicate small-side key is refused
    import pytest as _pytest
    dup = pa.table({"k": [1, 1], "name": ["x", "y"]})
    with _pytest.raises(AssertionError):
        broadcast_lookup(big, dup, key="k", value_cols=["name"]).count()


def test_graph_int_and_string_labels_agree():
    """Integer node labels take the native-int64 fast path (no string cast,
    no object arrays); the SAME graph fed as strings must produce identical
    triangle counts and clustering values on BOTH routes."""
    from audio_feature_extraction_ray.stages.graph import (
        local_clustering, triangle_count)

    rng = np.random.default_rng(41)
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, 30, size=(260, 2)) if a != b]
    ds_i = ray.data.from_items(
        [{"src": u, "dst": v} for u, v in edges]).repartition(3)
    ds_s = ray.data.from_items(
        [{"src": str(u), "dst": str(v)} for u, v in edges]).repartition(3)

    for thr in (1_000, 0):  # dense route, then sparse wedge-join route
        ti = triangle_count(ds_i, dense_node_threshold=thr).take_all()
        ts = triangle_count(ds_s, dense_node_threshold=thr).take_all()
        assert ti[0]["n_triangles"] == ts[0]["n_triangles"] > 0

        ci = {str(r["node"]): (r["degree"], r["triangles"], r["cc"])
              for r in local_clustering(ds_i, dense_node_threshold=thr).take_all()}
        cs = {r["node"]: (r["degree"], r["triangles"], r["cc"])
              for r in local_clustering(ds_s, dense_node_threshold=thr).take_all()}
        assert ci == cs
        # int labels must come back as native ints, not strings
        sample = local_clustering(ds_i, dense_node_threshold=thr).take(1)[0]
        assert isinstance(sample["node"], (int, np.integer))


def test_null_embeddings_are_excluded_not_misaligned():
    """Arrow's flatten() silently skips null list slots; a null embedding
    must be EXCLUDED with its id row (SQL null semantics), never misalign
    ids against the stacked matrix."""
    from audio_feature_extraction_ray.stages.similarity import (
        knn_bruteforce, knn_ivf, knn_lsh, label_centroids_cosine,
        quantize_embeddings)

    d = 8
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        emb = None if i % 7 == 3 else [float(x) for x in rng.normal(size=d)]
        rows.append({"vec_id": i, "label": f"l{i % 3}", "embedding": emb})
    ds = ray.data.from_items(rows).repartition(3)
    dense = ray.data.from_items(
        [r for r in rows if r["embedding"] is not None]).repartition(3)

    qm = rng.normal(size=(2, d))
    qids = np.array([100, 101])
    got = knn_bruteforce(ds, qids, qm, k=5).take_all()
    want = knn_bruteforce(dense, qids, qm, k=5).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(got, key=key) == sorted(want, key=key)
    null_ids = {r["vec_id"] for r in rows if r["embedding"] is None}
    assert not ({r["vec_id"] for r in got} & null_ids)

    gi = knn_ivf(ds, qids, qm, k=5, n_centroids=4).take_all()
    wi = knn_ivf(dense, qids, qm, k=5, n_centroids=4).take_all()
    assert sorted(gi, key=key) == sorted(wi, key=key)

    gl = knn_lsh(ds, qids, qm, k=5, n_planes=2).take_all()
    wl = knn_lsh(dense, qids, qm, k=5, n_planes=2).take_all()
    assert sorted(gl, key=key) == sorted(wl, key=key)

    gc = sorted(label_centroids_cosine(ds, "label").take_all(),
                key=lambda r: (r["label_a"], r["label_b"]))
    wc = sorted(label_centroids_cosine(dense, "label").take_all(),
                key=lambda r: (r["label_a"], r["label_b"]))
    for a, b in zip(gc, wc):
        assert a["label_a"] == b["label_a"] and a["label_b"] == b["label_b"]
        assert abs(a["cosine"] - b["cosine"]) < 1e-12

    q = quantize_embeddings(ds).take_all()
    assert {r["vec_id"] for r in q} == {r["vec_id"] for r in rows
                                        if r["embedding"] is not None}


def test_knn_ivf_empty_corpus_returns_empty():
    from audio_feature_extraction_ray.stages.similarity import knn_ivf

    ds = ray.data.from_items(
        [{"vec_id": 1, "embedding": [1.0, 0.0]}]).filter(expr="vec_id > 5")
    out = knn_ivf(ds, np.array([9]), np.array([[1.0, 0.0]]), k=3)
    assert out.count() == 0


def test_channel_histogram_rejects_bad_bins():
    from audio_feature_extraction_ray.stages.features import ChannelHistogram

    for bad in (0, -4, 100, 512):
        with pytest.raises(ValueError):
            ChannelHistogram(bins=bad)
    ChannelHistogram(bins=64)  # divisor of 256: fine


def test_interval_join_rejects_nonpositive_bucket():
    from audio_feature_extraction_ray.stages.interval import interval_join

    iv = ray.data.from_items([{"k": 1, "s": 0, "e": 10}])
    pt = ray.data.from_items([{"k": 1, "ts": 5, "v": 1.0}])
    for bad in (0, -1):
        with pytest.raises(ValueError):
            interval_join(iv, pt, on="k", start_col="s", end_col="e",
                          ts_col="ts", value_cols=["v"], bucket_us=bad)


def test_hash_cache_cross_use_raises():
    """A simhash byte cache and a fingerprint int cache must not be
    interchangeable — sharing one dict raises instead of silently
    corrupting signatures."""
    import pyarrow as pa

    from audio_feature_extraction_ray.functions.textfx import (
        rolling_fingerprint_batch, simhash_batch)

    texts = pa.array(["the quick brown fox", "jumps over the lazy dog"])
    int_cache: dict = {}
    rolling_fingerprint_batch(texts, token_hash_cache=int_cache)
    with pytest.raises(TypeError):
        simhash_batch(texts, byte_hash_cache=int_cache)

    byte_cache: dict = {}
    simhash_batch(texts, byte_hash_cache=byte_cache)
    with pytest.raises(TypeError):
        rolling_fingerprint_batch(texts, token_hash_cache=byte_cache)
