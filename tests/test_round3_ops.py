"""Round-3 operators: distributed Bloom build, distributed anti-join dedup
keep, value-partition collision safety, partition-scheme versioning,
bucket-join suffix ambiguity detection."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ bloom (distributed build)

def test_bloom_semi_join_no_false_negatives_distributed_build():
    """The distributed build must preserve the no-false-negative contract:
    every big row whose key IS in keys_ds survives the filter."""
    from audio_feature_extraction_ray.stages.joins import bloom_semi_join

    rng = np.random.default_rng(7)
    big_keys = rng.integers(0, 50_000, size=20_000)
    big = ray.data.from_arrow(
        pa.table({"k": pa.array(big_keys, pa.int64()),
                  "v": pa.array(np.arange(20_000), pa.int64())})
    )
    # key set with duplicates (sizing uses row count, dupes must be harmless)
    member = rng.integers(0, 50_000, size=6_000)
    keys_ds = ray.data.from_arrow(
        pa.table({"k": pa.array(np.concatenate([member, member]), pa.int64())})
    ).repartition(8)  # several build blocks → several partial bit arrays
    out = bloom_semi_join(big, keys_ds, key="k", fpp=0.01)
    got = set()
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        got.update(b.column("v").to_pylist())
    member_set = set(member.tolist())
    expected_true = {i for i, k in enumerate(big_keys.tolist()) if k in member_set}
    assert expected_true <= got  # no false negatives
    # false positives bounded (fpp=1% with generous slack for sizing noise)
    fp = len(got - expected_true)
    non_members = 20_000 - len(expected_true)
    assert fp <= max(50, int(non_members * 0.05))


def test_bloom_semi_join_empty_keys():
    from audio_feature_extraction_ray.stages.joins import bloom_semi_join

    big = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    keys_ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out = bloom_semi_join(big, keys_ds, key="k")
    assert out.count() == 0


# ------------------------------------------------------------------ distributed anti-join

def test_distributed_anti_join_matches_broadcast():
    from audio_feature_extraction_ray.stages.dedup import distributed_anti_join
    from audio_feature_extraction_ray.stages.joins import broadcast_semi_join

    rng = np.random.default_rng(11)
    ids = np.arange(5_000, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "x": pa.array(rng.random(5_000))})
    ).repartition(6)
    drop = np.unique(rng.integers(0, 5_000, size=1_200)).astype(np.int64)
    drops_ds = ray.data.from_arrow(pa.table({"drop_id": pa.array(drop)})).repartition(4)
    got = distributed_anti_join(ds, drops_ds, key="doc_id", keys_col="drop_id")
    want = broadcast_semi_join(
        ds, pa.table({"doc_id": pa.array(drop)}), key="doc_id", anti=True
    )
    g = sorted(r["doc_id"] for r in got.take_all())
    w = sorted(r["doc_id"] for r in want.take_all())
    assert g == w
    assert set(g) == set(ids.tolist()) - set(drop.tolist())


def test_dedup_keep_representatives_distributed_path():
    """Force the anti-join path with a tiny broadcast_threshold and pin it to
    the broadcast path's output."""
    from audio_feature_extraction_ray.stages.dedup import dedup_keep_representatives

    ids = pa.array(np.arange(60, dtype=np.int64))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
    # chain components: (0,1),(1,2) ; (10,11) ; (20,21),(21,22),(22,23)
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([0, 1, 10, 20, 21, 22], pa.int64()),
                "id_b": pa.array([1, 2, 11, 21, 22, 23], pa.int64()),
            }
        )
    )
    kept_dist = sorted(
        r["doc_id"]
        for r in dedup_keep_representatives(
            ds, pairs, "doc_id", broadcast_threshold=0
        ).take_all()
    )
    kept_bcast = sorted(
        r["doc_id"]
        for r in dedup_keep_representatives(
            ds, pairs, "doc_id", broadcast_threshold=10**9
        ).take_all()
    )
    assert kept_dist == kept_bcast
    dropped = set(np.arange(60).tolist()) - set(kept_dist)
    assert dropped == {1, 2, 11, 21, 22, 23}


# ------------------------------------------------------------------ checkpoint safety

def test_value_partitioned_colliding_categories(tmp_path):
    """'a/b' and 'a_b' sanitize identically — the digest prefix must keep
    their files and manifest markers distinct (silent data loss before)."""
    from audio_feature_extraction_ray.state.checkpoint import (
        read_manifest,
        write_value_partitioned_resumable,
    )

    out = str(tmp_path / "collide")
    t = pa.table(
        {
            "cat": pa.array(["a/b", "a_b", "a/b", "a_b"], pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    manifest = write_value_partitioned_resumable(
        ray.data.from_arrow(t), out, category_col="cat"
    )
    cats = sorted(manifest.column("category").to_pylist())
    assert cats == ["a/b", "a_b"]
    paths = set(manifest.column("path").to_pylist())
    assert len(paths) == 2
    rows = read_manifest(out)
    assert len(rows) == 2
    import pyarrow.parquet as pq

    total = sum(pq.read_table(p).num_rows for p in paths)
    assert total == 4


def test_partition_scheme_mismatch_refused(tmp_path):
    from audio_feature_extraction_ray.state.checkpoint import (
        write_partitioned_resumable,
    )

    out = str(tmp_path / "sch")
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([1.0, 2.0, 3.0])})
    )
    write_partitioned_resumable(ds, out, key="k", n_partitions=4)
    # resuming with the same scheme/partition-count is fine (all skipped)
    m = write_partitioned_resumable(ds, out, key="k", n_partitions=4)
    assert all(m.column("skipped").to_pylist())
    # a different partition count (or a future hash-scheme change) must refuse
    with pytest.raises(ValueError, match="partition"):
        write_partitioned_resumable(ds, out, key="k", n_partitions=8)
    # simulate a directory written under an older hash scheme
    sch = os.path.join(out, "_manifest", "_scheme.json")
    with open(sch, "w") as f:
        json.dump({"scheme": "crc32-v0", "n_partitions": 4}, f)
    with pytest.raises(ValueError, match="scheme|partition"):
        write_partitioned_resumable(ds, out, key="k", n_partitions=4)


# ------------------------------------------------------------------ minhash prefix band shuffle

def _neardup_corpus(n_base=40, seed=3):
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
    texts, ids = [], []
    did = 0
    for i in range(n_base):
        base = " ".join(rng.choice(words, size=30).tolist())
        texts.append(base); ids.append(did); did += 1
        if i % 3 == 0:  # a near-dup: tweak one word
            toks = base.split()
            toks[rng.integers(0, len(toks))] = "zulu"
            texts.append(" ".join(toks)); ids.append(did); did += 1
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


@pytest.mark.parametrize("threshold", [0.7, 0.85])
def test_minhash_prefix_path_matches_full(threshold):
    """The signature-prefix band shuffle must emit the EXACT same pair set
    (ids + est_jaccard) as the full-signature in-band path."""
    from audio_feature_extraction_ray.stages.dedup import (
        _prefix_prune_bound,
        minhash_dedup_pairs,
    )

    ds = _neardup_corpus()
    full = minhash_dedup_pairs(ds, "doc_id", threshold=threshold, sig_prefix=None)
    pref = minhash_dedup_pairs(ds, "doc_id", threshold=threshold, sig_prefix="auto")

    def pairset(d):
        return sorted(
            (r["id_a"], r["id_b"], round(r["est_jaccard"], 12)) for r in d.take_all()
        )

    a, b = pairset(full), pairset(pref)
    assert a == b and len(a) > 0
    # the auto prefix actually prunes at these thresholds
    assert _prefix_prune_bound(64, 32, threshold) >= 1
    # the scale path (distributed verify joins) must match too
    joined = minhash_dedup_pairs(
        ds, "doc_id", threshold=threshold, sig_prefix="auto", verify_broadcast_pairs=0
    )
    assert pairset(joined) == a


def test_prefix_prune_bound_exact():
    from audio_feature_extraction_ray.stages.dedup import _prefix_prune_bound

    # threshold 0.8 over 64 perms → min full agreement 52; 16-perm prefix can
    # prune anything agreeing on ≤3 prefix perms (52 - 48 = 4 needed)
    assert _prefix_prune_bound(64, 16, 0.8) == 4
    # threshold 0.7 → 45 needed; a 16-perm prefix cannot prune (bound < 1)
    assert _prefix_prune_bound(64, 16, 0.7) < 1
    assert _prefix_prune_bound(64, 32, 0.7) == 13


# ------------------------------------------------------------------ bucket join ambiguity

def test_bucket_hash_join_suffix_ambiguity_raises():
    from audio_feature_extraction_ray.stages.joins import bucket_hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "x": pa.array([1.0, 2.0])})
    )
    # right has both a clashing 'x' (suffixes to 'x_r') and a native 'x_r'
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "x": pa.array([10.0, 20.0]),
                "x_r": pa.array([100.0, 200.0]),
            }
        )
    )
    with pytest.raises(ValueError, match="ambiguous"):
        bucket_hash_join(left, right, on="k")


# ------------------------------------------------------------------ cubic gap interpolation (F4)

def _dense_natural_spline(t, y, tg):
    """Reference: full-matrix natural-spline solve (np.linalg, O(m^3))."""
    m = len(t)
    h = np.diff(t)
    slope = np.diff(y) / h
    A = np.zeros((m, m))
    b = np.zeros(m)
    A[0, 0] = A[-1, -1] = 1.0
    for i in range(1, m - 1):
        A[i, i - 1], A[i, i], A[i, i + 1] = h[i - 1], 2 * (h[i - 1] + h[i]), h[i]
        b[i] = 6 * (slope[i] - slope[i - 1])
    M = np.linalg.solve(A, b)
    seg = np.clip(np.searchsorted(t, tg, side="right") - 1, 0, m - 2)
    hs = h[seg]
    ta, tb = t[seg], t[seg + 1]
    return (M[seg] * (tb - tg) ** 3 / (6 * hs) + M[seg + 1] * (tg - ta) ** 3 / (6 * hs)
            + (y[seg] / hs - M[seg] * hs / 6) * (tb - tg)
            + (y[seg + 1] / hs - M[seg + 1] * hs / 6) * (tg - ta))


def test_cubic_interp_matches_dense_solve():
    from audio_feature_extraction_ray.stages.window import _interp_time_cubic

    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(3, 50))
        tsv = np.sort(rng.choice(100_000, size=n, replace=False)).astype(np.int64)
        x = rng.normal(size=n)
        mask = rng.random(n) < 0.4
        xm = x.copy()
        xm[mask] = np.nan
        got = _interp_time_cubic(xm.copy(), tsv)
        valid = ~np.isnan(xm)
        if valid.sum() < 3:
            continue
        t, y = tsv[valid].astype(float), xm[valid]
        gap = np.isnan(xm) & (tsv > t[0]) & (tsv < t[-1])
        exp = xm.copy()
        if gap.any():
            exp[gap] = _dense_natural_spline(t, y, tsv[gap].astype(float))
        np.testing.assert_allclose(np.nan_to_num(got, nan=-9e9),
                                   np.nan_to_num(exp, nan=-9e9), atol=1e-9)


def test_cubic_interp_edge_semantics():
    from audio_feature_extraction_ray.stages.window import _interp_time_cubic

    tsv = np.array([0, 10, 20, 30, 40, 50], dtype=np.int64)
    # collinear points -> exact linear fill
    x = np.array([0.0, np.nan, 2.0, np.nan, 4.0, 5.0])
    np.testing.assert_allclose(_interp_time_cubic(x.copy(), tsv), [0, 1, 2, 3, 4, 5])
    # leading/trailing nulls never extrapolate
    x2 = np.array([np.nan, 1.0, np.nan, 3.0, np.nan], dtype=np.float64)
    g2 = _interp_time_cubic(x2.copy(), tsv[:5])
    assert np.isnan(g2[0]) and np.isnan(g2[4]) and abs(g2[2] - 2.0) < 1e-12
    # fewer than 2 valid points -> unchanged
    x3 = np.array([np.nan, 7.0, np.nan])
    g3 = _interp_time_cubic(x3.copy(), tsv[:3])
    assert np.isnan(g3[0]) and g3[1] == 7.0 and np.isnan(g3[2])


def test_window_features_cubic_interp_e2e():
    """interp_method='cubic' flows through window_features and differs from
    linear on curved data while agreeing at valid rows."""
    from audio_feature_extraction_ray.stages.window import window_features

    ts = np.arange(0, 120, 10, dtype="datetime64[us]")
    vals = (np.arange(12, dtype=np.float64)) ** 2
    v = vals.copy()
    v[[3, 4, 7]] = np.nan
    t = pa.table({
        "k": pa.array([1] * 12, pa.int64()),
        "ts": pa.array(ts),
        "v": pa.array(v, pa.float64(), from_pandas=True),
    })
    ds = ray.data.from_arrow(t)
    lin = window_features(ds, key="k", ts="ts", value_cols=[], lags=(), leads=(),
                          deltas=False, interp_cols=["v"]).to_pandas()
    cub = window_features(ds, key="k", ts="ts", value_cols=[], lags=(), leads=(),
                          deltas=False, interp_cols=["v"], interp_method="cubic").to_pandas()
    valid = ~np.isnan(v)
    np.testing.assert_allclose(cub["v_interp"][valid], vals[valid])
    # curved data: cubic fill is closer to the true quadratic than linear
    gaps = np.isnan(v)
    err_c = np.abs(cub["v_interp"][gaps].to_numpy() - vals[gaps])
    err_l = np.abs(lin["v_interp"][gaps].to_numpy() - vals[gaps])
    assert err_c.sum() < err_l.sum()


def test_prefix_prune_bound_never_drops_qualifying_pair():
    """Property: for random signature pairs, prefix agreement below the bound
    implies full agreement below threshold — the prune is exact."""
    from audio_feature_extraction_ray.stages.dedup import _prefix_prune_bound

    rng = np.random.default_rng(5)
    num_perm = 64
    for threshold in (0.6, 0.7, 0.8, 0.9):
        for prefix in (8, 16, 32, 48):
            bound = _prefix_prune_bound(num_perm, prefix, threshold)
            for _ in range(300):
                a = rng.integers(0, 4, size=num_perm)
                b = a.copy()
                flip = rng.random(num_perm) < rng.random()
                b[flip] = a[flip] + 1 + rng.integers(0, 3, size=int(flip.sum()))
                full_agree = int((a == b).sum())
                prefix_agree = int((a[:prefix] == b[:prefix]).sum())
                est = full_agree / num_perm
                if est >= threshold:  # qualifying pair must survive the prune
                    assert prefix_agree >= bound


# ------------------------------------------------------------------ repetition + decontamination kernels

def test_repetition_batch_matches_serial():
    from audio_feature_extraction_ray.functions.textfx import (
        repetition_batch,
        repetition_signals,
    )

    rng = np.random.default_rng(0)
    words = ["a", "bb", "ccc", "dd", "e", "spam", "ham", "x1"]
    texts = []
    for i in range(200):
        toks = rng.choice(words, size=rng.integers(0, 40)).tolist()
        t = " ".join(toks)
        if i % 4 == 0:
            lines = [" ".join(rng.choice(words, size=3)) for _ in range(rng.integers(1, 6))]
            if i % 8 == 0:
                lines.append(lines[0])
            t = "\n".join(lines + ([""] if i % 3 else []))
        texts.append(t)
    texts += ["", "   ", "\n\n\n", "one", "tok tok tok tok tok"]
    col = pa.array(texts, pa.string())
    d, t2 = repetition_batch(col)
    for i, txt in enumerate(texts):
        ed, et = repetition_signals(txt)
        assert abs(ed - d[i]) < 1e-12 and abs(et - t2[i]) < 1e-12, (i, txt[:40])


def test_contamination_batch_matches_serial():
    from audio_feature_extraction_ray.functions.textfx import (
        contamination_batch,
        ngram_window_hashes,
    )

    rng = np.random.default_rng(1)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    bench_texts = [" ".join(rng.choice(words, size=20).tolist()) for _ in range(4)]
    bench = set()
    for bt in bench_texts:
        bench |= ngram_window_hashes(bt, 8)
    bench_sorted = np.array(sorted(bench), dtype=np.uint64)
    corpus = (
        [" ".join(rng.choice(words, size=rng.integers(0, 30)).tolist()) for _ in range(60)]
        + bench_texts
        + [bench_texts[0] + " tail", "short doc"]
    )
    hits, flag = contamination_batch(pa.array(corpus, pa.string()), bench_sorted, window=8)
    for i, txt in enumerate(corpus):
        own_hashes = ngram_window_hashes(txt, 8)
        # serial count with multiplicity
        toks = [w.lower() for w in txt.split()]
        from audio_feature_extraction_ray.functions.textfx import _FP_BASE, _FP_MASK, _token_hash32

        cnt = 0
        for j in range(max(len(toks) - 7, 0)):
            acc = 0
            for w in toks[j : j + 8]:
                acc = (acc * _FP_BASE + _token_hash32(w)) & _FP_MASK
            if acc in bench:
                cnt += 1
        assert hits[i] == cnt and flag[i] == (cnt > 0), (i, txt[:40])
    assert flag[-2] and flag[60]  # the planted copies are caught
    assert not flag[-1]


# ------------------------------------------------------------------ grouped corr / entropy / collect / mode

def test_grouped_corr_pairwise_nulls_and_degenerate():
    from audio_feature_extraction_ray.stages.aggregates import grouped_corr

    rows = {
        # group "a": clean positive correlation, plus a half-null pair that
        # SQL corr() must drop (pairwise deletion)
        "k": ["a"] * 5 + ["b"] * 3 + ["c"] * 2,
        "x": [1.0, 2.0, 3.0, 4.0, None, 5.0, 5.0, 5.0, 1.0, 2.0],
        "y": [2.0, 4.0, 6.0, 8.0, 9.0, 1.0, 2.0, 3.0, None, None],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = {r["k"]: r for r in grouped_corr(ds, "k", "x", "y").take_all()}
    # a: perfect linear y=2x on the 4 complete pairs
    assert out["a"]["n"] == 4
    assert abs(out["a"]["corr"] - 1.0) < 1e-12
    assert abs(out["a"]["cov_pop"] - np.cov([1, 2, 3, 4], [2, 4, 6, 8], bias=True)[0, 1]) < 1e-12
    # b: zero variance in x -> corr null, cov 0
    assert out["b"]["n"] == 3
    assert out["b"]["corr"] is None or (
        isinstance(out["b"]["corr"], float) and np.isnan(out["b"]["corr"])
    )
    assert abs(out["b"]["cov_pop"]) < 1e-12
    # c: no complete pairs -> n 0, both null/nan
    assert out["c"]["n"] == 0


def test_grouped_corr_matches_numpy_on_random():
    from audio_feature_extraction_ray.stages.aggregates import grouped_corr

    rng = np.random.default_rng(7)
    k = rng.integers(0, 5, 4000)
    x = rng.normal(size=4000) * 10
    y = 0.5 * x + rng.normal(size=4000)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k, pa.int64()), "x": x, "y": y})
    ).repartition(8)
    out = {r["k"]: r for r in grouped_corr(ds, "k", "x", "y").take_all()}
    for g in range(5):
        m = k == g
        assert out[g]["n"] == int(m.sum())
        assert abs(out[g]["corr"] - np.corrcoef(x[m], y[m])[0, 1]) < 1e-9
        assert abs(out[g]["cov_pop"] - np.cov(x[m], y[m], bias=True)[0, 1]) < 1e-9


def test_grouped_entropy_known_values():
    from audio_feature_extraction_ray.stages.aggregates import grouped_entropy

    rows = {
        "k": ["u"] * 4 + ["s"] * 4 + ["n"] * 3,
        "v": ["a", "b", "c", "d",      # uniform over 4 -> H = 2 bits
              "a", "a", "a", "a",      # single value -> H = 0
              "a", None, "b"],         # null excluded -> uniform over 2 -> H = 1
    }
    ds = ray.data.from_arrow(pa.table(rows)).repartition(3)
    out = {r["k"]: r for r in grouped_entropy(ds, "k", "v").take_all()}
    assert out["u"]["n"] == 4 and abs(out["u"]["entropy"] - 2.0) < 1e-12
    assert out["s"]["n"] == 4 and abs(out["s"]["entropy"] - 0.0) < 1e-12
    assert out["n"]["n"] == 2 and abs(out["n"]["entropy"] - 1.0) < 1e-12


def test_grouped_collect_order_and_offsets_across_partitions():
    from audio_feature_extraction_ray.stages.aggregates import grouped_collect

    rng = np.random.default_rng(3)
    n = 3000
    k = rng.integers(0, 40, n)
    ts = rng.permutation(n)
    v = np.arange(n)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k, pa.int64()), "ts": pa.array(ts, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    ).repartition(7)
    out = {r["k"]: r["vals"] for r in
           grouped_collect(ds, "k", "v", order_cols=["ts"], out_col="vals").take_all()}
    assert len(out) == len(np.unique(k))
    for g in np.unique(k):
        m = k == g
        expect = v[m][np.argsort(ts[m], kind="stable")].tolist()
        assert list(out[g]) == expect, g


def test_grouped_mode_tie_breaks_deterministically():
    from audio_feature_extraction_ray.stages.aggregates import grouped_mode

    rows = {"k": ["a"] * 4 + ["b"] * 3,
            "v": [2, 1, 2, 1,      # tie 2x each -> smallest value wins: 1
                  9, 9, 3]}        # 9 wins outright
    ds = ray.data.from_arrow(pa.table(rows)).repartition(4)
    out = {r["k"]: r for r in grouped_mode(ds, "k", "v").take_all()}
    assert out["a"]["mode"] == 1 and out["a"]["n"] == 2
    assert out["b"]["mode"] == 9 and out["b"]["n"] == 2


def test_tfidf_top_terms_matches_serial_and_vocab_cap():
    from audio_feature_extraction_ray.stages.text import tfidf_top_terms

    texts = [
        "apple banana apple",        # tf apple=2
        "banana cherry",
        "apple cherry cherry date",
        "",                          # empty doc -> no output rows
        "   ",                       # whitespace-only -> no output rows
        "unique solo",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(3)
    out = tfidf_top_terms(ds, "doc_id", "text", k=2).take_all()
    n = 6
    import math

    def idf(df):
        return math.log((1 + n) / (1 + df)) + 1

    dfs = {"apple": 2, "banana": 2, "cherry": 2, "date": 1, "unique": 1, "solo": 1}
    # doc 0: apple tf=2 beats banana tf=1
    d0 = sorted([r for r in out if r["doc_id"] == 0], key=lambda r: -r["tfidf"])
    assert [r["token"] for r in d0] == ["apple", "banana"]
    assert abs(d0[0]["tfidf"] - round(2 * idf(2), 6)) < 1e-9
    # empty/whitespace docs emit nothing
    assert not [r for r in out if r["doc_id"] in (3, 4)]
    # doc 5: tie on tfidf (both tf=1, df=1) -> token-asc wins first
    d5 = [r["token"] for r in sorted(
        (r for r in out if r["doc_id"] == 5), key=lambda r: (-r["tfidf"], r["token"]))]
    assert d5 == ["solo", "unique"]
    # vocab cap: keep top-2 df tokens (apple, banana by df desc, token asc);
    # OOV tokens score 0 but still occupy output slots deterministically
    capped = tfidf_top_terms(ds, "doc_id", "text", k=1, max_vocab=2).take_all()
    c2 = [r for r in capped if r["doc_id"] == 2]
    assert len(c2) == 1 and c2[0]["token"] == "apple"  # cherry/date are OOV -> 0


def test_grouped_linreg_known_fits():
    from audio_feature_extraction_ray.stages.aggregates import grouped_linreg

    rng = np.random.default_rng(11)
    x = rng.normal(size=500)
    rows = {
        "k": ["fit"] * 500 + ["flat"] * 3,
        "x": np.concatenate([x, [2.0, 2.0, 2.0]]),
        "y": np.concatenate([3.0 * x + 1.0, [5.0, 6.0, 7.0]]),
    }
    ds = ray.data.from_arrow(pa.table(rows)).repartition(5)
    out = {r["k"]: r for r in grouped_linreg(ds, "k", "x", "y").take_all()}
    assert abs(out["fit"]["slope"] - 3.0) < 1e-9
    assert abs(out["fit"]["intercept"] - 1.0) < 1e-9
    assert abs(out["fit"]["r2"] - 1.0) < 1e-12
    # zero variance in x -> slope/intercept/r2 null
    flat = out["flat"]
    for c in ("slope", "intercept", "r2"):
        assert flat[c] is None or np.isnan(flat[c])


def test_heavy_hitters_exact_and_prunes():
    from audio_feature_extraction_ray.stages.aggregates import heavy_hitters

    rng = np.random.default_rng(5)
    # zipf-ish: two hot keys + a long unique tail, plus nulls (excluded)
    vals = (["hot"] * 300 + ["warm"] * 120
            + [f"tail{i}" for i in range(580)] + [None] * 40)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.string())})).repartition(6)
    n = 1000  # non-null rows
    out = {r["k"]: r["n"] for r in heavy_hitters(ds, "k", phi=0.1).take_all()}
    assert out == {"hot": 300, "warm": 120}
    # phi above every frequency -> empty, no crash
    assert heavy_hitters(ds, "k", phi=0.5).take_all() == []
    # exactness at the boundary: phi*N == exact count of 'warm'
    out2 = {r["k"]: r["n"] for r in heavy_hitters(ds, "k", phi=0.12).take_all()}
    assert out2 == {"hot": 300, "warm": 120}


def test_target_encode_smoothing_and_unseen():
    from audio_feature_extraction_ray.stages.scaling import target_encode

    rows = {
        "cat": ["a"] * 4 + ["b"] * 2 + ["c"] + [None],
        "y": [1.0, 2.0, 3.0, 4.0, 10.0, None, 7.0, 5.0],
    }
    ds = ray.data.from_arrow(pa.table(rows)).repartition(3)
    out = target_encode(ds, "cat", "y", smoothing=2.0, out_col="te").take_all()
    # global mean over non-null targets: (1+2+3+4+10+7+5)/7
    mu = 32.0 / 7.0
    by_cat = {}
    for r in out:
        by_cat.setdefault(r["cat"], []).append(r["te"])
    assert all(abs(v - (10.0 + 2 * mu) / (4 + 2)) < 1e-12 for v in by_cat["a"])
    assert abs(by_cat["c"][0] - (7.0 + 2 * mu) / (1 + 2)) < 1e-12
    # 'b' has one null target: n counts non-null only (SQL COUNT(col))
    assert all(abs(v - (10.0 + 2 * mu) / (1 + 2)) < 1e-12 for v in by_cat["b"])
    # null category is its OWN level (one SQL GROUP BY group; missingness
    # is signal): smoothed with its own (s=5.0, n=1) stats
    assert abs(by_cat[None][0] - (5.0 + 2 * mu) / (1 + 2)) < 1e-12
    assert len(out) == 8


def test_hashing_vectorizer_serial_parity_and_cancellation():
    import hashlib

    from audio_feature_extraction_ray.stages.text import hashing_vectorizer

    texts = ["apple banana apple", "", "  ", "cherry", "apple apple apple"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(2)
    out = hashing_vectorizer(ds, "doc_id", "text", dim=8).take_all()

    def serial(text, dim=8):
        acc = {}
        for tok in text.split():
            hx = hashlib.md5(tok.encode()).hexdigest()
            b = int(hx[:8], 16) % dim
            s = 1 if int(hx[8], 16) % 2 == 0 else -1
            acc[b] = acc.get(b, 0) + s
        return acc

    got = {}
    for r in out:
        got.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    for i, txt in enumerate(texts):
        assert got.get(i, {}) == serial(txt), (i, txt)
    # empty docs emit nothing
    assert 1 not in got and 2 not in got


def test_chi_square_hand_computed_and_independence():
    from audio_feature_extraction_ray.stages.aggregates import chi_square

    # 2x2 with known chi2: obs [[10, 20], [30, 40]]
    rows = {"a": ["x"] * 30 + ["y"] * 70,
            "b": ["p"] * 10 + ["q"] * 20 + ["p"] * 30 + ["q"] * 40}
    ds = ray.data.from_arrow(pa.table(rows)).repartition(4)
    out = chi_square(ds, "a", "b").take_all()[0]
    obs = np.array([[10.0, 20.0], [30.0, 40.0]])
    exp = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
    want = float(((obs - exp) ** 2 / exp).sum())
    assert abs(out["chi2"] - want) < 1e-9
    assert out["dof"] == 1 and out["n"] == 100
    assert abs(out["cramers_v"] - np.sqrt(want / 100.0)) < 1e-9
    # perfectly independent table -> chi2 == 0
    rows2 = {"a": ["x", "x", "y", "y"] * 25, "b": ["p", "q", "p", "q"] * 25}
    out2 = chi_square(ray.data.from_arrow(pa.table(rows2)), "a", "b").take_all()[0]
    assert abs(out2["chi2"]) < 1e-12
    # nulls excluded, zero-observed cells carry expected mass (no div-by-0)
    rows3 = {"a": ["x", "x", "y", None], "b": ["p", "q", "p", "p"]}
    out3 = chi_square(ray.data.from_arrow(pa.table(rows3)), "a", "b").take_all()[0]
    assert out3["n"] == 3 and np.isfinite(out3["chi2"])


def test_cohort_retention_hand_case():
    import datetime as dt

    from audio_feature_extraction_ray.stages.aggregates import cohort_retention

    # week1 = Mon 2024-01-01; week2 = Mon 2024-01-08
    w1, w2 = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 10)
    rows = {
        "u": [1, 1, 1, 2, 3, 3],
        "ts": [w1, w1, w2, w2, w1, w1 + dt.timedelta(days=1)],
    }
    ds = ray.data.from_arrow(
        pa.table({"u": pa.array(rows["u"], pa.int64()),
                  "ts": pa.array(rows["ts"], pa.timestamp("us"))})
    ).repartition(3)
    out = {(r["cohort_week"], r["week_offset"]): r["active_users"]
           for r in cohort_retention(ds, "u", "ts").take_all()}
    mon1 = dt.datetime(2024, 1, 1)
    mon1 = __import__("pandas").Timestamp(mon1)
    k = {(c.to_pydatetime() if hasattr(c, "to_pydatetime") else c, o): v
         for (c, o), v in out.items()}
    # cohort week1: users 1 & 3 active in offset 0 (2 users); user 1 also in offset 1
    assert k[(dt.datetime(2024, 1, 1), 0)] == 2
    assert k[(dt.datetime(2024, 1, 1), 1)] == 1
    # cohort week2: user 2 only
    assert k[(dt.datetime(2024, 1, 8), 0)] == 1
    assert len(k) == 3


def test_ngram_frequencies_doc_bounded():
    from audio_feature_extraction_ray.stages.text import ngram_frequencies

    texts = ["a b c", "c a b", "solo", "", "  a   b  "]  # runs collapse
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    ds = ds.repartition(2)
    out = {r["gram"]: r["n"] for r in ngram_frequencies(ds, "text", n=2, k=10).take_all()}
    # "a b" appears in docs 0, 1, 4; "b c" in doc 0; "c a" in doc 1.
    # No cross-document grams ("c c" etc.), no grams from "solo"/empty docs.
    assert out == {"a b": 3, "b c": 1, "c a": 1}
    # trigram
    out3 = {r["gram"]: r["n"] for r in ngram_frequencies(ds, "text", n=3, k=10).take_all()}
    assert out3 == {"a b c": 1, "c a b": 1}


def test_funnel_sequential_chaining():
    import datetime as dt

    from audio_feature_extraction_ray.stages.aggregates import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        # user 1: full ordered chain
        (1, ts(0), "click"), (1, ts(1), "view"), (1, ts(2), "purchase"),
        # user 2: purchase BEFORE view -> stops at view
        (2, ts(0), "click"), (2, ts(2), "view"), (2, ts(1), "purchase"),
        # user 3: view only, never clicked -> counts nowhere
        (3, ts(0), "view"), (3, ts(1), "purchase"),
        # user 4: click then simultaneous view (strict-after excludes it)
        (4, ts(0), "click"), (4, ts(0), "view"),
        # user 5: click, later chain via SECOND view (first-touch on view
        # at t1, purchase after it)
        (5, ts(0), "click"), (5, ts(1), "view"), (5, ts(3), "view"),
        (5, ts(2), "purchase"),
    ]
    ds = ray.data.from_arrow(
        pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "typ": pa.array([r[2] for r in rows], pa.string()),
        })
    ).repartition(3)
    out = {r["step"]: r["users"] for r in
           funnel(ds, "u", "ts", "typ", ["click", "view", "purchase"]).take_all()}
    # click: users 1,2,4,5; view-after-click: 1,2,5; purchase-after-first-view: 1,5
    assert out == {"click": 4, "view": 3, "purchase": 2}


def test_label_centroids_cosine_hand_case():
    import numpy as np

    from audio_feature_extraction_ray.stages.similarity import label_centroids_cosine

    # label a -> centroid (1,0); label b -> centroid (0,2); label c -> (1,1)
    embs = [[2.0, 0.0], [0.0, 0.0], [0.0, 2.0], [1.0, 1.0]]
    labs = ["a", "a", "b", "c"]
    ds = ray.data.from_arrow(
        pa.table({"label": pa.array(labs), "embedding": pa.array(embs,
                  pa.list_(pa.float64()))})
    ).repartition(3)
    out = {(r["label_a"], r["label_b"]): r["cosine"]
           for r in label_centroids_cosine(ds, "label").take_all()}
    s2 = 1 / np.sqrt(2)
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert abs(out[("a", "b")] - 0.0) < 1e-12
    assert abs(out[("a", "c")] - s2) < 1e-12
    assert abs(out[("b", "c")] - s2) < 1e-12


def test_resample_grid_hand_case():
    import datetime as dt

    from audio_feature_extraction_ray.stages.window import resample_grid

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    # entity 1: events at 0:30, 2:15 -> grid points 1:00,2:00 (ffill 0:30's
    # value), then nothing past 2:15 (max < 3:00)
    # entity 2: single event exactly ON the grid at 1:00 -> one grid point
    # carrying its own value
    # entity 3: span shorter than one interval -> no grid points
    tbl = pa.table({
        "u": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "ts": pa.array([ts(30), ts(135), ts(60), ts(10), ts(20)], pa.timestamp("us")),
        "v": pa.array([10.0, 20.0, 5.0, 1.0, 2.0], pa.float64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = resample_grid(ds, "u", "ts", ["v"], every_us=3_600_000_000).take_all()
    got = {(r["u"], r["ts"]): r["v_ffill"] for r in out}
    assert got == {
        (1, ts(60)): 10.0,
        (1, ts(120)): 10.0,
        (2, ts(60)): 5.0,
    }


def test_rolling_order_stats_hand_case():
    import datetime as dt

    from audio_feature_extraction_ray.stages.window import rolling_order_stats

    t0 = dt.datetime(2024, 1, 1)
    vals = [5.0, 1.0, 3.0, 9.0]
    tbl = pa.table({
        "u": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([t0 + dt.timedelta(minutes=m) for m in range(4)],
                       pa.timestamp("us")),
        "v": pa.array(vals, pa.float64()),
    })
    out = rolling_order_stats(ray.data.from_arrow(tbl).repartition(2),
                              "u", "ts", "v", k=3).take_all()
    out.sort(key=lambda r: r["ts"])
    assert [r["v_rollmedian_3"] for r in out] == [5.0, 3.0, 3.0, 3.0]
    assert [r["v_rollmin_3"] for r in out] == [5.0, 1.0, 1.0, 1.0]
    assert [r["v_rollmax_3"] for r in out] == [5.0, 5.0, 5.0, 9.0]


def test_grouped_spearman_ties_and_monotone():
    from audio_feature_extraction_ray.stages.aggregates import grouped_spearman

    # group a: perfectly monotone (nonlinear) -> rho 1; group b: reversed
    # with a tie pair in x; group c: constant x -> null
    tbl = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 4 + ["c"] * 3),
        "x": pa.array([1.0, 2.0, 3.0, 4.0, 1.0, 1.0, 2.0, 3.0, 7.0, 7.0, 7.0]),
        "y": pa.array([1.0, 10.0, 100.0, 1000.0, 4.0, 3.0, 2.0, 1.0, 1.0, 2.0, 3.0]),
    })
    out = {r["g"]: r for r in grouped_spearman(
        ray.data.from_arrow(tbl).repartition(3), "g", "x", "y").take_all()}
    assert out["a"]["spearman"] == 1.0 and out["a"]["n"] == 4
    # b: rx = [1.5, 1.5, 3, 4], ry = [4, 3, 2, 1] -> scipy spearmanr = -0.948683...
    assert abs(out["b"]["spearman"] - (-0.9486832980505138)) < 1e-12
    assert out["c"]["spearman"] is None


def test_ewma_matches_naive_recursion_with_nulls():
    import datetime as dt

    import numpy as np

    from audio_feature_extraction_ray.stages.window import ewma

    rng = np.random.default_rng(7)
    n = 300  # spans several 64-chunks
    vals = rng.normal(100, 20, n)
    vals[[0, 5, 100, 101, 250]] = np.nan  # leading null + interior runs
    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "u": pa.array([1] * n, pa.int64()),
        "ts": pa.array([t0 + dt.timedelta(seconds=i) for i in range(n)],
                       pa.timestamp("us")),
        "v": pa.array(vals, pa.float64(), from_pandas=True),
    })
    out = ewma(ray.data.from_arrow(tbl).repartition(3), "u", "ts", "v",
               alpha=0.3).take_all()
    out.sort(key=lambda r: r["ts"])
    got = np.array([np.nan if r["v_ewma"] is None else r["v_ewma"] for r in out])
    exp = np.full(n, np.nan)
    prev = None
    for i, x in enumerate(vals):
        if np.isnan(x):
            if prev is not None:
                exp[i] = prev
            continue
        prev = x if prev is None else 0.3 * x + 0.7 * prev
        exp[i] = prev
    assert (np.isnan(got) == np.isnan(exp)).all()
    m = ~np.isnan(exp)
    assert np.allclose(got[m], exp[m], rtol=0, atol=1e-10)


def test_pmi_collocations_hand_case():
    import math

    from audio_feature_extraction_ray.stages.text import pmi_collocations

    # "a b" always collocated (2 of 4 bigrams); "c d" independent-ish
    texts = ["a b c", "a b d", "x", ""]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)})).repartition(2)
    out = {r["gram"]: r for r in pmi_collocations(ds, min_count=2, k=10).take_all()}
    # unigrams: a2 b2 c1 d1 x1 -> N1=7; bigrams: 'a b'x2,'b c','b d' -> N2=4
    assert set(out) == {"a b"}  # only gram with count >= 2 and both words >= 2
    exp = math.log2((2 / 4) / ((2 / 7) * (2 / 7)))
    assert abs(out["a b"]["pmi"] - exp) < 1e-12
    assert out["a b"]["n"] == 2


def test_pca_matches_serial_numpy():
    import numpy as np

    from audio_feature_extraction_ray.stages.decomp import pca_fit, pca_transform

    rng = np.random.default_rng(11)
    d, n, k = 8, 400, 3
    # anisotropic data so the spectrum is well separated
    basis = rng.normal(size=(d, d))
    x = rng.normal(size=(n, d)) * np.array([10, 5, 3, 1, 1, 1, 1, 1]) @ basis
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(x.tolist(), pa.list_(pa.float64())),
    })).repartition(5)
    mu, comps, var = pca_fit(ds, "embedding", d=d, k=k)
    # serial reference
    mu_s = x.mean(axis=0)
    cov_s = (x - mu_s).T @ (x - mu_s) / n
    w, v = np.linalg.eigh(cov_s)
    idx = np.argsort(-w)[:k]
    comps_s = v[:, idx].T
    flip = comps_s[np.arange(k), np.argmax(np.abs(comps_s), axis=1)] < 0
    comps_s[flip] *= -1
    assert np.allclose(mu, mu_s, atol=1e-9)
    assert np.allclose(comps, comps_s, atol=1e-8)
    assert np.allclose(var, w[idx], atol=1e-8)
    # projection parity + reconstruction sanity
    out = pca_transform(ds, "embedding", mu, comps, id_col="vec_id").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    scores_s = (x - mu_s) @ comps_s.T
    got = out[["pc1", "pc2", "pc3"]].to_numpy()
    assert np.allclose(got, scores_s, atol=1e-8)
    # determinism: second fit identical bitwise
    mu2, comps2, var2 = pca_fit(ds, "embedding", d=d, k=k)
    assert (mu == mu2).all() and (comps == comps2).all() and (var == var2).all()


def test_kmeans_matches_serial_lloyd():
    import numpy as np

    from audio_feature_extraction_ray.stages.decomp import kmeans

    rng = np.random.default_rng(5)
    k, d = 3, 4
    centers = np.array([[0, 0, 0, 0], [10, 10, 0, 0], [0, 0, 10, 10]], dtype=float)
    x = np.concatenate([c + rng.normal(scale=0.5, size=(50, d)) for c in centers])
    ids = np.arange(len(x))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(x.tolist(), pa.list_(pa.float64())),
    })).repartition(4)
    assign, cent = kmeans(ds, "embedding", "vec_id", k=k, iters=5)
    got = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    # serial Lloyd, same init (k smallest ids) and tie rule
    c = x[:k].copy()
    for _ in range(5):
        d2 = ((x * x).sum(1)[:, None] - 2 * x @ c.T + (c * c).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        for j in range(k):
            if (a == j).any():
                c[j] = x[a == j].mean(axis=0)
    d2 = ((x * x).sum(1)[:, None] - 2 * x @ c.T + (c * c).sum(1)[None, :])
    a = np.argmin(d2, axis=1)
    assert (got["cluster"].to_numpy() == a).all()
    assert np.allclose(cent, c, atol=1e-9)
    # the three true blobs are separated
    assert len(set(got["cluster"][:50])) == 1
    assert len(set(got["cluster"][50:100])) == 1
    assert len(set(got["cluster"][100:])) == 1


def test_group_share_and_winsorize_hand_cases():
    from audio_feature_extraction_ray.stages.scaling import group_share, winsorize

    tbl = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"]),
        "v": pa.array([1.0, 3.0, 6.0, 0.0, 0.0]),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    shares = sorted((r["g"], r["v"], r["v_share"]) for r in
                    group_share(ds, "g", ["v"]).take_all())
    assert shares == [("a", 1.0, 0.1), ("a", 3.0, 0.3), ("a", 6.0, 0.6),
                      ("b", 0.0, None), ("b", 0.0, None)]  # zero-sum -> null

    # winsorize at [0.25, 0.75]: group of 1..5 -> bounds 2.0 / 4.0
    tbl2 = pa.table({
        "g": pa.array(["a"] * 5),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    out = sorted(r["v_wins"] for r in winsorize(
        ray.data.from_arrow(tbl2).repartition(2), "g", "v",
        lo=0.25, hi=0.75).take_all())
    assert out == [2.0, 2.0, 3.0, 4.0, 4.0]


def test_cooccurrence_lift_hand_case():
    from audio_feature_extraction_ray.stages.aggregates import cooccurrence_lift

    # baskets: 1:{x,y} 2:{x,y} 3:{x} 4:{z} -> N=4, cx=3, cy=2, cz=1
    tbl = pa.table({
        "b": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),  # dup (1,x) row
        "i": pa.array(["x", "y", "x", "x", "y", "x", "z"]),
    })
    out = {(r["item_a"], r["item_b"]): r for r in cooccurrence_lift(
        ray.data.from_arrow(tbl).repartition(3), "b", "i").take_all()}
    assert set(out) == {("x", "y")}
    assert out[("x", "y")]["n_ab"] == 2
    assert abs(out[("x", "y")]["lift"] - (2 * 4 / (3 * 2))) < 1e-12


def test_cooccurrence_lift_distributed_marginal_join_and_support():
    """Marginals above broadcast_threshold must route through
    bucket_hash_join and produce the identical pair table; min_support
    prunes consistently (pairs by n_ab, marginals by n_x)."""
    import numpy as np

    from audio_feature_extraction_ray.stages.aggregates import cooccurrence_lift

    rng = np.random.default_rng(7)
    n = 1200
    b = rng.integers(0, 120, n)
    i = np.array([f"it{v}" for v in rng.integers(0, 40, n)])
    tbl = pa.table({"b": pa.array(b, pa.int64()), "i": pa.array(i)})
    ds = ray.data.from_arrow(tbl).repartition(4)

    def key(rows):
        return {(r["item_a"], r["item_b"]): (r["n_ab"], round(r["lift"], 9))
                for r in rows}

    via_bcast = key(cooccurrence_lift(ds, "b", "i").take_all())
    # 40 distinct items >> threshold 10 -> bucket_hash_join path
    via_shuffle = key(cooccurrence_lift(ds, "b", "i",
                                        broadcast_threshold=10).take_all())
    assert via_bcast == via_shuffle and len(via_bcast) > 100

    pruned = key(cooccurrence_lift(ds, "b", "i", min_support=5).take_all())
    assert pruned == {k: v for k, v in via_bcast.items() if v[0] >= 5}
    # and the same pruning via the distributed join path
    pruned2 = key(cooccurrence_lift(ds, "b", "i", min_support=5,
                                    broadcast_threshold=1).take_all())
    assert pruned2 == pruned


def test_augment_stage_determinism_and_semantics():
    import numpy as np

    from audio_feature_extraction_ray.functions import codecs
    from audio_feature_extraction_ray.sources.images import synth_images
    from audio_feature_extraction_ray.stages.augment import (augment_pixels,
                                                             augment_stage,
                                                             _rng_for)

    ds = synth_images(8, seed=42)
    out1 = augment_stage(ds, n_augs=2, batch_size=16).to_pandas() \
        .sort_values(["image_id", "aug_id"]).reset_index(drop=True)
    out2 = augment_stage(synth_images(8, seed=42), n_augs=2,
                         batch_size=16).to_pandas() \
        .sort_values(["image_id", "aug_id"]).reset_index(drop=True)
    assert out1.equals(out2)  # byte-identical re-run
    ok = out1[out1["status"] == "ok"]
    n_inputs = synth_images(8, seed=42).count()
    bad = out1[out1["status"] != "ok"]
    assert len(ok) == 2 * (n_inputs - len(bad))
    # dims: crop fraction within [0.8, 1.0] of the decoded size
    assert (ok["crop_frac"].between(0.8, 1.0)).all()
    assert (ok["gain"].between(0.9, 1.1)).all()
    # augmented bytes decode and match the independently recomputed pixels
    row = ok.iloc[0]
    src = ds.filter(expr=f"image_id == '{row['image_id']}'").take_all()[0]
    px = codecs.decode_image(src["bytes"])
    ap, params = augment_pixels(px, _rng_for(row["image_id"], int(row["aug_id"]),
                                             "aug-v1"))
    got = codecs.decode_image(out1[(out1["image_id"] == row["image_id"])
                                   & (out1["aug_id"] == row["aug_id"])]
                              .iloc[0]["bytes"])
    assert got.shape == ap.shape
    assert np.array_equal(got, ap)  # png is lossless
    assert params["flipped"] == row["flipped"]
    # corrupt input -> status row, never a raise
    import pyarrow as _pa
    bad_ds = ray.data.from_arrow(_pa.table({
        "image_id": _pa.array(["x"]),
        "bytes": _pa.array([b"not an image"], _pa.binary()),
    }))
    rows = augment_stage(bad_ds, n_augs=3).take_all()
    assert len(rows) == 1 and rows[0]["status"].startswith("decode_error")
    assert rows[0]["aug_id"] == -1


def test_quantize_dequantize_roundtrip_quality():
    import numpy as np

    from audio_feature_extraction_ray.stages.similarity import (
        dequantize_embeddings, quantize_embeddings)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 16)) * rng.uniform(0.1, 50, size=(40, 1))
    x[7] = 0.0  # all-zero vector
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array(x.tolist(), pa.list_(pa.float64())),
    })).repartition(3)
    q = quantize_embeddings(ds).materialize()
    scales = {r["vec_id"]: r["scale"] for r in q.take_all()}
    dq = dequantize_embeddings(q).to_pandas().sort_values("vec_id")
    recon = np.stack(dq["embedding"].to_list())
    err = np.abs(recon - x)
    for i in range(40):
        assert err[i].max() <= scales[i] / 2 + 1e-12
    assert scales[7] == 0.0 and (recon[7] == 0.0).all()
    # cosine preservation on non-zero rows
    m = np.ones(40, bool); m[7] = False
    cos = (recon[m] * x[m]).sum(1) / (
        np.linalg.norm(recon[m], axis=1) * np.linalg.norm(x[m], axis=1))
    assert cos.min() > 0.999
