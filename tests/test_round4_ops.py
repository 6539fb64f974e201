"""Round-4 second-batch operators: SemDeDup, distributed BPE-merge
training, greedy sequence packing, domain-mixture rebalancing."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _synth_embeddings(n=400, d=16, n_dupe=40, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    # plant near-duplicates: rows i and i+n_dupe nearly parallel
    for i in range(n_dupe):
        base[i + n_dupe] = base[i] * rng.uniform(0.5, 2.0) + rng.normal(scale=1e-3, size=d)
    ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.astype(np.float32) for row in base],
                              pa.list_(pa.float32())),
    })


def test_semantic_dedup_matches_serial_rule():
    from audio_feature_extraction_ray.stages.decomp import kmeans
    from audio_feature_extraction_ray.stages.dedup import semantic_dedup

    t = _synth_embeddings()
    ds = ray.data.from_arrow(t).repartition(7)
    out = semantic_dedup(ds, "vec_id", "embedding", k=4, iters=4,
                         threshold=0.95, chunk=37).take_all()
    assert len(out) == t.num_rows
    got = {r["vec_id"]: r for r in out}

    # serial replay of the drop rule given the SAME centroids
    _, cent = kmeans(ray.data.from_arrow(t), "embedding", "vec_id", k=4, iters=4)
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    d2 = ((m * m).sum(1)[:, None] - 2.0 * m @ cent.T + (cent * cent).sum(1)[None, :])
    a = np.argmin(d2, axis=1)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    for c in np.unique(a):
        idx = np.flatnonzero(a == c)  # already id-ascending
        sims = mn[idx] @ mn[idx].T
        for j in range(len(idx)):
            prior = sims[j, :j]
            keep = not (len(prior) and prior.max() >= 0.95)
            r = got[int(idx[j])]
            assert r["cluster"] == c
            assert r["keep"] == keep, (idx[j], prior.max() if len(prior) else None)
            if len(prior):
                assert abs(r["max_prior_sim"] - round(float(prior.max()), 6)) <= 1e-9
            else:
                assert r["max_prior_sim"] is None or np.isnan(r["max_prior_sim"])
    # planted near-dupes must actually be dropped (sanity that τ bites)
    dropped = {v for v, r in got.items() if not r["keep"]}
    assert len(dropped) >= 30


def test_semantic_dedup_partition_invariance():
    from audio_feature_extraction_ray.stages.dedup import semantic_dedup

    t = _synth_embeddings(n=200, n_dupe=20, seed=11)
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        rows = semantic_dedup(ds, "vec_id", "embedding", k=3, iters=3,
                              threshold=0.9).take_all()
        outs.append(sorted((r["vec_id"], r["cluster"], r["keep"]) for r in rows))
    assert outs[0] == outs[1]


def _serial_bpe(texts, n_merges, min_pair_count=2, eow="</w>"):
    """Textbook Sennrich BPE over word frequencies, same tie-break."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in (t or "").split():
            wf[w] += 1
    vocab = {w: list(w) + [eow] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc_ = Counter()
        for w, syms in vocab.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += f
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_pair_count:
            break
        merges.append((rank, l, r, l + r, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_serial():
    from audio_feature_extraction_ray.stages.text import bpe_train

    rng = np.random.default_rng(3)
    words = ["banana", "bandana", "cabana", "analog", "annal", "canal",
             "llama", "lane", "nab", "ban", "anna", "baal"]
    texts = [" ".join(rng.choice(words, rng.integers(3, 12))) for _ in range(150)]
    texts += ["", "   ", "banana banana banana"]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(5)
    got = bpe_train(ds, "text", n_merges=15, min_pair_count=2).take_all()
    want = _serial_bpe(texts, 15, 2)
    got_t = [(r["rank"], r["left"], r["right"], r["merged"], r["n"]) for r in got]
    assert got_t == want


def test_bpe_train_early_stop_and_empty():
    from audio_feature_extraction_ray.stages.text import bpe_train

    ds = ray.data.from_items([{"text": "ab ab"}])
    got = bpe_train(ds, "text", n_merges=50, min_pair_count=2).take_all()
    want = _serial_bpe(["ab ab"], 50, 2)
    assert [(r["rank"], r["left"], r["right"], r["merged"], r["n"]) for r in got] == want
    empty = ray.data.from_items([{"text": ""}])
    assert bpe_train(empty, "text", n_merges=3).take_all() == []


def test_pack_sequences_greedy_edges():
    from audio_feature_extraction_ray.stages.text import pack_sequences

    # one partition so the greedy order is the id order
    t = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "n_tok": pa.array([100, 100, 100, 500, 0, 50, 300, 10], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = sorted(
        pack_sequences(ds, "doc_id", "n_tok", budget=256, n_partitions=1).take_all(),
        key=lambda r: r["doc_id"],
    )
    seqs = [r["pack_id"] & 0xFFFFFFFF for r in out]
    # 100+100 | 100 | 500 alone (oversize) | 0+50 | 300 alone (oversize) | 10
    assert seqs == [0, 0, 1, 2, 3, 3, 4, 5]
    assert [r["pack_pos"] for r in out] == [0, 1, 0, 0, 0, 1, 0, 0]
    assert [r["pack_fill"] for r in out] == [100, 200, 100, 500, 0, 50, 300, 10]
    assert [r["oversize"] for r in out] == [False, False, False, True,
                                            False, False, True, False]


def test_pack_sequences_partition_invariance():
    from audio_feature_extraction_ray.stages.text import pack_sequences

    rng = np.random.default_rng(5)
    t = pa.table({
        "doc_id": pa.array(np.arange(500, dtype=np.int64)),
        "n_tok": pa.array(rng.integers(0, 400, 500), pa.int64()),
    })
    outs = []
    for parts in (1, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        rows = pack_sequences(ds, "doc_id", "n_tok", budget=256).take_all()
        outs.append(sorted((r["doc_id"], r["pack_id"], r["pack_pos"], r["pack_fill"])
                           for r in rows))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 500


def test_mix_domains_budgets_and_drop():
    import hashlib

    from audio_feature_extraction_ray.stages.sampling import mix_domains

    rows = []
    for d, n in (("web", 300), ("wiki", 100), ("junk", 50)):
        for i in range(n):
            rows.append({"id": f"{d}-{i}", "dom": d, "w": 10})
    ds = ray.data.from_items(rows).repartition(6)
    out = mix_domains(ds, "dom", "w", key_cols=["id"],
                      budgets={"web": 1000, "wiki": 100_000}).take_all()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["dom"], []).append(r)
    # junk has no budget: dropped entirely
    assert "junk" not in by_dom
    # wiki budget exceeds its total: kept whole, k = 16^4
    assert len(by_dom["wiki"]) == 100
    assert all(r["mix_k"] == 65536 for r in by_dom["wiki"])
    # web: k = 1000*65536 // 3000, serial md5 replay must agree exactly
    k = 1000 * 65536 // 3000
    want = {f"web-{i}" for i in range(300)
            if int(hashlib.md5(f"web-{i}".encode()).hexdigest()[:4], 16) < k}
    assert {r["id"] for r in by_dom["web"]} == want
    assert all(r["mix_k"] == k for r in by_dom["web"])


def test_mix_domains_equalize_is_cluster_invariant():
    from audio_feature_extraction_ray.stages.sampling import mix_domains

    rows = [{"id": i, "dom": f"d{i % 3}", "w": 1 + (i % 7)} for i in range(400)]
    outs = []
    for parts in (2, 17):
        ds = ray.data.from_items(rows).repartition(parts)
        got = mix_domains(ds, "dom", "w", key_cols=["id"]).take_all()
        outs.append(sorted((r["id"], r["mix_k"]) for r in got))
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_bpe_encode_matches_training_end_state():
    from audio_feature_extraction_ray.stages.text import bpe_encode, bpe_train

    rng = np.random.default_rng(9)
    words = ["banana", "bandana", "cabana", "analog", "canal", "llama",
             "lane", "nab", "ban", "anna"]
    texts = [" ".join(rng.choice(words, rng.integers(2, 9))) for _ in range(120)]
    ds = ray.data.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(texts)]).repartition(4)
    merges_ds = bpe_train(ds, "text", n_merges=12, min_pair_count=2)
    enc = bpe_encode(ds, merges_ds, "text", concurrency=(1, 2)).take_all()
    assert len(enc) == len(texts)

    # serial end state: apply the same merges in rank order to every word
    merges = [(r["left"], r["right"])
              for r in sorted(merges_ds.take_all(), key=lambda r: r["rank"])]

    def serial_encode(w):
        syms = list(w) + ["</w>"]
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    by_id = {r["doc_id"]: r for r in enc}
    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in serial_encode(w)]
        assert by_id[i]["bpe_tokens"] == want
        assert by_id[i]["n_bpe_tokens"] == len(want)
    # merges actually fired (compression happened somewhere)
    assert any(len(r["bpe_tokens"]) > 0 and
               any(len(tok) > 1 and tok != "</w>" for tok in r["bpe_tokens"])
               for r in enc)


def test_unigram_lm_scores_oov_and_cap():
    from audio_feature_extraction_ray.stages.text import unigram_lm_scores

    texts = ["aa aa aa bb", "bb cc", "", "   ", "zz zz"]
    ds = ray.data.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(texts)]).repartition(3)
    # full model: counts aa=3 bb=2 cc=1 zz=2, total 8
    out = {r["doc_id"]: r for r in unigram_lm_scores(ds, "doc_id").take_all()}
    t = 8.0
    exp0 = round((3 * np.log(3 / t) + np.log(2 / t)) / 4, 6)
    assert abs(out[0]["avg_logprob"] - exp0) < 1e-9 and out[0]["n_tokens"] == 4
    assert out[2]["avg_logprob"] is None or np.isnan(out[2]["avg_logprob"])
    assert out[2]["n_tokens"] == 0 and out[3]["n_tokens"] == 0

    # capped model: top-2 vocab by (count desc, token asc) = aa, bb|zz tie →
    # bb (lex); cc and zz fall to OOV pseudo-count 0.5
    capped = {r["doc_id"]: r
              for r in unigram_lm_scores(ds, "doc_id", max_vocab=2).take_all()}
    oov = np.log(0.5 / t)
    exp1 = round((np.log(2 / t) + oov) / 2, 6)
    assert abs(capped[1]["avg_logprob"] - exp1) < 1e-9
    exp4 = round(oov, 6)
    assert abs(capped[4]["avg_logprob"] - exp4) < 1e-9


def test_concat_chunk_spans_offsets():
    from audio_feature_extraction_ray.stages.text import concat_chunk_spans

    t = pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "n_tok": pa.array([100, 200, 0, 300, 50], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    out = sorted(concat_chunk_spans(ds, "doc_id", "n_tok", budget=256,
                                    n_partitions=1).take_all(),
                 key=lambda r: r["doc_id"])
    # zero-token doc 2 dropped; concat offsets 0,100,300,600
    assert [r["doc_id"] for r in out] == [0, 1, 3, 4]
    assert [r["start_off"] for r in out] == [0, 100, 300, 600]
    assert [r["chunk_first"] for r in out] == [0, 0, 1, 2]
    # doc 1 spans 100..299 -> chunks 0..1 (splits across the boundary)
    assert [r["chunk_last"] for r in out] == [0, 1, 2, 2]


def test_leakage_safe_split_groups_stay_together():
    from audio_feature_extraction_ray.stages.sampling import leakage_safe_split

    rows = [{"id": i, "fp": f"g{i % 37}"} for i in range(600)]
    ds = ray.data.from_items(rows).repartition(9)
    out = leakage_safe_split(ds, "fp", "id", {"train": 0.5, "val": 0.25}).take_all()
    assert len(out) == 600
    by_fp = {}
    for r in out:
        by_fp.setdefault(r["fp"], set()).add((r["split"], r["group_rep"]))
    # one (split, rep) per group, rep == min id of the group
    for fp, combos in by_fp.items():
        assert len(combos) == 1
        split, rep = next(iter(combos))
        assert rep == min(r["id"] for r in rows if r["fp"] == fp)
    # all three labels appear across 37 groups with these fractions
    assert {s for r in out for s in [r["split"]]} == {"train", "val", "rest"}


def test_json_extract_fields_null_semantics():
    from audio_feature_extraction_ray.stages.reshape import json_extract_fields

    rows = [
        {"i": 0, "j": '{"k": 5, "s": "x"}'},
        {"i": 1, "j": '{"k": null}'},
        {"i": 2, "j": '{}'},
        {"i": 3, "j": 'not json'},
        {"i": 4, "j": None},
        {"i": 5, "j": '{"k": "abc"}'},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    out = sorted(json_extract_fields(
        ds, "j", {"k": ("$.k", pa.int64()), "s": ("$.s", pa.string())}
    ).take_all(), key=lambda r: r["i"])
    # i=5: well-formed JSON, type-mismatched value -> NULL, never a crash
    assert [r["k"] for r in out] == [5, None, None, None, None, None]
    assert [r["s"] for r in out] == ["x", None, None, None, None, None]
    assert "j" not in out[0]
    kept = json_extract_fields(ds, "j", {"k": ("$.k", pa.int64())},
                               drop_json=False).take_all()
    assert "j" in kept[0]


def test_pagerank_matches_serial_with_dangling():
    from audio_feature_extraction_ray.stages.graph import pagerank

    # a -> b -> c, c dangling; d -> b
    E = [("a", "b"), ("b", "c"), ("d", "b")]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in E]).repartition(2)
    out = {r["node"]: r["rank"] for r in pagerank(ds, iters=4, digits=12).take_all()}

    nodes = sorted({x for e in E for x in e})
    n = len(nodes)
    deg = {u: sum(1 for s, _ in E if s == u) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(4):
        dangling = sum(r[u] for u in nodes if deg[u] == 0)
        nxt = {}
        for v in nodes:
            contrib = sum(r[s] / deg[s] for s, d in E if d == v)
            nxt[v] = (1 - 0.85) / n + 0.85 * (contrib + dangling / n)
        r = nxt
    for u in nodes:
        assert abs(out[u] - round(r[u], 12)) < 1e-10, (u, out[u], r[u])
    # ranks form a probability distribution (dangling mass redistributed)
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_empty_and_threshold():
    import pytest as _pytest

    from audio_feature_extraction_ray.stages.graph import pagerank

    empty = ray.data.from_items([]).map_batches(
        lambda t: t, batch_format="pyarrow")
    # empty edge list -> empty result (build a typed empty edges table)
    e = ray.data.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                      "dst": pa.array([], pa.string())}))
    assert pagerank(e).take_all() == []
    # above the threshold the sharded route runs instead of raising
    big = ray.data.from_items([{"src": f"n{i}", "dst": f"n{i+1}"} for i in range(8)])
    rows = pagerank(big, iters=1, node_threshold=5).take_all()
    assert len(rows) == 9
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6


def test_triangle_count_known_graphs():
    from audio_feature_extraction_ray.stages.graph import triangle_count

    def run(edges):
        ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges]).repartition(2)
        rows = triangle_count(ds).take_all()
        assert len(rows) == 1 and rows[0]["truncated"] is False
        return rows[0]["n_triangles"]

    # K4 has 4 triangles; duplicate/reversed/self edges must not change it
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert run(k4) == 4
    assert run(k4 + [("b", "a"), ("c", "c"), ("a", "b")]) == 4
    # a 5-cycle has none; adding one chord makes exactly one
    c5 = [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("5", "1")]
    assert run(c5) == 0
    assert run(c5 + [("1", "3")]) == 1


def test_triangle_count_random_matches_bruteforce():
    from itertools import combinations

    from audio_feature_extraction_ray.stages.graph import triangle_count

    rng = np.random.default_rng(13)
    nodes = [f"n{i}" for i in range(24)]
    edges = {tuple(sorted(rng.choice(nodes, 2, replace=False))) for _ in range(90)}
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = triangle_count(ds).take_all()[0]["n_triangles"]
    es = set(edges)
    want = sum(1 for a, b, c in combinations(sorted(nodes), 3)
               if tuple(sorted((a, b))) in es and tuple(sorted((b, c))) in es
               and tuple(sorted((a, c))) in es)
    assert got == want


def test_local_clustering_known_graph():
    from audio_feature_extraction_ray.stages.graph import local_clustering

    # K4 plus a pendant node p attached to a
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("a", "p")]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(2)
    out = {r["node"]: r for r in local_clustering(ds).take_all()}
    # b, c, d: degree 3, all 3 neighbor pairs connected -> cc 1.0
    for v in "bcd":
        assert out[v]["degree"] == 3 and out[v]["triangles"] == 3
        assert out[v]["cc"] == 1.0
    # a: degree 4, triangles 3 (with bcd pairs), cc = 2*3/(4*3) = 0.5
    assert out["a"]["degree"] == 4 and out["a"]["triangles"] == 3
    assert out["a"]["cc"] == 0.5
    # pendant: degree 1 -> cc 0
    assert out["p"]["degree"] == 1 and out["p"]["triangles"] == 0
    assert out["p"]["cc"] == 0.0


def test_read_table_any_formats_roundtrip(tmp_path):
    import json as _json

    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.sources.tables import read_table_any

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    df = t.to_pandas()
    # jsonl + csv copies of the same table
    with open(tmp_path / "documents.json", "w") as f:
        for r in df.to_dict("records"):
            f.write(_json.dumps(r) + "\n")
    df.to_csv(tmp_path / "documents.csv", index=False)

    want = df[["doc_id", "source"]].sort_values("doc_id").reset_index(drop=True)
    for fmt in ("json", "csv"):
        got = read_table_any(str(tmp_path), "documents",
                             columns=["doc_id", "source"], file_format=fmt) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want), fmt
    # parquet path delegates to the pruned reader
    got = read_table_any("/root/testdata/sf0.001", "documents",
                         columns=["doc_id", "source"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_table_any(str(tmp_path), "documents", file_format="xml")


def test_rolling_corr_matches_pandas():
    import pandas as pd

    from audio_feature_extraction_ray.stages.window import rolling_corr

    rng = np.random.default_rng(21)
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 7, n), pa.int64()),
        "ts": pa.array((np.sort(rng.integers(0, 10**9, n)) * 1000).astype("datetime64[us]")),
        "value": pa.array(np.where(rng.random(n) < 0.1, np.nan,
                                   rng.normal(size=n)), pa.float64(),
                          from_pandas=True),
    })
    out = rolling_corr(ray.data.from_arrow(t).repartition(5),
                       "user_id", "ts", x="ts", y="value", k=8).take_all()
    got = {r["event_id"]: r["ts_value_rollcorr_8"] for r in out}

    df = t.to_pandas()
    for uid, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        x = g["ts"].astype("int64").astype("float64")
        y = g["value"]
        want = x.rolling(8, min_periods=2).corr(y)
        for eid, w in zip(g["event_id"], want):
            gv = got[eid]
            if pd.isna(w) or np.isinf(w):
                # pandas emits inf/nan for degenerate windows; ours is NULL
                assert gv is None or np.isnan(gv), (eid, w, gv)
            else:
                assert gv is not None and abs(gv - w) < 1e-9, (eid, w, gv)


def test_bpe_train_separator_char_in_tokens():
    from audio_feature_extraction_ray.stages.text import bpe_train

    # tokens containing \x1f (web scrapes carry arbitrary control chars)
    texts = ["a\x1fb a\x1fb a\x1fb xy xy xy xy"]
    ds = ray.data.from_items([{"text": t} for t in texts])
    got = bpe_train(ds, "text", n_merges=4, min_pair_count=2).take_all()
    want = _serial_bpe(texts, 4, 2)
    assert [(r["rank"], r["left"], r["right"], r["merged"], r["n"]) for r in got] == want
    assert any("\x1f" in r["left"] + r["right"] for r in got) or len(want) > 0


def test_triangle_count_separator_labels():
    from audio_feature_extraction_ray.stages.graph import local_clustering, triangle_count

    # labels containing the old separator byte and colons: the injective
    # length-prefixed pair key must not collide or crash
    edges = [("x\x1f", "y"), ("y", "\x1fz"), ("x\x1f", "\x1fz"),
             ("a:1", "a"), ("a", ":1a"), ("a:1", ":1a")]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    rows = triangle_count(ds).take_all()
    assert rows[0]["n_triangles"] == 2
    cc = {r["node"]: r for r in local_clustering(ds).take_all()}
    assert all(cc[n]["triangles"] == 1 for n in
               ["x\x1f", "y", "\x1fz", "a:1", "a", ":1a"])


def test_rolling_regression_matches_numpy_ols():
    from audio_feature_extraction_ray.stages.window import rolling_regression

    rng = np.random.default_rng(31)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
        "ts": pa.array((np.sort(rng.integers(0, 10**9, n)) * 1000).astype("datetime64[us]")),
        "value": pa.array(rng.normal(size=n) * 50 + 100, pa.float64()),
    })
    out = rolling_regression(ray.data.from_arrow(t).repartition(4),
                             "user_id", "ts", x="ts", y="value", k=6).take_all()
    got = {r["event_id"]: (r["slope"], r["intercept"]) for r in out}

    df = t.to_pandas()
    for _, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        x = g["ts"].astype("int64").to_numpy().astype(np.float64)
        y = g["value"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(ids)):
            lo = max(0, i - 5)
            xs, ys = x[lo:i + 1], y[lo:i + 1]
            gs, gi = got[ids[i]]
            if len(xs) < 2 or np.ptp(xs) == 0:
                assert gs is None or np.isnan(gs)
                continue
            slope, intercept = np.polyfit(xs, ys, 1)
            assert abs(gs - slope) < 1e-9 * max(1, abs(slope))
            assert abs(gi - intercept) < 1e-6 * max(1, abs(intercept))


def test_group_vs_rest_ttest_matches_scipy_formula():
    from audio_feature_extraction_ray.stages.aggregates import group_vs_rest_ttest

    rng = np.random.default_rng(41)
    vals_a = rng.normal(10.0, 2.0, 200)
    vals_b = rng.normal(12.0, 3.0, 150)
    vals_c = np.array([5.0])  # n=1 group: t must be NULL
    rows = ([{"g": "a", "v": float(x)} for x in vals_a]
            + [{"g": "b", "v": float(x)} for x in vals_b]
            + [{"g": "c", "v": float(x)} for x in vals_c])
    ds = ray.data.from_items(rows).repartition(5)
    out = {r["g"]: r for r in group_vs_rest_ttest(ds, "g", "v").take_all()}

    def welch(x, y):
        n1, n2 = len(x), len(y)
        v1, v2 = x.var(ddof=1), y.var(ddof=1)
        se2 = v1 / n1 + v2 / n2
        t = (x.mean() - y.mean()) / np.sqrt(se2)
        dof = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
        return t, dof

    allv = np.concatenate([vals_a, vals_b, vals_c])
    for g, vals in (("a", vals_a), ("b", vals_b)):
        rest = np.concatenate([v for k, v in
                               (("a", vals_a), ("b", vals_b), ("c", vals_c))
                               if k != g])
        t, dof = welch(vals, rest)
        assert out[g]["n"] == len(vals)
        assert abs(out[g]["t_stat"] - round(t, 6)) < 1e-9
        assert abs(out[g]["dof"] - round(dof, 6)) < 1e-9
    assert out["c"]["t_stat"] is None or np.isnan(out["c"]["t_stat"])
    # the planted mean shift must register as significant
    assert abs(out["b"]["t_stat"]) > 5


def test_psi_detects_planted_shift():
    from audio_feature_extraction_ray.stages.aggregates import psi_by_group

    rng = np.random.default_rng(47)
    rows = []
    # group "stable": same distribution both periods -> psi ~ 0
    # group "shifted": mean jumps after the cutoff -> psi large
    for i in range(2000):
        ref = i < 1000
        ts = (1000 + i) * 1_000_000
        rows.append({"g": "stable", "v": float(rng.normal(0, 1)), "ts": ts})
        rows.append({"g": "shifted",
                     "v": float(rng.normal(0 if ref else 3, 1)), "ts": ts})
    ds = ray.data.from_items(rows).repartition(6)
    cutoff = (1000 + 1000) * 1_000_000
    out = {r["g"]: r for r in
           psi_by_group(ds, "g", "v", "ts", cutoff_us=cutoff).take_all()}
    assert out["stable"]["n_ref"] == 1000 and out["stable"]["n_cur"] == 1000
    assert out["stable"]["psi"] < 0.05
    assert out["shifted"]["psi"] > 1.0
    # partition invariance
    out2 = {r["g"]: r["psi"] for r in
            psi_by_group(ds.repartition(13), "g", "v", "ts",
                         cutoff_us=cutoff).take_all()}
    assert out2 == {g: r["psi"] for g, r in out.items()}


def test_ks_by_group_matches_scipy_style_reference():
    from audio_feature_extraction_ray.stages.aggregates import ks_by_group

    rng = np.random.default_rng(53)
    rows = []
    for i in range(1500):
        ref = i < 750
        ts = (100 + i) * 1_000_000
        rows.append({"g": "same", "v": float(rng.normal()), "ts": ts})
        rows.append({"g": "shift",
                     "v": float(rng.normal(0 if ref else 1.5)), "ts": ts})
        rows.append({"g": "tied", "v": float(rng.integers(0, 4)), "ts": ts})
    ds = ray.data.from_items(rows).repartition(7)
    cutoff = (100 + 750) * 1_000_000
    out = {r["g"]: r for r in
           ks_by_group(ds, "g", "v", "ts", cutoff_us=cutoff).take_all()}

    def serial_ks(x, y):
        allv = np.unique(np.concatenate([x, y]))
        fx = np.searchsorted(np.sort(x), allv, side="right") / len(x)
        fy = np.searchsorted(np.sort(y), allv, side="right") / len(y)
        return np.abs(fx - fy).max()

    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], ([], []))[0 if r["ts"] < cutoff else 1].append(r["v"])
    for g, (xr, xc) in by_g.items():
        want = round(serial_ks(np.asarray(xr), np.asarray(xc)), 6)
        assert abs(out[g]["ks_d"] - want) < 1e-9, (g, out[g]["ks_d"], want)
        assert out[g]["n_ref"] == len(xr) and out[g]["n_cur"] == len(xc)
    assert out["shift"]["ks_d"] > 0.4 and out["same"]["ks_d"] < 0.1


def test_pagerank_sharded_route_matches_broadcast():
    from audio_feature_extraction_ray.stages.graph import pagerank

    rng = np.random.default_rng(61)
    edges = [{"src": f"n{rng.integers(0, 16)}", "dst": f"n{rng.integers(0, 16)}"}
             for _ in range(60)]
    edges = [e for e in edges if e["src"] != e["dst"]]
    ds = ray.data.from_items(edges).repartition(4)
    broadcast = {r["node"]: r["rank"]
                 for r in pagerank(ds, iters=2, digits=12).take_all()}
    sharded = {r["node"]: r["rank"]
               for r in pagerank(ds, iters=2, digits=12,
                                 node_threshold=5).take_all()}
    assert set(broadcast) == set(sharded)
    for k in broadcast:
        assert abs(broadcast[k] - sharded[k]) < 2e-9, (k, broadcast[k], sharded[k])
    assert abs(sum(sharded.values()) - 1.0) < 1e-6
