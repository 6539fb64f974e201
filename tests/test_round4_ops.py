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
