"""Dedup (exact / MinHash / SimHash / embedding), text analysis, and
similarity-search operators on planted-duplicate corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from audio_feature_extraction_ray.functions.textfx import (
    detect_lang,
    md5_fingerprint,
    ngram_jaccard,
    text_quality,
)
from audio_feature_extraction_ray.stages.dedup import (
    dedup_exact,
    embedding_dedup_pairs,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)
from audio_feature_extraction_ray.stages.similarity import knn_bruteforce, knn_lsh
from audio_feature_extraction_ray.stages.text import text_features

BASE = (
    "the quick brown fox jumps over the lazy dog while data pipelines stream "
    "arrow batches through actor pools and shuffles repartition the world"
)


WORDS = BASE.split()


def _corpus():
    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        # genuinely distinct word soups (shuffled vocab, distinct salt tokens)
        soup = " ".join(rng.permutation(WORDS).tolist()) + f" salt{i} token{i * 7}"
        rows.append({"doc_id": i, "text": soup})
    # planted near-dups: 100/101 (tiny edit), 200/201 (identical)
    rows.append({"doc_id": 100, "text": BASE})
    rows.append({"doc_id": 101, "text": BASE.replace("lazy", "sleepy")})
    rows.append({"doc_id": 200, "text": "exact duplicate payload " * 8})
    rows.append({"doc_id": 201, "text": "exact duplicate payload " * 8})
    return pd.DataFrame(rows)


def test_minhash_dedup_finds_planted_pairs():
    ds = ray.data.from_pandas(_corpus())
    pairs = minhash_dedup_pairs(ds, id_col="doc_id", threshold=0.6).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (200, 201) in got
    assert (100, 101) in got
    # no false positives among the unique docs
    assert all(a >= 100 for a, _ in got)
    # exact jaccard confirms the estimate direction
    assert ngram_jaccard(BASE, BASE.replace("lazy", "sleepy")) > 0.6


def test_simhash_dedup_finds_exact_and_near():
    ds = ray.data.from_pandas(_corpus())
    pairs = simhash_dedup_pairs(ds, id_col="doc_id", max_hamming=8).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (200, 201) in got and (100, 101) in got


def test_dedup_exact_keeps_min_id():
    df = _corpus()
    df["fp"] = [md5_fingerprint(t) for t in df.text]
    ds = ray.data.from_pandas(df[["doc_id", "fp"]])
    kept = dedup_exact(ds, ["fp"], order_col="doc_id").to_pandas()
    assert len(kept) == len(df) - 1  # 200/201 collapse
    assert 201 not in set(kept.doc_id) and 200 in set(kept.doc_id)


def test_embedding_dedup_pairs():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(50, 16)).astype(np.float32)
    emb[41] = emb[40] + rng.normal(scale=1e-3, size=16).astype(np.float32)  # near-dup
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64), "embedding": list(emb)})
    ds = ray.data.from_pandas(df)
    pairs = embedding_dedup_pairs(ds, threshold=0.99).to_pandas()
    assert (40, 41) in set(zip(pairs.id_a, pairs.id_b))


def test_text_features_match_python_oracle():
    df = _corpus()
    out = (
        text_features(ray.data.from_pandas(df), concurrency=1, simhash=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    o = df.sort_values("doc_id").reset_index(drop=True)
    for i in range(len(o)):
        q = text_quality(o.text[i])
        assert out.n_chars_calc[i] == int(q["n_chars"])
        assert out.n_tokens[i] == int(q["n_tokens"])
        np.testing.assert_allclose(out.avg_token_len[i], q["avg_token_len"])
        assert out.fingerprint_md5[i] == md5_fingerprint(o.text[i])
        assert out.lang_pred[i] == detect_lang(o.text[i])
    # exact dups share fingerprints & simhash
    by_id = out.set_index("doc_id")
    assert by_id.loc[200, "fingerprint_md5"] == by_id.loc[201, "fingerprint_md5"]
    assert by_id.loc[200, "simhash"] == by_id.loc[201, "simhash"]


def test_langid_on_real_phrases():
    assert detect_lang("the cat is on the mat and it is lazy") == "en"
    assert detect_lang("der Hund ist nicht mit der Katze") == "de"
    assert detect_lang("le chat est dans la maison pour une heure") == "fr"
    assert detect_lang("el perro es un animal y la casa es grande") == "es"


def _emb_table(n=200, d=16, seed=3):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(emb.astype(np.float32))}), emb


def test_knn_bruteforce_matches_numpy():
    df, emb = _emb_table()
    qm = emb[:3]
    ds = ray.data.from_pandas(df)
    out = knn_bruteforce(ds, np.arange(3), qm, k=5, batch_size=64).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    # numpy oracle in float64
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    scores = en @ qn.T
    for qi in range(3):
        order = np.lexsort((np.arange(len(emb)), -scores[:, qi]))[:5]
        got = out[out.query_id == qi].vec_id.to_numpy()
        assert (got == order).all(), (qi, got, order)


def test_knn_lsh_recall_reasonable():
    df, emb = _emb_table(n=500)
    qm = emb[:5]
    ds = ray.data.from_pandas(df)
    exact = knn_bruteforce(ds, np.arange(5), qm, k=10).to_pandas()
    approx = knn_lsh(ray.data.from_pandas(df), np.arange(5), qm, k=10, n_planes=4).to_pandas()
    # the query vector itself (rank 1, cosine 1.0) must always be found
    for qi in range(5):
        got = approx[approx.query_id == qi]
        assert len(got) > 0 and got.iloc[0].vec_id == qi
    # recall vs exact is partial but nonzero
    inter = len(set(map(tuple, exact[["query_id", "vec_id"]].values))
                & set(map(tuple, approx[["query_id", "vec_id"]].values)))
    assert inter >= 10


def test_minhash_verified_exact_jaccard():
    ds = ray.data.from_pandas(_corpus())
    from audio_feature_extraction_ray.stages.dedup import minhash_dedup_verified

    verified = minhash_dedup_verified(
        ds, id_col="doc_id", est_threshold=0.5, exact_threshold=0.8
    ).to_pandas()
    got = set(zip(verified.id_a, verified.id_b))
    assert (200, 201) in got and (100, 101) in got
    assert (verified.exact_jaccard >= 0.8).all()
    # identical docs verify at exactly 1.0
    assert verified.set_index(["id_a", "id_b"]).loc[(200, 201), "exact_jaccard"] == 1.0

    # max_candidates below the pair count forces the distributed
    # bucket_hash_join text fetch — identical verified pairs, no truncation
    dist = minhash_dedup_verified(
        ds, id_col="doc_id", est_threshold=0.5, exact_threshold=0.8,
        max_candidates=1,
    ).to_pandas()
    key = lambda df: sorted(zip(df.id_a, df.id_b, df.exact_jaccard.round(12)))
    assert key(dist) == key(verified)


def test_knn_ivf_recall():
    from audio_feature_extraction_ray.stages.similarity import knn_bruteforce, knn_ivf

    df, emb = _emb_table(n=400, d=16, seed=9)
    qm = emb[:5]
    exact = knn_bruteforce(ray.data.from_pandas(df), np.arange(5), qm, k=10).to_pandas()
    approx = knn_ivf(ray.data.from_pandas(df), np.arange(5), qm, k=10,
                     n_centroids=8, n_probe=3).to_pandas()
    for qi in range(5):
        got = approx[approx.query_id == qi]
        assert len(got) > 0 and got.iloc[0].vec_id == qi  # self always found
    inter = len(set(map(tuple, exact[["query_id", "vec_id"]].values))
                & set(map(tuple, approx[["query_id", "vec_id"]].values)))
    assert inter >= 20  # recall >= 40% at n_probe=3/8
    # more probes -> recall can only improve
    full = knn_ivf(ray.data.from_pandas(df), np.arange(5), qm, k=10,
                   n_centroids=8, n_probe=8).to_pandas()
    inter_full = len(set(map(tuple, exact[["query_id", "vec_id"]].values))
                     & set(map(tuple, full[["query_id", "vec_id"]].values)))
    assert inter_full == 50  # probing all cells == brute force membership
