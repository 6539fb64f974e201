"""Pure text-analysis kernels: tokenization, quality, lang-ID, fingerprints,
MinHash / SimHash signatures.

These power the training-data-pipeline operators (dedup, quality scoring,
language ID) over the ``documents`` table. Everything is deterministic and
seeded — no process-salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WS_RE = re.compile(r"\s+")
# BPE-ish token splitter: words with optional leading apostrophe pieces,
# numbers, or single non-space symbols.
_BPE_RE = re.compile(r"'?[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9À-ɏ]")

_PUNCT = set(".,!?;:")

_MOD_P = np.uint64(1_000_000_007)
_SHINGLE_BASE = np.uint64(257)


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokens (python ``str.split`` semantics: trims + collapses)."""
    return text.split()


def bpe_ish_tokens(text: str) -> list[str]:
    """Regex token split approximating a BPE pre-tokenizer."""
    return _BPE_RE.findall(text)


def text_quality(text: str) -> dict[str, float]:
    """Length / punctuation / digit / case / word-length quality signals.

    Analog of the reference's per-record quality metrics (SNR, stability,
    silence-ratio gates — 00_audio_data_collection_experiment/
    audio_format_assessment.py:48-300), recast for text. All ratios are
    plain fractions so a DuckDB oracle can reproduce them exactly.
    """
    n = len(text)
    toks = ws_tokens(text)
    n_tok = len(toks)
    n_punct = sum(1 for ch in text if ch in _PUNCT)
    n_digit = sum(1 for ch in text if ch.isdigit())
    n_upper = sum(1 for ch in text if ch.isupper())
    n_alpha = sum(1 for ch in text if ch.isalpha())
    return {
        "n_chars": float(n),
        "n_tokens": float(n_tok),
        "punct_ratio": n_punct / n if n else 0.0,
        "digit_ratio": n_digit / n if n else 0.0,
        "upper_ratio": n_upper / n_alpha if n_alpha else 0.0,
        "avg_token_len": (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0,
    }


# ---------------------------------------------------------------- language ID

# Tiny per-language character/stopword profiles — an n-gram heuristic in the
# spirit of fastText-free langid. Good enough to classify the synthetic corpus.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with", "was", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "por", "que", "con"},
}


def detect_lang(text: str) -> str:
    """Stopword-overlap language heuristic; 'und' (undetermined) when no signal."""
    toks = [t.lower().strip(".,!?;:()\"'") for t in text.split()]
    if not toks:
        return "und"
    best_lang, best = "und", 0.0
    for lang, sw in _LANG_STOPWORDS.items():
        score = sum(1 for t in toks if t in sw) / len(toks)
        if score > best:
            best_lang, best = lang, score
    return best_lang if best > 0.0 else "und"


# ---------------------------------------------------------------- fingerprints

def md5_fingerprint(text: str, normalize: bool = True) -> str:
    """Exact-dedup fingerprint over the CANONICAL token-join form:
    lowercase, collapse every Unicode-whitespace run to one space, strip
    edges (``' '.join(text.lower().split())``) — so NBSP/VT/ideographic
    spacing variants of the same document hash identically. DuckDB replay:
    ``md5(array_to_string(regexp_extract_all(lower(text), <nonws>), ' '))``."""
    t = " ".join(text.lower().split()) if normalize else text
    return hashlib.md5(t.encode("utf-8")).hexdigest()


def _token_hash32(tok: str) -> int:
    """32-bit token hash from the md5 prefix — DuckDB-replayable as
    ``('0x' || substr(md5(tok), 1, 8))::UBIGINT``."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)


_FP_BASE = 1_000_003
_FP_MASK = 0x7FFFFFFFFFFFFFFF  # fold is mod 2^63


def rolling_fingerprint(text: str, window: int = 4) -> int:
    """Winnowing-style document fingerprint: min rolling hash over token
    windows. Robust to local edits outside the minimizing window; int64
    output. Token hash is the md5-prefix (not a process hash) so a DuckDB
    oracle reproduces it exactly; the window fold is a base-1000003
    polynomial mod 2^63 (closed form == the iterated masked fold).
    """
    toks = [t.lower() for t in ws_tokens(text)]
    if not toks:
        return 0
    hs = [_token_hash32(t) for t in toks]
    if len(hs) < window:
        acc = 0
        for h in hs:
            acc = (acc * _FP_BASE + h) & _FP_MASK
        return acc
    best = None
    for i in range(len(hs) - window + 1):
        acc = 0
        for h in hs[i : i + window]:
            acc = (acc * _FP_BASE + h) & _FP_MASK
        if best is None or acc < best:
            best = acc
    return int(best)


def _mulmod63(acc: np.ndarray, b: int) -> np.ndarray:
    """(acc * b) mod 2^63 without uint64 overflow, for b < 2^20 and
    acc < 2^63: split acc into 32-bit halves; the high product wraps at
    2^31 (2^31 * 2^32 = 2^63)."""
    b = np.uint64(b)
    hi = acc >> np.uint64(32)
    lo = acc & np.uint64(0xFFFFFFFF)
    return ((((hi * b) & np.uint64(0x7FFFFFFF)) << np.uint64(32)) + lo * b) \
        & np.uint64(_FP_MASK)


def _token_hash_stream(texts, token_hash_cache: dict | None = None):
    """Flat md5-prefix token-hash stream for a string column: returns
    ``(h: uint64[n_tokens], starts: int64[n_rows], counts: int64[n_rows])``
    with doc ``d`` owning ``h[starts[d] : starts[d] + counts[d]]`` —
    python ``str.split`` token semantics (empty slots dropped), lowered,
    each distinct token hashed once (cached across batches when the caller
    holds the cache). Returns None when the batch has no tokens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    flat, off, _ = _flat_tokens(texts)
    n_rows = len(off) - 1
    if n_rows == 0 or len(flat) == 0:
        return None
    lowered = pc.utf8_lower(flat)
    nonempty = pc.not_equal(pc.utf8_length(lowered), 0).to_numpy(zero_copy_only=False)
    cs = np.concatenate(([0], np.cumsum(nonempty)))
    counts = (cs[off[1:]] - cs[off[:-1]]).astype(np.int64)
    kept = lowered.filter(pa.array(nonempty))
    if len(kept) == 0:
        return None
    de = kept.dictionary_encode()
    idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = de.dictionary.to_pylist()
    cache = token_hash_cache if token_hash_cache is not None else {}
    hvals = np.empty(len(vocab), dtype=np.uint64)
    for k, tok in enumerate(vocab):
        v = cache.get(tok)
        if v is None:
            v = _token_hash32(tok)
            cache[tok] = v
        elif isinstance(v, np.ndarray):
            raise TypeError(
                "token_hash_cache holds ndarray values — it was shared with "
                "simhash_batch's byte_hash_cache; use separate dicts")
        hvals[k] = v
    h = hvals[idx]
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    return h, starts, counts


def _window_fold(h: np.ndarray, window: int) -> np.ndarray:
    """Polynomial fold of every length-``window`` run of the flat stream
    (windows crossing doc boundaries included — callers mask by segment)."""
    acc = np.zeros(len(h) - window + 1, dtype=np.uint64)
    for j in range(window):
        acc = (_mulmod63(acc, _FP_BASE) + h[j : j + len(acc)]) & np.uint64(_FP_MASK)
    return acc


def rolling_fingerprint_batch(
    texts, window: int = 4, token_hash_cache: dict | None = None
) -> np.ndarray:
    """Vectorized :func:`rolling_fingerprint` over a string column —
    bit-identical to the serial kernel, no Python loop over documents.

    Distinct lowered tokens hash once (md5, cached across batches when the
    caller holds the cache, e.g. an actor); the window fold runs as
    ``window`` full-array passes of the masked multiply-add; per-doc minima
    come from ``np.minimum.reduceat`` over the flat window array.
    """
    stream = _token_hash_stream(texts, token_hash_cache)
    out = np.zeros(len(texts), dtype=np.int64)
    if stream is None:
        return out
    h, starts, counts = stream

    # long docs (counts >= window): fold over every flat window, then mask
    # out windows crossing doc boundaries via reduceat segments
    n_flat = len(h)
    if n_flat >= window:
        acc = _window_fold(h, window)
        long_rows = np.flatnonzero(counts >= window)
        if len(long_rows):
            seg_start = starts[long_rows]
            seg_end = seg_start + counts[long_rows] - window + 1
            red_idx = np.empty(2 * len(long_rows), dtype=np.int64)
            red_idx[0::2] = seg_start
            red_idx[1::2] = seg_end
            trailing = red_idx[-1] >= len(acc)
            if trailing:
                red_idx = red_idx[:-1]
            mins = np.minimum.reduceat(acc, red_idx)[0::2]
            out[long_rows] = mins.view(np.int64)

    # short docs (1 <= counts < window): fold all their tokens — one masked
    # multiply-add pass per position (< window passes, each vectorized)
    short_rows = np.flatnonzero((counts > 0) & (counts < window))
    if len(short_rows):
        acc = np.zeros(len(short_rows), dtype=np.uint64)
        scount = counts[short_rows]
        sstart = starts[short_rows]
        for j in range(window - 1):
            active = scount > j
            acc[active] = (
                _mulmod63(acc[active], _FP_BASE) + h[sstart[active] + j]
            ) & np.uint64(_FP_MASK)
        out[short_rows] = acc.view(np.int64)
    return out


def ngram_window_hashes(text: str, window: int = 8) -> set[int]:
    """Serial reference: the set of polynomial hashes of every FULL
    length-``window`` token n-gram of a document (same token hash and fold
    as :func:`rolling_fingerprint` — md5-prefix tokens, base-1000003 mod
    2^63). Docs shorter than ``window`` tokens have no n-gram."""
    toks = [t.lower() for t in ws_tokens(text)]
    out: set[int] = set()
    for i in range(len(toks) - window + 1):
        acc = 0
        for t in toks[i : i + window]:
            acc = (acc * _FP_BASE + _token_hash32(t)) & _FP_MASK
        out.add(acc)
    return out


def contamination_batch(
    texts,
    bench_sorted: np.ndarray,
    window: int = 8,
    token_hash_cache: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized benchmark-decontamination kernel: for each document, how
    many of its full ``window``-token n-grams appear in the (sorted uint64)
    benchmark n-gram hash set — returns ``(n_hits: int64[n], contaminated:
    bool[n])``. Same hash/fold as :func:`ngram_window_hashes`; membership is
    one ``searchsorted`` over the flat window array, per-doc counts one
    ``add.reduceat`` — no Python loop over documents."""
    n_rows = len(texts)
    hits = np.zeros(n_rows, dtype=np.int64)
    stream = _token_hash_stream(texts, token_hash_cache)
    if stream is None or len(bench_sorted) == 0:
        return hits, hits > 0
    h, starts, counts = stream
    if len(h) < window:
        return hits, hits > 0
    acc = _window_fold(h, window)
    pos = np.searchsorted(bench_sorted, acc)
    pos[pos >= len(bench_sorted)] = len(bench_sorted) - 1
    member = (bench_sorted[pos] == acc).astype(np.int64)
    long_rows = np.flatnonzero(counts >= window)
    if len(long_rows):
        seg_start = starts[long_rows]
        seg_end = seg_start + counts[long_rows] - window + 1
        red_idx = np.empty(2 * len(long_rows), dtype=np.int64)
        red_idx[0::2] = seg_start
        red_idx[1::2] = seg_end
        trailing = red_idx[-1] >= len(member)
        if trailing:
            red_idx = red_idx[:-1]
        # a dropped trailing boundary (== len) makes the final reduceat
        # segment run to the array end — exactly that doc's window span
        sums = np.add.reduceat(member, red_idx)[0::2]
        hits[long_rows] = sums
    return hits, hits > 0


def repetition_signals(text: str) -> tuple[float, float]:
    """Serial reference for the Gopher-style repetition quality signals:
    ``(dup_line_frac, top_2gram_frac)`` — the fraction of non-empty lines
    that are duplicates of an earlier line, and the share of the most
    frequent token 2-gram among all 2-grams (repetitious machine-generated
    text scores high on both)."""
    lines = [ln for ln in text.split("\n") if ln.strip()]
    dup_frac = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
    toks = [t.lower() for t in ws_tokens(text)]
    if len(toks) < 2:
        return dup_frac, 0.0
    from collections import Counter

    grams = Counter(zip(toks[:-1], toks[1:]))
    return dup_frac, max(grams.values()) / (len(toks) - 1)


def repetition_batch(texts, token_hash_cache: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized :func:`repetition_signals` over a string column: returns
    ``(dup_line_frac: f64[n], top_2gram_frac: f64[n])``.

    Lines dedupe via dictionary-encoding + per-(row, line-id) uniques; the
    2-gram mode comes from an exact 64-bit pair encoding of the 32-bit token
    hashes (no collisions), one lexsort, and run-length segment maxima — no
    Python loop over documents."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n_rows = len(texts)
    dup = np.zeros(n_rows, dtype=np.float64)
    top2 = np.zeros(n_rows, dtype=np.float64)
    if n_rows == 0:
        return dup, top2

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    # ---- duplicate-line fraction
    lines = pc.split_pattern(arr, "\n")
    flat = pc.list_flatten(lines)
    loff = np.asarray(lines.offsets)
    keep = pc.not_equal(pc.utf8_length(pc.utf8_trim_whitespace(flat)), 0) \
        .to_numpy(zero_copy_only=False)
    csk = np.concatenate(([0], np.cumsum(keep)))
    n_lines = (csk[loff[1:]] - csk[loff[:-1]]).astype(np.int64)
    kept = flat.filter(pa.array(keep))
    if len(kept):
        ids = kept.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), n_lines)
        K = int(ids.max()) + 1
        n_distinct = np.zeros(n_rows, dtype=np.int64)
        urow = np.unique(rows * K + ids) // K
        np.add.at(n_distinct, urow, 1)
        has = n_lines > 0
        dup[has] = 1.0 - n_distinct[has] / n_lines[has]

    # ---- top-2-gram fraction
    stream = _token_hash_stream(texts, token_hash_cache)
    if stream is None:
        return dup, top2
    h, starts, counts = stream
    if len(h) < 2:
        return dup, top2
    pair = (h[:-1] << np.uint64(32)) | h[1:]  # exact: token hashes are 32-bit
    tok_row = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    prow = tok_row[:-1]
    valid = prow == tok_row[1:]  # pairs crossing doc boundaries are not 2-grams
    pair, prow = pair[valid], prow[valid]
    if len(pair) == 0:
        return dup, top2
    order = np.lexsort((pair, prow))
    pair, prow = pair[order], prow[order]
    run_start = np.concatenate(
        ([True], (pair[1:] != pair[:-1]) | (prow[1:] != prow[:-1]))
    )
    run_idx = np.flatnonzero(run_start)
    run_counts = np.diff(np.concatenate((run_idx, [len(pair)])))
    run_row = prow[run_idx]
    row_boundary = np.concatenate(([True], run_row[1:] != run_row[:-1]))
    row_idx = np.flatnonzero(row_boundary)
    maxima = np.maximum.reduceat(run_counts, row_idx)
    total = np.zeros(n_rows, dtype=np.int64)
    np.add.at(total, prow, 1)
    rows_present = run_row[row_idx]
    top2[rows_present] = maxima / total[rows_present]
    return dup, top2


# ---------------------------------------------------------------- shingles / MinHash

def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64 < 1e9+7), vectorized rolling hash."""
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.array([pow(int(_SHINGLE_BASE), k - 1 - j, int(_MOD_P)) for j in range(k)], dtype=np.uint64)
    # products ≤ 255 * (1e9+7) < 2^38, sums over k=5 < 2^41: safe in uint64
    hashes = (win * powers[None, :]).sum(axis=1) % _MOD_P
    return np.unique(hashes)


def make_minhash_params(num_perm: int = 64, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x4D484153]))  # "MHAS"
    a = rng.integers(1, int(_MOD_P), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MOD_P), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-long uint64 signature: min over shingles of (a*x + b) mod p."""
    if len(shingles) == 0:
        return np.full(len(a), int(_MOD_P) - 1, dtype=np.uint64)
    # a < 1e9+7, x < 1e9+7 → product < 2^61: safe in uint64
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % _MOD_P
    return vals.min(axis=1)


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification path for near-dup candidates)."""
    sa, sb = set(char_shingle_hashes(a, k).tolist()), set(char_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------- SimHash

def _token_hash64(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercased whitespace tokens (unit weights)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(t.lower() for t in ws_tokens(text)):
        h = _token_hash64(tok)
        bits = (h >> np.arange(63, -1, -1, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, 1, -1)
    bits = (acc > 0).astype(np.uint8)
    v = int(np.packbits(bits).view(">u8")[0])
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_bands(h: int, bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into band keys (16-bit chunks by default)."""
    u = h & ((1 << 64) - 1)
    width = 64 // bands
    mask = (1 << width) - 1
    return [(bi << 48) | ((u >> (bi * width)) & mask) for bi in range(bands)]


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


# ---------------------------------------------------------------- vectorized batch kernels
#
# Columnar versions of the per-doc kernels above, used on the hot paths
# (stages/text.py, stages/dedup.py). Each is pinned to the serial kernel by
# tests/test_dedup_text_similarity.py::test_text_features_match_python_oracle
# and the hypothesis property tests — identical outputs, no Python loop over
# documents.

def _flat_tokens(texts) -> tuple:
    """Whitespace-split a string column; returns (flat_tokens: pa.Array,
    offsets: np.int64[n+1], n_tokens: np.int64[n] with python ``str.split``
    counts).

    Arrow's ``utf8_split_whitespace`` emits empty strings at run boundaries
    (python ``split()`` collapses them), so token counts are counts of
    NON-empty slots.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.fill_null("")
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.values
    nonempty = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    cs = np.concatenate(([0], np.cumsum(nonempty)))
    n_tokens = cs[off[1:]] - cs[off[:-1]]
    return flat, off, n_tokens


def quality_batch(texts) -> dict[str, np.ndarray]:
    """Vectorized :func:`text_quality` over a string column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.fill_null("")
    flat, off, n_tok = _flat_tokens(texts)
    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(texts, "[.,!?;:]").to_numpy(zero_copy_only=False)
    n_digit = pc.count_substring_regex(texts, "[0-9]").to_numpy(zero_copy_only=False)
    n_upper = pc.count_substring_regex(texts, r"\p{Lu}").to_numpy(zero_copy_only=False)
    n_alpha = pc.count_substring_regex(texts, r"\p{L}").to_numpy(zero_copy_only=False)
    # sum of token lengths == length of tokens joined with '' (exact python
    # parity: counts every non-whitespace codepoint)
    tok_chars = pc.utf8_length(
        pc.binary_join(pc.utf8_split_whitespace(texts), "")
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    safe_n = np.maximum(n, 1.0)
    # a ratio with a ZERO denominator is undefined, not 0 (SQL x/NULLIF):
    # punct_ratio of '' is NULL, avg token length of a token-less doc is
    # NULL — downstream threshold comparisons then drop those docs like
    # any SQL WHERE on NULL
    return {
        "n_chars": n,
        "n_tokens": n_tok.astype(np.float64),
        "punct_ratio": np.where(n > 0, n_punct / safe_n, np.nan),
        "digit_ratio": np.where(n > 0, n_digit / safe_n, np.nan),
        "upper_ratio": np.where(n_alpha > 0, n_upper / np.maximum(n_alpha, 1), np.nan),
        "avg_token_len": np.where(n_tok > 0, tok_chars / np.maximum(n_tok, 1), np.nan),
    }


def langid_batch(texts) -> list[str]:
    """Vectorized :func:`detect_lang`: flat-token stopword membership with
    per-row segment sums (``np.add.reduceat`` over the list offsets)."""
    import pyarrow.compute as pc

    flat, off, n_tok = _flat_tokens(texts)
    n_rows = len(off) - 1
    if n_rows == 0:
        return []
    norm = pc.utf8_trim(pc.utf8_lower(flat), ".,!?;:()\"'")
    langs = list(_LANG_STOPWORDS)
    scores = np.zeros((n_rows, len(langs)), dtype=np.float64)
    row_has_tokens = off[1:] > off[:-1]
    starts = np.minimum(off[:-1], max(len(flat) - 1, 0))
    for j, lang in enumerate(langs):
        import pyarrow as pa

        hit = pc.is_in(norm, value_set=pa.array(sorted(_LANG_STOPWORDS[lang]))) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        if len(hit) == 0:
            continue
        sums = np.add.reduceat(hit, starts) * row_has_tokens
        scores[:, j] = sums / np.maximum(n_tok, 1)
    best = np.argmax(scores, axis=1)  # first-wins ties == serial kernel
    best_score = scores[np.arange(n_rows), best]
    return [langs[b] if s > 0.0 else "und" for b, s in zip(best, best_score)]


def simhash_batch(texts, byte_hash_cache: dict | None = None) -> np.ndarray:
    """Vectorized :func:`simhash64` over a string column.

    Unique (row, token) pairs are deduped columnarly; each distinct token is
    md5-hashed ONCE (and cached across batches when the caller holds the
    cache, e.g. an actor) — output is bit-identical to the serial kernel.

    ``byte_hash_cache`` maps token → 8-byte uint8 ndarray. It is NOT
    interchangeable with the ``token_hash_cache`` (token → int) the
    fingerprint/repetition kernels take — sharing one dict would silently
    corrupt signatures, so the parameter name differs and the value type is
    checked on reuse.
    """
    flat, off, _ = _flat_tokens(texts)
    n_rows = len(off) - 1
    out = np.zeros(n_rows, dtype=np.int64)
    if n_rows == 0 or len(flat) == 0:
        return out
    import pyarrow.compute as pc

    # dictionary-encode lowercased tokens: distinct tokens surface once,
    # (row, token) dedupe becomes a np.unique over integer pair keys
    de = pc.utf8_lower(flat).dictionary_encode()
    idx = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = de.dictionary
    K = len(vocab)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(off))
    ukey = np.unique(rows * K + idx)
    urow, uidx = ukey // K, ukey % K
    vocab_lens = pc.utf8_length(vocab).to_numpy(zero_copy_only=False)
    keep = vocab_lens[uidx] > 0  # python set(tokens) never holds ''
    urow, uidx = urow[keep], uidx[keep]
    if len(urow) == 0:
        return out
    cache = byte_hash_cache if byte_hash_cache is not None else {}
    vocab_list = vocab.to_pylist()
    byte_mat = np.empty((K, 8), dtype=np.uint8)
    for k, tok in enumerate(vocab_list):
        b = cache.get(tok)
        if b is None:
            b = np.frombuffer(np.uint64(_token_hash64(tok)).tobytes(), dtype=np.uint8)
            cache[tok] = b
        elif not isinstance(b, np.ndarray):
            raise TypeError(
                "byte_hash_cache holds non-ndarray values — it was shared "
                "with a token_hash_cache (int values); use separate dicts")
        byte_mat[k] = b
    bits = np.unpackbits(byte_mat[:, ::-1], axis=1)  # MSB-first = h >> (63..0)
    signs_dict = np.where(bits == 1, 1, -1).astype(np.int64)  # (K, 64)
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    np.add.at(acc, urow, signs_dict[uidx])
    outbits = (acc > 0).astype(np.uint8)
    v = np.packbits(outbits, axis=1).view(">u8").ravel().astype(np.uint64)
    return v.view(np.int64)


def minhash_signatures_batch(
    texts, a: np.ndarray, b: np.ndarray, k: int = 5
) -> np.ndarray:
    """Vectorized :func:`minhash_signature` over a whole string column:
    (n_docs, num_perm) uint64, bit-identical to the per-doc kernel.

    One flat lowered-byte buffer for the batch (short docs space-padded to
    ``k``, like the serial kernel), one ``sliding_window_view`` rolling hash
    over it, then per-permutation segment minima via ``np.minimum.reduceat``
    — no loop over documents; the only Python loop is over the ``num_perm``
    permutations (each a full-batch vector op).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.fill_null("")
    n = len(texts)
    num_perm = len(a)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    lb = pc.cast(pc.utf8_lower(texts), pa.large_binary())
    if isinstance(lb, pa.ChunkedArray):
        lb = lb.combine_chunks()
    off = np.frombuffer(lb.buffers()[1], dtype=np.int64)[lb.offset : lb.offset + n + 1] \
        if lb.buffers()[1] is not None else np.zeros(n + 1, np.int64)
    raw = (
        np.frombuffer(lb.buffers()[2], dtype=np.uint8)
        if lb.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    lens = np.diff(off)
    new_lens = np.maximum(lens, k)  # space-pad short docs (serial-kernel parity)
    new_off = np.concatenate(([0], np.cumsum(new_lens)))
    total = int(new_off[-1])
    flat = np.full(total, 32, dtype=np.uint8)
    raw_seg = raw[off[0] : off[-1]]
    if len(raw_seg):
        off0 = off - off[0]
        shift = np.repeat(new_off[:-1] - off0[:-1], lens)
        flat[np.arange(len(raw_seg)) + shift] = raw_seg
    win = np.lib.stride_tricks.sliding_window_view(flat, k).astype(np.uint64)
    powers = np.array(
        [pow(int(_SHINGLE_BASE), k - 1 - j, int(_MOD_P)) for j in range(k)], dtype=np.uint64
    )
    hashes = (win * powers[None, :]).sum(axis=1) % _MOD_P
    # valid (non-boundary-crossing) windows of doc d: [new_off[d], new_off[d] + seg_len[d])
    seg_start = new_off[:-1]
    seg_len = new_lens - k + 1
    seg_end = seg_start + seg_len
    idx = np.empty(2 * n, dtype=np.int64)
    idx[0::2] = seg_start
    idx[1::2] = seg_end
    # reduceat indices must be < len(hashes); the final seg_end == len(hashes)
    trailing = idx[-1] >= len(hashes)
    if trailing:
        idx = idx[:-1]
    out = np.empty((n, num_perm), dtype=np.uint64)
    for j in range(num_perm):
        v = (a[j] * hashes + b[j]) % _MOD_P
        red = np.minimum.reduceat(v, idx)
        out[:, j] = red[0::2]
    return out


def band_keys_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized LSH band keys for a signature MATRIX (n, num_perm) uint64 →
    (n, bands) int64.

    Replaces the per-doc crc32 banding loop. Identical band contents map to
    identical keys (all that correctness needs — candidates are re-verified
    against full signatures); a 64-bit FNV-style fold keeps cross-band
    collisions negligible.
    """
    n, perm = sigs.shape
    r = perm // bands
    x = sigs[:, : bands * r].reshape(n, bands, r).astype(np.uint64)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    P = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(r):
            h = (h ^ x[:, :, j]) * P
        h ^= h >> np.uint64(29)
        h += np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
    return h.view(np.int64)
