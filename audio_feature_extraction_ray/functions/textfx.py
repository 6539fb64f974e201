"""Pure text-analysis kernels: tokenization, quality, lang-ID, fingerprints,
MinHash / SimHash signatures.

These power the training-data-pipeline operators (dedup, quality scoring,
language ID) over the ``documents`` table. Everything is deterministic and
seeded — no process-salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import re
import zlib

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
    """Exact-dedup fingerprint; DuckDB oracle: ``md5(lower(trim(text)))``."""
    t = text.strip().lower() if normalize else text
    return hashlib.md5(t.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 4) -> int:
    """Winnowing-style document fingerprint: min rolling hash over token windows.

    Robust to local edits outside the minimizing window; int64 output.
    """
    toks = [t.lower() for t in ws_tokens(text)]
    if not toks:
        return 0
    hs = [zlib.crc32(t.encode("utf-8")) for t in toks]
    if len(hs) < window:
        acc = 0
        for h in hs:
            acc = (acc * 1_000_003 + h) & 0x7FFFFFFFFFFFFFFF
        return acc
    best = None
    for i in range(len(hs) - window + 1):
        acc = 0
        for h in hs[i : i + window]:
            acc = (acc * 1_000_003 + h) & 0x7FFFFFFFFFFFFFFF
        if best is None or acc < best:
            best = acc
    return int(best)


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


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """LSH band keys: crc32 of each band's bytes, offset by band index.

    Collisions across different band contents only add candidate pairs — they
    are verified against the full signature afterwards, so a 32-bit band hash
    is safe (and cheap at 10^12-row scale).
    """
    r = len(sig) // bands
    keys = np.empty(bands, dtype=np.int64)
    for bi in range(bands):
        payload = sig[bi * r : (bi + 1) * r].tobytes()
        keys[bi] = (bi << 32) | zlib.crc32(payload)
    return keys


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
