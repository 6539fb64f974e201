"""Text-analysis stage over a documents table: token counting, quality
signals, language ID, fingerprints, SimHash — one vectorized ``map_batches``.

The training-data-pipeline operators a 100 TB corpus needs (language ID,
quality scoring, exact-dup fingerprinting), recast from the reference's
per-record quality gates (Q5, 00_audio_data_collection_experiment/
audio_format_assessment.py:48-300). Stateful pieces (compiled regexes,
stopword tables) live in the actor (once per worker), per-batch work is pure
string kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textfx import (
    langid_batch,
    md5_fingerprint,
    quality_batch,
    repetition_batch,
    rolling_fingerprint_batch,
    simhash_batch,
    _flat_tokens,
)

QUALITY_COLS = ("n_chars_calc", "n_tokens", "punct_ratio", "digit_ratio", "upper_ratio", "avg_token_len")

# shared bound for the per-actor token memos: on an open-vocabulary corpus an
# uncapped memo grows to full-vocabulary size per actor for the actor's
# lifetime — past the cap the oldest half evicts (insertion order; every memo
# here is a pure optimization, never correctness)
_ACTOR_CACHE_MAX = 2_000_000


def _bound_cache(cache: dict, cap: int = _ACTOR_CACHE_MAX) -> None:
    if len(cache) >= cap:
        for k in list(cache)[: cap // 2]:
            del cache[k]


class TextFeatures:
    """Callable-class actor stage: documents → per-doc text features."""

    def __init__(
        self,
        text_col: str = "text",
        quality: bool = True,
        lang: bool = True,
        fingerprints: bool = True,
        simhash: bool = False,
        repetition: bool = False,
    ):
        self.text_col = text_col
        self.quality = quality
        self.lang = lang
        self.fingerprints = fingerprints
        self.simhash = simhash
        self.repetition = repetition
        # per-actor token→md5 caches (tokens repeat heavily across documents;
        # each distinct token hashes once per actor per kernel)
        self._simhash_byte_cache: dict = {}  # token -> 8-byte ndarray (simhash kernel)
        self._fp_cache: dict = {}
        # warm compiled regexes once per actor
        from ..functions import textfx  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _bound_cache(self._simhash_byte_cache)
        _bound_cache(self._fp_cache)
        col = batch.column(self.text_col)
        # SQL null-in → null-out: every computed column is NULL for a NULL
        # document (the kernels run over ""-filled slots, then the outputs
        # are masked — matches md5(NULL)=NULL, length(NULL)=NULL, the
        # oracles' CASE chains, etc.)
        null_mask = None
        if col.null_count:
            null_mask = pc.is_null(col).combine_chunks()
            col = col.fill_null("")
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        def _masked(arr: pa.Array) -> pa.Array:
            if null_mask is None:
                return arr
            return pc.if_else(null_mask, pa.scalar(None, arr.type), arr)

        out = {n: batch.column(n) for n in batch.column_names}
        if self.quality:
            qs = quality_batch(col)
            out["n_chars_calc"] = _masked(
                pa.array(qs["n_chars"].astype("int64"), pa.int64()))
            out["n_tokens"] = _masked(
                pa.array(qs["n_tokens"].astype("int64"), pa.int64()))
            for c in ("punct_ratio", "digit_ratio", "upper_ratio", "avg_token_len"):
                out[c] = _masked(pa.array(qs[c], pa.float64()))
        if self.lang:
            out["lang_pred"] = _masked(pa.array(langid_batch(col), pa.string()))
        if self.fingerprints:
            texts = col.to_pylist()
            # whole-document md5 is inherently per-row (one digest per doc)
            out["fingerprint_md5"] = _masked(pa.array(
                [md5_fingerprint(t or "") for t in texts], pa.string()
            ))
            out["fingerprint_rolling"] = _masked(pa.array(
                rolling_fingerprint_batch(col, token_hash_cache=self._fp_cache),
                pa.int64(),
            ))
        if self.simhash:
            out["simhash"] = _masked(
                pa.array(simhash_batch(col, self._simhash_byte_cache), pa.int64()))
        if self.repetition:
            dup, top2 = repetition_batch(col, token_hash_cache=self._fp_cache)
            out["dup_line_frac"] = _masked(pa.array(dup, pa.float64()))
            out["top_2gram_frac"] = _masked(pa.array(top2, pa.float64()))
        return pa.table(out)


def text_features(
    ds: ray.data.Dataset,
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 1024,
    **kwargs,
) -> ray.data.Dataset:
    return ds.map_batches(
        TextFeatures,
        fn_constructor_kwargs={"text_col": text_col, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def redact(
    ds: ray.data.Dataset,
    patterns: dict[str, str],
    text_col: str = "text",
    count_col: str | None = "n_redactions",
) -> ray.data.Dataset:
    """PII-style scrubbing: replace each regex with its placeholder, fully
    columnar (``pc.replace_substring_regex``), optionally counting the
    redactions per row — the pre-training text-cleanup stage (emails,
    numbers, handles out; structure preserved). Patterns apply in dict
    order, matching SQL ``regexp_replace(..., 'g')`` chains exactly.
    """
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # NULL text stays NULL with a NULL count: both pc.replace_substring_regex
        # and pc.count_substring_regex propagate nulls, exactly like SQL's
        # regexp_replace(NULL) / len(regexp_extract_all(NULL)) chains.
        total = None
        for pat, repl in patterns.items():
            if count_col is not None:
                hits = pc.count_substring_regex(col, pat)
                total = hits if total is None else pc.add(total, hits)
            col = pc.replace_substring_regex(col, pat, repl)
        out = {n: t.column(n) for n in t.column_names if n != text_col}
        out[text_col] = col
        if count_col is not None:
            out[count_col] = pc.cast(total, pa.int64()) if total is not None else \
                pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_text(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> ray.data.Dataset:
    """Token-window chunking with overlap — the LLM context-window prep
    stage: each document becomes ceil-covering windows of ``chunk_tokens``
    whitespace tokens stepping by ``chunk_tokens - overlap``. Output rows
    ``(id, chunk_id, chunk_text, n_tokens)`` with chunk text whitespace-
    joined (token-level chunking; original inter-token whitespace is not
    preserved, matching SQL array_to_string). Empty documents emit no
    chunks. Tokenization is columnar; only the per-chunk string joins are
    per-row (inherent to producing chunk strings)."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def fn(batch: pa.Table) -> pa.Table:
        flat, off, _ = _flat_tokens(batch.column(text_col))
        toks = flat.to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_id, out_cid, out_txt, out_n = [], [], [], []
        for r in range(len(ids)):
            words = [t for t in toks[off[r] : off[r + 1]] if t]
            n = len(words)
            if n == 0:
                continue
            nc = 1 if n <= chunk_tokens else 1 + -(-(n - chunk_tokens) // step)
            for i in range(nc):
                piece = words[i * step : i * step + chunk_tokens]
                out_id.append(ids[r])
                out_cid.append(i)
                out_txt.append(" ".join(piece))
                out_n.append(len(piece))
        id_type = batch.schema.field(id_col).type
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "chunk_id": pa.array(out_cid, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_count_table(ds: ray.data.Dataset, id_col: str, text_col: str = "text") -> ray.data.Dataset:
    """Minimal projection: (id, token_count) with python str.split semantics
    (columnar split — non-empty token slots counted, no per-doc loop).
    NULL text → NULL count (SQL null-in/null-out; '' counts 0)."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        _, _, n_tok = _flat_tokens(txt)
        counts = pc.if_else(txt.is_valid(), pa.array(n_tok, pa.int64()),
                            pa.scalar(None, pa.int64()))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "token_count": counts,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _TagContamination:
    """Actor stage: flag documents sharing any full token n-gram with the
    broadcast benchmark hash set (object-store ref read once per actor)."""

    def __init__(self, bench_ref, text_col: str, window: int):
        import ray as _ray

        self.bench = _ray.get(bench_ref)  # sorted uint64 array, zero-copy
        self.text_col = text_col
        self.window = window
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textfx import contamination_batch

        _bound_cache(self._cache)
        hits, flag = contamination_batch(
            batch.column(self.text_col), self.bench, self.window, self._cache
        )
        return batch.append_column(
            "n_contaminated", pa.array(hits, pa.int64())
        ).append_column("contaminated", pa.array(flag, pa.bool_()))


def decontaminate(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str = "text",
    bench_text_col: str | None = None,
    window: int = 8,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Benchmark decontamination — the eval-set leakage check every LLM
    training corpus runs: tag each corpus document with how many of its full
    ``window``-token n-grams appear anywhere in the benchmark set.

    Scale shape: the benchmark (an eval set) is orders of magnitude smaller
    than the corpus, so its distinct n-gram hashes are computed distributed
    (per-block unique arrays), unioned once, and **broadcast** via
    ``ray.put`` — the 100 TB corpus streams through an actor pool doing one
    ``searchsorted`` per batch; no shuffle touches the corpus. Token hash /
    polynomial fold match :func:`...functions.textfx.ngram_window_hashes`,
    so a SQL oracle replays the flags exactly.
    """
    import numpy as np
    import ray as _ray

    from ..functions.textfx import _token_hash_stream, _window_fold

    bcol = bench_text_col or text_col

    def block_hashes(t: pa.Table) -> pa.Table:
        stream = _token_hash_stream(t.column(bcol))
        if stream is None:
            return pa.table({"h": pa.array([], pa.uint64())})
        h, starts, counts = stream
        if len(h) < window:
            return pa.table({"h": pa.array([], pa.uint64())})
        acc = _window_fold(h, window)
        # keep only windows fully inside one document
        long_rows = np.flatnonzero(counts >= window)
        segs = [
            acc[starts[r] : starts[r] + counts[r] - window + 1] for r in long_rows
        ]
        u = np.unique(np.concatenate(segs)) if segs else np.array([], dtype=np.uint64)
        return pa.table({"h": pa.array(u, pa.uint64())})

    parts = benchmark.map_batches(block_hashes, batch_format="pyarrow",
                                  zero_copy_batch=True)
    chunks = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    bench_sorted = (
        np.unique(np.concatenate(chunks)) if chunks else np.array([], dtype=np.uint64)
    )
    ref = _ray.put(bench_sorted)
    return ds.map_batches(
        _TagContamination,
        fn_constructor_kwargs={"bench_ref": ref, "text_col": text_col, "window": window},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )

def _doc_token_tf(t: pa.Table, id_col: str, text_col: str):
    """Vectorized per-batch (doc, token, tf) expansion: whitespace tokens
    (``_flat_tokens``), empties dropped, counted with Arrow's C++ hash
    group-by — never a Python loop over rows or tokens."""
    import numpy as np
    import pyarrow.compute as pc

    flat, off, _ = _flat_tokens(t.column(text_col))
    n = t.num_rows
    if n == 0 or len(flat) == 0:
        return pa.table(
            {
                "__did": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    did = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    nonempty = pc.not_equal(pc.utf8_length(flat), 0)
    pairs = pa.table(
        {"__did": pa.array(did), "token": flat}
    ).filter(nonempty)
    counts = pairs.group_by(["__did", "token"]).aggregate([([], "count_all")])
    return counts.rename_columns(["__did", "token", "tf"])


def tfidf_top_terms(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_docs: int | None = None,
    max_vocab: int | None = None,
    digits: int = 6,
) -> ray.data.Dataset:
    """Top-``k`` TF-IDF terms per document (sklearn smooth-idf:
    ``idf = ln((1+N)/(1+df)) + 1``, ``N`` = corpus size, ``df`` = number of
    documents containing the token; whitespace tokens, case-sensitive).

    Scale shape: document frequencies are the ONLY exchange — per-batch
    distinct (doc, token) pairs collapse to per-batch (token, partial-df)
    before the shuffle (partials bounded by #blocks × distinct-tokens-per-
    block, never token occurrences). The idf table is broadcast once
    (``ray.put``); the scoring pass is fully in-batch — a document is one
    row, so per-doc top-k needs no shuffle at all. ``max_vocab`` bounds the
    broadcast (top df, ties → token asc) for open-vocabulary corpora; OOV
    tokens then score 0 and the truncation is logged, never silent.

    tfidf is rounded half-away-from-zero to ``digits`` BEFORE the top-k
    ordering (ties then break token-asc) so the selection is stable on the
    rounding grid — replayable in SQL with ``ROUND``.

    Reference analog: the per-recording feature-selection ranking
    (04_feature_extraction_experiment/feature_extraction.py:290-340) recast
    as corpus-level term weighting.
    """
    import numpy as np
    import pyarrow.compute as pc

    import ray

    from .aggregates import grouped_agg_fast

    if n_docs is None:
        n_docs = ds.count()

    def batch_df(t: pa.Table) -> pa.Table:
        pairs = _doc_token_tf(t, id_col, text_col)
        part = pairs.group_by(["token"]).aggregate([([], "count_all")])
        return part.rename_columns(["token", "df_part"])

    df_ds = grouped_agg_fast(
        ds.map_batches(batch_df, batch_format="pyarrow", zero_copy_batch=True),
        keys=["token"],
        specs=[("df", "df_part", "sum")],
    )
    if max_vocab is not None:
        from .util import topk

        # pin before count(): the count would otherwise EXECUTE the whole
        # tokenize+DF pipeline once, and the topk/collect below would
        # re-execute it from the source (unigram_lm_scores materializes
        # for the same reason)
        df_ds = df_ds.materialize()
        total_vocab = df_ds.count()
        df_ds = topk(df_ds, ["df", "token"], k=max_vocab, descending=[True, False])
        if total_vocab > max_vocab:
            import logging

            logging.getLogger(__name__).warning(
                "tfidf_top_terms: vocab truncated %d -> %d (OOV tokens score 0)",
                total_vocab,
                max_vocab,
            )
    # empty shuffle blocks can carry a degenerate schema — drop them
    blocks = [b for b in ray.get(df_ds.to_arrow_refs()) if b.num_rows > 0]
    if not blocks:
        blocks = [pa.table({"token": pa.array([], pa.string()),
                            "df": pa.array([], pa.int64())})]
    df_tbl = pa.concat_tables(blocks).combine_chunks()
    vocab = df_tbl.column("token").combine_chunks()
    dfv = df_tbl.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
    idf = np.log((1.0 + n_docs) / (1.0 + dfv)) + 1.0
    broadcast = ray.put((vocab, idf))

    from .util import round_half_away  # shared DuckDB-compatible half-away kernel

    def score(t: pa.Table) -> pa.Table:
        vocab_a, idf_a = ray.get(broadcast)
        pairs = _doc_token_tf(t, id_col, text_col)
        if pairs.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                }
            )
        idx = pc.index_in(pairs.column("token"), value_set=vocab_a)
        idxn = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        found = ~np.isnan(idxn)
        idf_per = np.where(found, idf_a[np.where(found, idxn, 0).astype(np.int64)], 0.0)
        tf = pairs.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = round_half_away(tf * idf_per, digits)
        did = pairs.column("__did").to_numpy(zero_copy_only=False)
        # per-doc top-k: one native multi-key sort (did asc, tfidf desc,
        # token asc), then rank-within-run < k — no per-doc dispatch
        sort_tbl = pa.table(
            {"d": pa.array(did), "s": pa.array(tfidf), "t": pairs.column("token")}
        )
        order = pc.sort_indices(
            sort_tbl,
            sort_keys=[("d", "ascending"), ("s", "descending"), ("t", "ascending")],
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        did_s = did[order]
        starts = np.concatenate(([True], did_s[1:] != did_s[:-1]))
        run_id = np.cumsum(starts) - 1
        rank = np.arange(len(did_s)) - np.flatnonzero(starts)[run_id]
        keep = order[rank < k]
        keep.sort()
        ids = t.column(id_col).take(pa.array(did[keep]))
        return pa.table(
            {
                id_col: ids,
                "token": pairs.column("token").take(pa.array(keep)),
                "tf": pc.cast(pairs.column("tf").take(pa.array(keep)), pa.int64()),
                "tfidf": pa.array(tfidf[keep], pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

# per-worker memo: token -> (bucket-hash int, sign) so each distinct token
# is md5'd once per worker process, not once per occurrence. BOUNDED: on an
# open-vocabulary corpus an uncapped memo grows to full-vocabulary size per
# worker for the process lifetime — past the cap the oldest half is evicted
# (insertion order; the memo is a pure optimization, never correctness).
_HASHVEC_CACHE: dict = {}
_HASHVEC_CACHE_MAX = 2_000_000


def _hashvec_cache_put(tok, memo) -> None:
    _bound_cache(_HASHVEC_CACHE, _HASHVEC_CACHE_MAX)
    _HASHVEC_CACHE[tok] = memo


def hashing_vectorizer(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> ray.data.Dataset:
    """Hashing-trick text vectorizer (sklearn ``HashingVectorizer`` shape):
    sparse (doc, bucket, weight) rows with ``bucket = md5(token) mod dim``
    and a signed count (sign from the 9th md5 hex digit's parity) so bucket
    collisions cancel in expectation instead of accumulating bias.

    Stateless per document — a document is ONE row, so the whole transform
    is a single in-batch pass with NO shuffle at any scale: tokenize
    (vectorized), md5 only the batch's DISTINCT tokens (dictionary-encode +
    per-worker memo), signed-sum per (doc, bucket) with Arrow's C++ hash
    aggregation. md5-derived buckets are engine-portable: DuckDB replays
    them exactly (``CAST(concat('0x', substr(md5(token),1,8)) AS UBIGINT)``),
    so the gate oracle-checks values, not just shapes.
    """
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    def vectorize(t: pa.Table) -> pa.Table:
        pairs = _doc_token_tf(t, id_col, text_col)
        if pairs.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "bucket": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        toks = pairs.column("token").combine_chunks().dictionary_encode()
        vocab = toks.dictionary.to_pylist()
        buckets_v = np.empty(len(vocab), dtype=np.int64)
        signs_v = np.empty(len(vocab), dtype=np.int64)
        for i, tok in enumerate(vocab):
            memo = _HASHVEC_CACHE.get(tok)
            if memo is None:
                hx = hashlib.md5(tok.encode("utf-8", "surrogatepass")).hexdigest()
                memo = (int(hx[:8], 16), 1 if int(hx[8], 16) % 2 == 0 else -1)
                _hashvec_cache_put(tok, memo)
            buckets_v[i] = memo[0]
            signs_v[i] = memo[1]
        idx = toks.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = buckets_v[idx] % dim
        signed = signs_v[idx] * pairs.column("tf").to_numpy(zero_copy_only=False)
        did = pairs.column("__did")
        agg = (
            pa.table(
                {
                    "__did": did,
                    "bucket": pa.array(bucket, pa.int64()),
                    "w": pa.array(signed, pa.int64()),
                }
            )
            .group_by(["__did", "bucket"])
            .aggregate([("w", "sum")])
        )
        ids = t.column(id_col).take(agg.column("__did"))
        return pa.table(
            {
                id_col: ids,
                "bucket": agg.column("bucket"),
                "weight": pc.cast(agg.column("w_sum"), pa.int64()),
            }
        )

    return ds.map_batches(vectorize, batch_format="pyarrow", zero_copy_batch=True)

def ngram_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n: int = 2,
) -> ray.data.Dataset:
    """Full corpus (gram, n) counts for word n-grams (whitespace tokens,
    document-bounded) — the shared kernel behind :func:`ngram_frequencies`
    and :func:`pmi_collocations`. Per-batch columnar n-gram build + in-batch
    count partials, one partial-only exchange; grams never shuffle as rows.

    n-gram strings are built columnar: one ``binary_join_element_wise``
    over n shifted slices of the non-empty token stream, masked to rows
    whose n tokens all sit in the same document.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.aggregates import grouped_agg_fast

    if n < 1:
        raise ValueError("n must be >= 1")

    def to_grams(t: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string())})
        flat, off, _ = _flat_tokens(t.column(text_col))
        if t.num_rows == 0 or len(flat) == 0:
            return empty
        mask = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        kept = flat.filter(pa.array(mask))
        m = len(kept)
        if m < n:
            return empty
        did = np.repeat(np.arange(t.num_rows, dtype=np.int64), np.diff(off))[mask]
        same_doc = did[: m - n + 1] == did[n - 1 :]
        slices = [kept.slice(j, m - n + 1) for j in range(n)]
        grams = slices[0] if n == 1 else pc.binary_join_element_wise(*slices, " ")
        return pa.table({"gram": grams.filter(pa.array(same_doc))})

    grams = ds.map_batches(to_grams, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg_fast(grams, keys=["gram"], specs=[], count_alias="n")


def ngram_frequencies(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n: int = 2,
    k: int = 50,
) -> ray.data.Dataset:
    """Corpus top-``k`` word n-grams: :func:`ngram_counts` + partial top-k
    merge (only (gram, count) partials and k-row candidates move)."""
    from .util import topk

    counts = ngram_counts(ds, text_col, n)
    return topk(counts, ["n", "gram"], k=k, descending=[True, False])


def pmi_collocations(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    round_digits: int | None = None,
) -> ray.data.Dataset:
    """Top-``k`` bigram collocations by pointwise mutual information:
    ``pmi = log2((c_xy / N2) / ((c_x / N1) · (c_y / N1)))`` over
    document-bounded whitespace bigrams.

    Scale shape: unigram and bigram counts stream through the map-side
    combiner (never row-shuffling grams); both sides are then pruned to
    ``n >= min_count`` — sound because any word inside a qualifying bigram
    occurs at least as often as the bigram — so the joined vocabularies are
    frequency-bounded, and the two count lookups broadcast. N1/N2 totals
    come from the UNPRUNED counts. Output: (gram, n, pmi), top-k by
    (pmi desc, gram asc).
    """
    import numpy as np
    import pyarrow.compute as pc

    from .util import topk
    from ..stages.joins import broadcast_join

    uni = ngram_counts(ds, text_col, n=1).materialize()
    bi = ngram_counts(ds, text_col, n=2).materialize()
    n1 = uni.sum("n") or 0
    n2 = bi.sum("n") or 0
    if n2 == 0:
        return ray.data.from_arrow(
            pa.table({"gram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "pmi": pa.array([], pa.float64())})
        )
    uni_f = uni.filter(expr=f"n >= {min_count}")
    bi_f = bi.filter(expr=f"n >= {min_count}")

    def split_words(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("gram"), " ")
        return pa.table({
            "gram": t.column("gram"),
            "n": t.column("n"),
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
        })

    # collect the unigram lookup ONCE; both joins are the same table under
    # different column names (cooccurrence_lift's pattern)
    _uni_tables = list(uni_f.iter_batches(batch_format="pyarrow", batch_size=None))
    _uni_tbl = pa.concat_tables(_uni_tables) if _uni_tables else pa.table(
        {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    pairs = bi_f.map_batches(split_words, batch_format="pyarrow", zero_copy_batch=True)
    pairs = broadcast_join(pairs, _uni_tbl.rename_columns(["w1", "c1"]), "w1")
    pairs = broadcast_join(pairs, _uni_tbl.rename_columns(["w2", "c2"]), "w2")

    def score(t: pa.Table) -> pa.Table:
        c_xy = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log2((c_xy / n2) / ((c1 / n1) * (c2 / n1)))
        if round_digits is not None:
            # round BEFORE the top-k so cutoff ties order on the same grid
            # as a ROUND()ing SQL oracle
            q = 10.0 ** round_digits
            pmi = np.copysign(np.floor(np.abs(pmi) * q + 0.5) / q, pmi)
        return pa.table({
            "gram": t.column("gram"),
            "n": t.column("n"),
            "pmi": pa.array(pmi, pa.float64()),
        })

    scored = pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return topk(scored, ["pmi", "gram"], k=k, descending=[True, False])


def build_vocab(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
) -> ray.data.Dataset:
    """Corpus vocabulary construction: whitespace tokens → global counts →
    contiguous ``token_id`` assignment by ``(count DESC, token ASC)`` —
    the id table a tokenizer-training / embedding-table step consumes.
    Output columns: (token, n, token_id), token_id zero-based and dense.

    Scale shape: token counts stream through the map-side combiner (raw
    tokens never shuffle); the sort ranks the VOCABULARY (≪ corpus — the
    distinct-token table), and the global row numbers come from one
    per-block offset pass: each sorted block reports (first_n, first_token,
    rows) — one tiny row per block — the driver prefix-sums the block
    offsets in key order, and a second per-block pass adds
    ``offset + arange(rows)``. Range-partitioned sort blocks are disjoint
    in the total order, so block-first keys identify each block's rank
    span exactly; the driver holds one dict entry per BLOCK, never per
    token. SQL equivalent: ``ROW_NUMBER() OVER (ORDER BY n DESC, token)``.
    """
    import numpy as np
    import ray as _ray
    import pyarrow.compute as pc

    from .aggregates import grouped_agg_fast

    def to_tokens(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t.column(text_col))
        flat = flat.filter(pc.not_equal(pc.utf8_length(flat), 0))
        return pa.table({"token": flat})

    counts = grouped_agg_fast(
        ds.select_columns([text_col]).map_batches(
            to_tokens, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["token"],
        specs=[],
        count_alias="n",
    )
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {min_count}")
    srt = counts.sort(["n", "token"], descending=[True, False]).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        empty = pa.schema([
            pa.field("first_n", pa.int64()),
            pa.field("first_token", pa.string()),
            pa.field("rows", pa.int64()),
        ])
        if t.num_rows == 0:
            return empty.empty_table()
        return pa.table({
            "first_n": pa.array([t.column("n")[0].as_py()], pa.int64()),
            "first_token": pa.array([t.column("token")[0].as_py()], pa.string()),
            "rows": pa.array([t.num_rows], pa.int64()),
        })

    summ = srt.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).take_all()
    summ.sort(key=lambda r: (-r["first_n"], r["first_token"]))
    offsets: dict[str, int] = {}
    acc = 0
    for r in summ:
        offsets[r["first_token"]] = acc
        acc += r["rows"]
    ref = _ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("token_id", pa.array([], pa.int64()))
        off = _ray.get(ref)[t.column("token")[0].as_py()]
        ids = off + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column("token_id", pa.array(ids, pa.int64()))

    out = srt.map_batches(assign, batch_format="pyarrow", batch_size=None)
    if max_size is not None:
        out = out.filter(expr=f"token_id < {max_size}")
    return out


def bpe_merge_loop(
    words: list[str],
    counts,
    n_merges: int,
    min_pair_count: int = 2,
    end_of_word: str = "</w>",
) -> list[tuple[int, str, str, str, int]]:
    """The pinned-table BPE merge loop: ``n_merges`` iterations over an
    in-memory (word, count) vocabulary — ZERO Ray executions. Semantics
    identical to the distributed per-merge route (same (count DESC,
    (l, r) ASC) tie-break, same greedy left-to-right merge application);
    route parity is pinned in pytest.

    Incremental (the textbook fast trainer): pair counts build once, a
    lazy max-heap keyed (-count, l, r) yields each round's best pair
    (stale entries are popped and discarded; every count change pushes a
    fresh entry, so the first entry matching its pair's CURRENT count is
    the true deterministic max), and a merge re-counts only the words
    that contain the winning pair — per-merge work is O(affected
    symbols), not O(corpus vocabulary)."""
    import heapq

    syms: list[list[str]] = [list(w) + [end_of_word] for w in words]
    counts = np.asarray(counts, dtype=np.int64)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, row in enumerate(syms):
        c = int(counts[wi])
        for p in zip(row, row[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-n, l, r) for (l, r), n in pair_counts.items()]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], delta: int, wi: int, present_after: bool):
        n = pair_counts.get(p, 0) + delta
        if n <= 0:
            pair_counts.pop(p, None)
        else:
            pair_counts[p] = n
            heapq.heappush(heap, (-n, p[0], p[1]))
        ws = pair_words.setdefault(p, set())
        if present_after:
            ws.add(wi)
        else:
            ws.discard(wi)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negn, l, r = heap[0]
            if pair_counts.get((l, r)) == -negn:
                best = (l, r, -negn)
                break
            heapq.heappop(heap)  # stale
        if best is None or best[2] < min_pair_count:
            break
        l, r, cnt = best
        merged = l + r
        merges.append((rank, l, r, merged, cnt))
        for wi in sorted(pair_words.get((l, r), ())):
            row = syms[wi]
            out, i = [], 0
            while i < len(row):
                if i + 1 < len(row) and row[i] == l and row[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(row[i])
                    i += 1
            c = int(counts[wi])
            for p in zip(row, row[1:]):
                bump(p, -c, wi, False)
            for p in zip(out, out[1:]):
                bump(p, c, wi, True)
            syms[wi] = out
    return merges


@ray.remote
def _bpe_merge_task(n_merges, min_pair_count, end_of_word, *tables):
    """One long-lived task pinning the vocabulary-scale word table and
    running the whole merge loop in place — the per-merge cost is pure
    compute, never a driver⇄cluster round-trip."""
    parts = [t.select(["word", "n"]) for t in tables
             if t.num_rows and "word" in t.column_names]
    if not parts:
        return []
    t = pa.concat_tables(parts, promote_options="permissive")
    return bpe_merge_loop(
        t.column("word").to_pylist(),
        t.column("n").to_numpy(zero_copy_only=False),
        n_merges, min_pair_count, end_of_word,
    )


def bpe_train(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_count: int = 2,
    end_of_word: str = "</w>",
    distributed: bool | None = None,
    vocab_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """Distributed BPE-merge training (Sennrich et al. 2016, public): learn
    the ``n_merges`` highest-count adjacent-symbol merges over the corpus,
    the tokenizer-training step downstream of :func:`build_vocab`. Output:
    one row per learned merge — (rank, left, right, merged, n) — in learn
    order; ties break (count DESC, (left, right) lexicographic ASC), so the
    result is deterministic and cluster-size-invariant.

    Scale shape: the corpus is tokenized ONCE into a distinct-WORD frequency
    table (map-side combine; raw tokens never shuffle — the same contract as
    :func:`build_vocab`). That table is VOCABULARY-scale, so below
    ``vocab_threshold`` rows the merge loop runs pinned in ONE remote task
    (:func:`bpe_merge_loop` — zero per-merge Ray executions; a real
    tokenizer run is tens of thousands of merges, and two driver round-trips
    per merge is a wall-clock scale-killer regardless of cluster size).
    Above the threshold the per-merge distributed route takes over: every
    block emits (pair, weighted count) partials from offset arithmetic over
    the flattened symbol lists, the tiny partial stream hash-combines, a
    partial top-k returns the single best pair, and the merge application
    rebuilds ONLY words containing it. ``distributed`` forces a route
    (parity pinned in pytest).

    Stops early when the best pair's count drops below ``min_pair_count``.

    Reference analog: the fit-once/apply-many codec layout of
    04_feature_extraction_experiment/feature_extraction_for_student.py —
    the learned merge table is the "model" later encode stages consume.
    """
    from .aggregates import grouped_agg_fast

    def to_tokens(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t.column(text_col))
        flat = flat.filter(pc.not_equal(pc.utf8_length(flat), 0))
        return pa.table({"word": flat})

    words = grouped_agg_fast(
        ds.select_columns([text_col]).map_batches(
            to_tokens, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["word"],
        specs=[],
        count_alias="n",
    ).materialize()

    if distributed is None:
        distributed = words.count() > vocab_threshold
    if distributed:
        merges = _bpe_train_distributed(words, n_merges, min_pair_count,
                                        end_of_word)
    else:
        refs = words.to_arrow_refs()
        merges = ray.get(_bpe_merge_task.remote(
            n_merges, min_pair_count, end_of_word, *refs))

    out = pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "n": pa.array([m[4] for m in merges], pa.int64()),
    })
    return ray.data.from_arrow(out)


def _bpe_train_distributed(
    words: ray.data.Dataset,
    n_merges: int,
    min_pair_count: int,
    end_of_word: str,
) -> list[tuple[int, str, str, str, int]]:
    """The above-threshold BPE route: the word table stays a Dataset and
    each merge is one distributed partial-count pass + partial top-k."""
    import polars as pl

    from .aggregates import grouped_agg_fast
    from .util import topk

    def init_syms(t: pa.Table) -> pa.Table:
        ws = t.column("word").to_pylist()
        syms = [list(w) + [end_of_word] for w in ws]
        return pa.table({
            "word": t.column("word"),
            "n": t.column("n"),
            "syms": pa.array(syms, pa.list_(pa.string())),
        })

    wt = words.map_batches(init_syms, batch_format="pyarrow").materialize()

    def _pair_geometry(t: pa.Table):
        """(flat symbol values, left-index array of valid adjacent pairs,
        per-pair word index, per-pair weight)."""
        arr = t.column("syms").combine_chunks()
        off = arr.offsets.to_numpy().astype(np.int64)
        flat = arr.values
        lens = np.diff(off)
        npairs = np.maximum(lens - 1, 0)
        keep = np.ones(len(flat), dtype=bool)
        keep[off[1:] - 1] = False          # last symbol of each word
        left_idx = np.flatnonzero(keep)
        word_of = np.repeat(np.arange(len(lens)), npairs)
        weight = np.repeat(t.column("n").to_numpy(zero_copy_only=False), npairs)
        return flat, left_idx, word_of, weight

    EMPTY_PAIRS = pa.schema([pa.field("l", pa.string()),
                             pa.field("r", pa.string()),
                             pa.field("n", pa.int64())])

    def pair_partials(t: pa.Table) -> pa.Table:
        # pairs travel as TWO columns, never a joined key: symbols may
        # contain any non-whitespace byte, so no separator is collision-free,
        # and the (count DESC, (l, r) ASC) tie-break is then the true tuple
        # order rather than a joined-string order
        if t.num_rows == 0:
            return EMPTY_PAIRS.empty_table()
        flat, li, _, w = _pair_geometry(t)
        if len(li) == 0:
            return EMPTY_PAIRS.empty_table()
        lefts = flat.take(pa.array(li, pa.int64()))
        rights = flat.take(pa.array(li + 1, pa.int64()))
        agg = (
            pl.from_arrow(pa.table({"l": lefts, "r": rights,
                                    "n": pa.array(w, pa.int64())}))
            .group_by("l", "r").agg(pl.col("n").sum())
            .to_arrow()
        )
        return agg.select(["l", "r", "n"]).cast(EMPTY_PAIRS)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        counts = grouped_agg_fast(
            wt.map_batches(pair_partials, batch_format="pyarrow",
                           zero_copy_batch=True),
            keys=["l", "r"],
            specs=[("n", "n", "sum")],
        )
        best = topk(counts, ["n", "l", "r"], k=1,
                    descending=[True, False, False]).take_all()
        if not best or best[0]["n"] < min_pair_count:
            break
        l, r = best[0]["l"], best[0]["r"]
        merged = l + r
        merges.append((rank, l, r, merged, int(best[0]["n"])))

        def apply_merge(t: pa.Table, _l=l, _r=r, _m=merged) -> pa.Table:
            if t.num_rows == 0:
                return t
            flat, li, word_of, _ = _pair_geometry(t)
            if len(li) == 0:
                return t
            lefts = flat.take(pa.array(li, pa.int64()))
            rights = flat.take(pa.array(li + 1, pa.int64()))
            hit = pc.and_(pc.equal(lefts, _l), pc.equal(rights, _r))
            hit_np = hit.to_numpy(zero_copy_only=False)
            if not hit_np.any():
                return t
            affected = np.zeros(t.num_rows, dtype=bool)
            affected[np.unique(word_of[hit_np])] = True
            amask = pa.array(affected)
            untouched = t.filter(pc.invert(amask))
            sub = t.filter(amask)
            new_syms = []
            for row in sub.column("syms").to_pylist():
                out, i = [], 0
                while i < len(row):
                    if i + 1 < len(row) and row[i] == _l and row[i + 1] == _r:
                        out.append(_m)
                        i += 2
                    else:
                        out.append(row[i])
                        i += 1
                new_syms.append(out)
            rebuilt = pa.table({
                "word": sub.column("word"),
                "n": sub.column("n"),
                "syms": pa.array(new_syms, pa.list_(pa.string())),
            })
            return pa.concat_tables([untouched, rebuilt])

        wt = wt.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return merges


def _md5_route(id_col: str, n_partitions: int):
    """Shared md5-hex partition routing for the packing operators: the first
    hex digit of md5(id) mod n_partitions — data-derived, cluster-size-
    invariant, and replayed by the SQL oracles via
    ``strpos('0123456789abcdef', substr(md5(id), 1, 1)) - 1``."""
    import hashlib

    if not 1 <= n_partitions <= 16:
        raise ValueError("n_partitions must be in 1..16 (one md5 hex digit)")

    def add_part(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.string()).to_pylist()
        if any(s is None for s in ids):
            # packing orders by id within each partition — a null id has no
            # deterministic place; fail loudly instead of an AttributeError
            # deep in the map task
            raise ValueError(
                f"{id_col!r} contains null ids — md5-routed packing needs a "
                f"non-null unique id per row")
        part = [int(hashlib.md5(s.encode()).hexdigest()[0], 16) % n_partitions
                for s in ids]
        return t.append_column("part", pa.array(part, pa.int64()))

    return add_part


def greedy_pack_fold(tok: "np.ndarray", budget: int):
    """The pure greedy close-on-overflow fold behind :func:`pack_sequences`:
    given per-document token counts in pack order, return
    (pack_of, pack_pos, pack_fill) arrays. Each step is one searchsorted
    probe of the token cumsum, so Python work is O(output packs), not rows.
    Property-tested against a row-at-a-time serial fold."""
    n = len(tok)
    c = np.cumsum(tok)
    pack_of = np.empty(n, dtype=np.int64)
    pos = np.empty(n, dtype=np.int64)
    fill = np.empty(n, dtype=np.int64)
    start, base, seq = 0, 0, 0
    while start < n:
        j = int(np.searchsorted(c, base + budget, side="right")) - 1
        if j < start:
            j = start  # oversize document: its own pack
        pack_of[start : j + 1] = seq
        pos[start : j + 1] = np.arange(j - start + 1)
        fill[start : j + 1] = c[start : j + 1] - base
        base = c[j]
        start = j + 1
        seq += 1
    return pack_of, pos, fill


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_partitions: int = 16,
) -> ray.data.Dataset:
    """Greedy sequence packing: assign documents to fixed-token-budget
    training sequences ("packs") — the example-packing step between
    tokenization and batching in an LLM data pipeline. A pack closes when
    the next document would push it past ``budget``; a document longer than
    ``budget`` occupies a pack alone (flagged ``oversize``), the caller's
    truncation decision.

    Determinism and cluster-size invariance: documents are routed by the
    first hex char of ``md5(id)`` into ``n_partitions`` ≤ 16 partitions and
    packed in ascending id order within each — both are data-derived, so the
    layout replays identically at any parallelism (the same contract as
    ``with_batch_ids``). ``pack_id = (partition << 32) | seq``.

    Scale shape: one hash exchange of (id, n_tokens) scalar rows, then each
    partition packs independently; the greedy fold is a searchsorted loop
    over PACKS (not rows — each step is one O(log n) probe of the token
    cumsum), so per-task Python work is proportional to output packs. The
    sequential dependency is real (pack boundaries depend on every prior
    row in the partition), which is exactly why the fold is partition-local:
    SQL needs a recursive CTE for the same semantics (the oracle runs one).

    Output: (id, n_tokens, part, pack_id, pack_pos, pack_fill,
    oversize); ``pack_fill`` is the pack's total tokens on its LAST row and
    the running fill before that (matching the recursive oracle's running
    column, so every row is value-checkable).
    """
    add_part = _md5_route(id_col, n_partitions)

    def pack_block(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(id_col, block.schema.field(id_col).type),
            pa.field(tokens_col, pa.int64()),
            pa.field("part", pa.int64()),
            pa.field("pack_id", pa.int64()),
            pa.field("pack_pos", pa.int64()),
            pa.field("pack_fill", pa.int64()),
            pa.field("oversize", pa.bool_()),
        ])
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        ids = block.column(id_col)
        order = pc.sort_indices(ids)
        block = block.take(order)
        part = block.column("part")[0].as_py()
        tok_arr = pc.cast(block.column(tokens_col), pa.int64()).combine_chunks()
        tok_null = tok_arr.is_null().to_numpy(zero_copy_only=False)
        tok = tok_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        if tok_null.any():
            # a doc with a NULL token count (NULL text) is UNPACKABLE: it
            # takes no pack slot and must not shift every later doc's pack
            # boundaries — emitted with NULL pack columns, token count kept
            # NULL (SQL null-in/null-out)
            vidx = np.flatnonzero(~tok_null)
            pack_v, pos_v, fill_v = greedy_pack_fold(tok[vidx], budget)
            pack_of = np.zeros(n, np.int64)
            pos = np.zeros(n, np.int64)
            fill = np.zeros(n, np.int64)
            pack_of[vidx], pos[vidx], fill[vidx] = pack_v, pos_v, fill_v
            nn = pa.array(~tok_null)
            i64_null = pa.scalar(None, pa.int64())
            return pa.table({
                id_col: block.column(id_col),
                tokens_col: tok_arr,
                "part": pa.array(np.full(n, part, dtype=np.int64)),
                "pack_id": pc.if_else(nn, pa.array((np.int64(part) << 32) | pack_of), i64_null),
                "pack_pos": pc.if_else(nn, pa.array(pos), i64_null),
                "pack_fill": pc.if_else(nn, pa.array(fill), i64_null),
                "oversize": pc.if_else(nn, pa.array(tok > budget),
                                       pa.scalar(None, pa.bool_())),
            }, schema=out_schema)
        pack_of, pos, fill = greedy_pack_fold(tok, budget)
        return pa.table({
            id_col: block.column(id_col),
            tokens_col: pa.array(tok),
            "part": pa.array(np.full(n, part, dtype=np.int64)),
            "pack_id": pa.array((np.int64(part) << 32) | pack_of),
            "pack_pos": pa.array(pos),
            "pack_fill": pa.array(fill),
            "oversize": pa.array(tok > budget),
        })

    routed = ds.select_columns([id_col, tokens_col]).map_batches(
        add_part, batch_format="pyarrow"
    )
    from .util import widen_blocks

    return widen_blocks(routed).groupby("part").map_groups(
        pack_block, batch_format="pyarrow"
    )


class BpeEncoder:
    """Callable-class actor stage: apply a learned BPE merge table
    (:func:`bpe_train` output rows) to a text column. Merges apply in rank
    order within each word — the standard greedy BPE encode. The
    word → tokens cache lives in the actor (words repeat heavily across a
    corpus; each distinct word encodes once per actor), and the merge table
    itself ships once per actor via the constructor, not per batch.
    """

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text",
                 end_of_word: str = "</w>"):
        # rank order is the list order; pair-lookup by (left, right)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.eow = end_of_word
        self._cache: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        hit = self._cache.get(w)
        if hit is not None:
            return hit
        _bound_cache(self._cache)
        syms = list(w) + [self.eow]
        ranks = self.ranks
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            # merge ALL occurrences of the winning pair left-to-right,
            # matching bpe_train's apply step
            l, r = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        self._cache[w] = syms
        return syms

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, off, _ = _flat_tokens(batch.column(self.text_col))
        words = flat.to_pylist()
        toks_per_doc, counts = [], []
        for r in range(batch.num_rows):
            doc: list[str] = []
            for w in words[off[r] : off[r + 1]]:
                if w:
                    doc.extend(self._encode_word(w))
            toks_per_doc.append(doc)
            counts.append(len(doc))
        out = {n: batch.column(n) for n in batch.column_names if n != self.text_col}
        out["bpe_tokens"] = pa.array(toks_per_doc, pa.list_(pa.string()))
        out["n_bpe_tokens"] = pa.array(counts, pa.int64())
        return pa.table(out)


def bpe_encode(
    ds: ray.data.Dataset,
    merges_ds: ray.data.Dataset,
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Encode a corpus with a learned merge table: the apply-many half of
    the fit-once/apply-many tokenizer pair (:func:`bpe_train` fits). The
    merge table is small by construction (one row per merge) — it collects
    to the driver once and ships to each encoder actor in the constructor,
    the broadcast-small-side pattern."""
    rows = merges_ds.take_all()
    rows.sort(key=lambda r: r["rank"])
    merges = [(r["left"], r["right"]) for r in rows]
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": merges, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def unigram_lm_scores(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    max_vocab: int | None = None,
    oov_count: float = 0.5,
) -> ray.data.Dataset:
    """CCNet-style LM quality scoring with a corpus-trained unigram model
    (Wenzek et al. 2020, public): score every document by the mean
    log-probability of its tokens under the corpus's own unigram
    distribution — low scores flag gibberish/boilerplate, the standard
    perplexity-proxy filter of a pre-training pipeline.

    Scale shape: token counts come from the map-side combiner (raw tokens
    never shuffle); the model is the vocabulary-scale (token, count) table,
    broadcast once via ``ray.put`` — ``max_vocab`` bounds the broadcast by
    (count DESC, token ASC) with a logged truncation, and tokens outside
    the model score as ``oov_count`` pseudo-counts. Scoring is one
    streaming pass: per batch, one vectorized hash-map lookup over the
    flattened token array and a ``reduceat`` mean per document.

    Output: (id, n_tokens, avg_logprob) with avg_logprob rounded to 6
    (empty documents score NULL). With ``max_vocab=None`` the model is
    exact and the SQL replay is a plain UNNEST + join + AVG(LN(...)).
    """
    import logging

    import pandas as pd

    import ray as _ray

    from .aggregates import grouped_agg_fast
    from .util import topk as _topk

    def to_tokens(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t.column(text_col))
        flat = flat.filter(pc.not_equal(pc.utf8_length(flat), 0))
        return pa.table({"token": flat})

    counts = grouped_agg_fast(
        ds.select_columns([text_col]).map_batches(
            to_tokens, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["token"],
        specs=[],
        count_alias="n",
    )
    if max_vocab is not None:
        counts = counts.materialize()
        # the model's denominator stays the FULL corpus token count even
        # when the vocabulary is truncated — retained tokens keep their
        # true unigram probabilities, tail tokens fall to the OOV floor
        total = float(counts.sum("n") or 0)
        full = counts.count()
        counts = _topk(counts, ["n", "token"], k=max_vocab,
                       descending=[True, False])
        if full > max_vocab:
            logging.getLogger(__name__).warning(
                "unigram_lm_scores: vocabulary truncated %d -> %d "
                "(tail tokens score as OOV)", full, max_vocab
            )
        rows = counts.take_all()
    else:
        rows = counts.take_all()
        total = float(sum(r["n"] for r in rows))
    lp = pd.Series(
        {r["token"]: np.log(r["n"] / total) for r in rows}, dtype=np.float64
    )
    oov_lp = float(np.log(oov_count / total)) if total else 0.0
    ref = _ray.put(lp)

    def score(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(id_col, t.schema.field(id_col).type),
            pa.field("n_tokens", pa.int64()),
            pa.field("avg_logprob", pa.float64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        model = _ray.get(ref)
        flat, off, _ = _flat_tokens(t.column(text_col))
        keep = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        toks = pd.Series(flat.to_pylist())
        lps = toks.map(model).to_numpy(dtype=np.float64, na_value=oov_lp)
        lps = np.where(keep, lps, 0.0)
        # utf8_split_whitespace emits at least one (possibly empty-string)
        # slot per document, so offsets are strictly increasing and every
        # reduceat index is in range; empty docs score 0 tokens naturally
        # (their lone empty slot has keep=False)
        assert len(lps) >= t.num_rows
        n_tok = np.add.reduceat(keep.astype(np.int64), off[:-1])
        sums = np.add.reduceat(lps, off[:-1])
        avg = np.where(n_tok > 0, np.round(sums / np.maximum(n_tok, 1), 6), np.nan)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "avg_logprob": pa.array(avg, pa.float64(), from_pandas=True),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def concat_chunk_spans(
    ds: ray.data.Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_partitions: int = 16,
) -> ray.data.Dataset:
    """Concat-and-chunk span assignment: documents are (logically)
    concatenated in ascending id order within each md5-routed partition and
    cut into exact ``budget``-token training chunks, documents SPLITTING
    across chunk boundaries — the packing style GPT-style pretraining uses
    when examples may cross document boundaries (vs :func:`pack_sequences`,
    which never splits a document). Zero-token documents are dropped (they
    occupy no span).

    Because chunk boundaries are pure offset arithmetic over the running
    token cumsum (no close-early rule), the whole operator is one
    vectorized pass per partition and the SQL replay is a plain window
    cumsum — no recursion needed. Output per document: (id, n_tokens,
    part, start_off, chunk_first, chunk_last, chunk_id =
    (part << 32) | chunk_first).
    """
    add_part = _md5_route(id_col, n_partitions)

    def span_block(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(id_col, block.schema.field(id_col).type),
            pa.field(tokens_col, pa.int64()),
            pa.field("part", pa.int64()),
            pa.field("start_off", pa.int64()),
            pa.field("chunk_first", pa.int64()),
            pa.field("chunk_last", pa.int64()),
            pa.field("chunk_id", pa.int64()),
        ])
        if block.num_rows == 0:
            return out_schema.empty_table()
        block = block.take(pc.sort_indices(block.column(id_col)))
        part = block.column("part")[0].as_py()
        tok = pc.cast(block.column(tokens_col), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = tok > 0
        block = block.filter(pa.array(keep))
        tok = tok[keep]
        if len(tok) == 0:
            return out_schema.empty_table()
        end = np.cumsum(tok)
        start = end - tok
        first = start // budget
        last = (end - 1) // budget
        return pa.table({
            id_col: block.column(id_col),
            tokens_col: pa.array(tok),
            "part": pa.array(np.full(len(tok), part, dtype=np.int64)),
            "start_off": pa.array(start),
            "chunk_first": pa.array(first),
            "chunk_last": pa.array(last),
            "chunk_id": pa.array((np.int64(part) << 32) | first),
        })

    from .util import widen_blocks

    routed = ds.select_columns([id_col, tokens_col]).map_batches(
        add_part, batch_format="pyarrow"
    )
    return widen_blocks(routed).groupby("part").map_groups(
        span_block, batch_format="pyarrow"
    )
