"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram-Jaccard verification, embedding-cosine near-dup.

Shapes (all shuffle-aware):
- exact: hash-partition on the key → per-group deterministic first
  (groupby + map_groups; the reference's first-match pairing dedup analog,
  00_audio_data_collection_experiment/audio_quality_assessment.py:86-89)
- MinHash+LSH: signature map (actor pool) → flat_map to band rows →
  groupby(band) emits candidate pairs → pair-level verify vs full signature
  (est. Jaccard) — only bands shuffle, never documents
- SimHash: 64-bit signature → 16-bit band buckets → hamming-verified pairs
- embedding: LSH bucket (random hyperplanes) → within-bucket exact cosine

Candidate-pair groups are capped (``max_group``) so a degenerate band (all
docs identical) cannot produce O(n²) pairs in one task — the cap is logged as
a ``truncated`` flag, never silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

import pyarrow.compute as pc

from ..functions.textfx import (
    band_keys_matrix,
    make_minhash_params,
    ngram_jaccard,
    simhash_batch,
)
from .util import coarse_partitioned, widen_blocks


def dedup_exact(
    ds: ray.data.Dataset, keys: list[str], order_col: str, keep: str = "min"
) -> ray.data.Dataset:
    """Keep exactly one row per key group: the row with min (or max)
    ``order_col`` — deterministic, SQL-oracle-friendly."""

    order = [(k, "ascending") for k in keys] + [
        (order_col, "ascending" if keep == "min" else "descending")
    ]

    def first_per_run(t: pa.Table) -> pa.Table:
        # one vectorized pass per coarse partition: sort (keys, order_col),
        # take each key run's first row — per-group dispatch would cost
        # ~0.2 ms x (distinct keys), corpus-scale for a dedup operator
        n = t.num_rows
        if n == 0:
            return t
        t = t.take(pc.sort_indices(t, sort_keys=order))
        new_run = np.zeros(n, dtype=bool)
        new_run[0] = True
        for kcol in keys:
            arr = t.column(kcol).combine_chunks()
            if pa.types.is_null(arr.type):
                continue  # all-null column: one run
            a, b = arr.slice(1), arr.slice(0, n - 1)
            neq = pc.fill_null(pc.invert(pc.equal(a, b)), True)
            # SQL GROUP BY collapses NULL keys into ONE group — adjacent
            # null-vs-null is not a run boundary (equal() yields null
            # there, which fill_null(True) alone would wrongly split)
            neq = pc.and_(neq, pc.invert(
                pc.and_(pc.is_null(a), pc.is_null(b))))
            new_run[1:] |= np.asarray(
                neq.to_numpy(zero_copy_only=False), dtype=bool
            )
        return t.take(pa.array(np.flatnonzero(new_run), pa.int64()))

    return coarse_partitioned(ds, keys, first_per_run)


def _mat_to_binary(m: np.ndarray) -> pa.LargeBinaryArray:
    """(n, num_perm) int64 signature matrix → large_binary column (one
    512-byte row each for num_perm=64) — zero-copy both ways, and a type
    Acero hash joins accept as payload (fixed_size_list is not)."""
    n, width = m.shape
    data = np.ascontiguousarray(m.astype(np.int64, copy=False)).tobytes()
    offs = (np.arange(n + 1, dtype=np.int64) * (width * 8)).tobytes()
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(data)]
    )


def _binary_to_mat(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """large_binary signature column (uniform row width) → (n, num_perm)
    int64 matrix, zero-copy from the Arrow buffers."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.int64)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    width = int(off[1] - off[0])
    return data[off[0] : off[-1]].view(np.int64).reshape(n, width // 8)


class _MinHasher:
    """Actor: text → minhash signature (permutation params built once)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, shingle_k: int, seed: int):
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.a, self.b = make_minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textfx import minhash_signatures_batch

        txt = batch.column(self.text_col).combine_chunks()
        if txt.null_count:
            # NULL text has NO shingles: it gets no signature and joins no
            # band (the ''-fill fallback would give every NULL doc the same
            # padded-space shingle and band all of them together as
            # jaccard-1 "near-dups" of each other)
            batch = batch.filter(txt.is_valid())
        sigs = minhash_signatures_batch(
            batch.column(self.text_col), self.a, self.b, self.shingle_k
        ).view(np.int64)
        return pa.table(
            {self.id_col: batch.column(self.id_col), "sig": _mat_to_binary(sigs)}
        )


def minhash_signatures(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    return ds.map_batches(
        _MinHasher,
        fn_constructor_args=(text_col, id_col, num_perm, shingle_k, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
        concurrency=concurrency,
    )


def _prefix_prune_bound(num_perm: int, prefix: int, threshold: float) -> int:
    """Min prefix-agreement a pair can have and still possibly meet the
    full-signature threshold: agree_full >= ceil(threshold*num_perm) and the
    non-prefix part contributes at most (num_perm - prefix) agreements, so
    prefix_agree >= min_agree_full - (num_perm - prefix). A bound < 1 means
    the prefix cannot prune anything (every pair passes) — caller falls back
    to shipping the full signature. EXACT: never drops a qualifying pair."""
    min_agree_full = int(np.ceil(threshold * num_perm - 1e-9))
    return min_agree_full - (num_perm - prefix)


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    max_group: int = 1000,
    sig_prefix: int | str | None = None,
    verify_broadcast_pairs: int = 100_000,
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    LSH banding: b=16, r=4 over 64 perms → the S-curve crosses ~0.5 around
    J≈(1/b)^(1/r)≈0.5, so J>=0.8 pairs are caught with high probability.

    Shuffle-byte strategy (the ×bands duplication trade, NOTES #3):

    - **prefix path** (``sig_prefix="auto"`` or an int): band rows carry only
      a signature PREFIX (e.g. 16 of 64 perms). Each band group prunes pairs
      with the EXACT bound from :func:`_prefix_prune_bound` — a pair whose
      prefix agreement is below it cannot meet the full threshold even if
      every non-prefix perm agrees, so the prune has zero false negatives.
      Survivors (a tiny fraction: random pairs agree on ~0 perms) are
      verified against full signatures — via a broadcast sig lookup when the
      survivor set is bounded (≤ ``verify_broadcast_pairs``; zero extra
      shuffles), else via two distributed ``bucket_hash_join``s (no driver
      collect). Band-shuffle bytes drop ~(num_perm/prefix)× at the cost of
      fetching full sigs for the few survivors.
    - **full path** (default; also the fallback when the bound can't prune):
      band rows carry the full signature and each band group thresholds
      in-band — the id-only alternative (NO pruning before a re-join) emits
      ALL C(g,2) in-band pairs and explodes on clustered corpora (measured
      in round 2, reverted).

    Either way only (band, id, sig-or-prefix) rows shuffle, never documents,
    and the two paths produce IDENTICAL output (pinned in pytest). Default
    is the full path: the prefix path cuts band-shuffle bytes ~2× at
    threshold 0.7 (~3.8× at 0.8) but adds two pipeline barriers (sig + pair
    materialization), which dominate on a single node — flip to "auto" when
    the band shuffle is network-bound (large clusters, big corpora).
    """
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, shingle_k, seed)

    if sig_prefix == "auto":
        sig_prefix = next(
            (p for p in (num_perm // 4, num_perm // 2)
             if p >= 1 and _prefix_prune_bound(num_perm, p, threshold) >= 1),
            None,
        )
    prefix = int(sig_prefix) if sig_prefix else 0
    use_prefix = bool(prefix) and 0 < prefix < num_perm \
        and _prefix_prune_bound(num_perm, prefix, threshold) >= 1
    if use_prefix:
        # the sig table feeds three consumers (banding + two verify joins);
        # without pinning, each lazy consumer recomputes the whole signature
        # pipeline. One (id, sig) row per doc — the natural checkpoint
        # artifact of minhash dedup (at extreme scale, write_parquet it).
        sigs = sigs.materialize()

    def to_bands(batch: pa.Table):
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sg = _binary_to_mat(batch.column("sig"))
        bkeys = band_keys_matrix(sg.view(np.uint64), bands)
        rep = np.repeat(np.arange(len(ids)), bands)
        ship = sg[rep][:, :prefix] if use_prefix else sg[rep]
        return pa.table(
            {
                "band": pa.array(bkeys.ravel(), pa.int64()),
                id_col: pa.array(np.repeat(ids, bands), pa.int64()),
                "sig": _mat_to_binary(ship),
            }
        )

    banded = sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def _group_prep(group: pa.Table):
        n = group.num_rows
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sg = _binary_to_mat(group.column("sig"))
        order = np.argsort(ids, kind="stable")
        truncated = n > max_group
        order = order[:max_group]
        ids, sg = ids[order], sg[order]
        # dedupe identical doc ids within the band group
        keep = np.concatenate(([True], ids[1:] != ids[:-1]))
        return ids[keep], sg[keep], truncated

    if use_prefix:
        min_prefix_agree = _prefix_prune_bound(num_perm, prefix, threshold)

        def candidates_prefix(group: pa.Table) -> pa.Table:
            ids, sg, truncated = _group_prep(group)
            g = len(ids)
            empty = pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "trunc": pa.array([], pa.int64()),
                }
            )
            if g < 2:
                return empty
            agree = (sg[:, None, :] == sg[None, :, :]).sum(axis=2)
            iu, ju = np.triu_indices(g, k=1)
            m = agree[iu, ju] >= min_prefix_agree
            return pa.table(
                {
                    "id_a": pa.array(ids[iu[m]], pa.int64()),
                    "id_b": pa.array(ids[ju[m]], pa.int64()),
                    "trunc": pa.array(
                        np.full(int(m.sum()), int(truncated), dtype=np.int64), pa.int64()
                    ),
                }
            )

        cand = widen_blocks(banded).groupby("band").map_groups(candidates_prefix, batch_format="pyarrow")
        # same pair from multiple bands → one verify each; truncated = any band
        # (materialized: pair-bounded, and the verify joins' schema inference
        # would otherwise re-run the band shuffle)
        cand = dedup_exact(cand, ["id_a", "id_b"], order_col="trunc", keep="max").materialize()

        def _verify_table(t: pa.Table) -> pa.Table:
            """(id_a, id_b, trunc, sig_a, sig_b) rows → thresholded pairs."""
            if t.num_rows == 0:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "est_jaccard": pa.array([], pa.float64()),
                        "truncated": pa.array([], pa.bool_()),
                    }
                )
            sa = _binary_to_mat(t.column("sig_a"))
            sb = _binary_to_mat(t.column("sig_b"))
            jac = (sa == sb).mean(axis=1)
            keep = jac >= threshold
            tr = t.column("trunc").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "id_a": t.column("id_a").filter(pa.array(keep)),
                    "id_b": t.column("id_b").filter(pa.array(keep)),
                    "est_jaccard": pa.array(jac[keep], pa.float64()),
                    "truncated": pa.array(tr[keep] > 0, pa.bool_()),
                }
            )

        n_cand = cand.count()
        if n_cand <= verify_broadcast_pairs:
            # common case: few survivors → broadcast their sigs (bounded by
            # 2×n_cand rows, filtered out of the sig table with one scan) and
            # verify inside a map — zero extra shuffles
            import ray as _ray

            from .joins import broadcast_semi_join

            cand_ids_t = pa.concat_tables(
                list(cand.iter_batches(batch_format="pyarrow", batch_size=None))
            ) if n_cand else pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64())})
            uniq = pa.table({
                id_col: pc.unique(pa.chunked_array(
                    [cand_ids_t.column("id_a"), cand_ids_t.column("id_b")]
                ).combine_chunks())
            })
            sig_sub = pa.concat_tables(list(
                broadcast_semi_join(sigs, uniq, key=id_col)
                .iter_batches(batch_format="pyarrow", batch_size=None)
            )) if n_cand else None
            if sig_sub is None or sig_sub.num_rows == 0:
                return cand.map_batches(
                    lambda t: _verify_table(t.slice(0, 0).append_column(
                        "sig_a", pa.array([], pa.large_binary())).append_column(
                        "sig_b", pa.array([], pa.large_binary()))),
                    batch_format="pyarrow",
                )
            lut_ids = sig_sub.column(id_col).to_numpy(zero_copy_only=False)
            lut_mat = _binary_to_mat(sig_sub.column("sig"))
            order = np.argsort(lut_ids, kind="stable")
            ref = _ray.put((lut_ids[order], lut_mat[order]))

            def verify_bcast(t: pa.Table) -> pa.Table:
                ids_sorted, mat = _ray.get(ref)
                ia = t.column("id_a").to_numpy(zero_copy_only=False)
                ib = t.column("id_b").to_numpy(zero_copy_only=False)
                pa_idx = np.searchsorted(ids_sorted, ia)
                pb_idx = np.searchsorted(ids_sorted, ib)
                t2 = pa.table(
                    {
                        "id_a": t.column("id_a"),
                        "id_b": t.column("id_b"),
                        "trunc": t.column("trunc"),
                        "sig_a": _mat_to_binary(mat[pa_idx]),
                        "sig_b": _mat_to_binary(mat[pb_idx]),
                    }
                )
                return _verify_table(t2)

            return cand.map_batches(verify_bcast, batch_format="pyarrow",
                                    zero_copy_batch=True)

        # scale path: survivor set too large to broadcast → two distributed
        # bucket joins ship full sigs only for candidate ids
        from .joins import bucket_hash_join

        sig_a = sigs.map_batches(
            lambda t: pa.table({"__ia": t.column(id_col), "sig_a": t.column("sig")}),
            batch_format="pyarrow",
        )
        sig_b = sigs.map_batches(
            lambda t: pa.table({"__ib": t.column(id_col), "sig_b": t.column("sig")}),
            batch_format="pyarrow",
        )
        joined = bucket_hash_join(cand, sig_a, on="id_a", right_on="__ia")
        joined = bucket_hash_join(joined, sig_b, on="id_b", right_on="__ib")
        return joined.map_batches(_verify_table, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def candidates(group: pa.Table) -> pa.Table:
        ids, sg, truncated = _group_prep(group)
        g = len(ids)
        if g < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                    "truncated": pa.array([], pa.bool_()),
                }
            )
        # vectorized pairwise signature agreement, thresholded IN-BAND
        eq = (sg[:, None, :] == sg[None, :, :]).mean(axis=2)
        iu, ju = np.triu_indices(g, k=1)
        jac = eq[iu, ju]
        m = jac >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[iu[m]], pa.int64()),
                "id_b": pa.array(ids[ju[m]], pa.int64()),
                "est_jaccard": pa.array(jac[m], pa.float64()),
                "truncated": pa.array(np.full(int(m.sum()), truncated), pa.bool_()),
            }
        )

    pairs = widen_blocks(banded).groupby("band").map_groups(candidates, batch_format="pyarrow")
    # same pair can surface from multiple bands → dedup on (id_a, id_b).
    # Order by TRUNCATED (any-band semantics, matching the prefix path):
    # est_jaccard is identical across a pair's bands (computed from the
    # full signature), so ordering by it left the surviving row's
    # truncated flag to shuffle arrival order — nondeterministic.
    return dedup_exact(pairs, ["id_a", "id_b"], order_col="truncated",
                       keep="max")


def minhash_dedup_verified(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    est_threshold: float = 0.6,
    exact_threshold: float = 0.8,
    shingle_k: int = 5,
    max_candidates: int = 100_000,
    **minhash_kwargs,
) -> ray.data.Dataset:
    """MinHash candidates verified with EXACT n-gram Jaccard.

    LSH recalls candidates cheaply (est_threshold is set below the exact
    threshold so the S-curve doesn't drop true pairs); only the candidate
    documents' texts — a tiny fraction of the corpus — are fetched for the
    exact verification pass. This is the standard sketch-then-verify
    near-dup shape for 100 TB corpora.

    The per-band ``max_group`` cap bounds each task. ``max_candidates``
    is NOT a truncation cap: at or below it the candidate ids are
    collected and the texts broadcast (one object-store put, zero
    shuffles — the fast path for the normal case where near-dup pairs
    are a tiny corpus fraction); ABOVE it the pair stream never touches
    the driver — the texts are fetched with two distributed
    :func:`~.joins.bucket_hash_join` passes (pairs ⋈ texts on id_a, then
    id_b — the same exchange the signature-prefix verify path uses at
    :func:`minhash_dedup_pairs` ``sig_prefix`` handling) and verified
    in place. Both routes verify EVERY candidate; output is identical.
    """
    import ray as _ray

    pairs = minhash_dedup_pairs(
        ds, id_col, text_col, threshold=est_threshold, shingle_k=shingle_k, **minhash_kwargs
    ).materialize()  # candidate stream is re-read by count + verify; pin it
    n_cand = pairs.count()
    if n_cand == 0:
        return pairs.filter(expr="est_jaccard > 2.0")  # empty, schema-stable

    def verify_cols(batch: pa.Table, ta: list, tb: list) -> pa.Table:
        exact = [ngram_jaccard(a or "", b or "", shingle_k) for a, b in zip(ta, tb)]
        out = batch.append_column("exact_jaccard", pa.array(exact, pa.float64()))
        return out.filter(pc.greater_equal(out.column("exact_jaccard"), exact_threshold))

    if n_cand <= max_candidates:
        # fast path: candidate id set is driver-bounded; broadcast the texts
        from .joins import broadcast_semi_join

        pair_t = pairs.take_all()
        cand_ids = sorted({r["id_a"] for r in pair_t} | {r["id_b"] for r in pair_t})
        texts_t = pa.concat_tables(
            list(
                broadcast_semi_join(ds, pa.table({id_col: pa.array(cand_ids, pa.int64())}), key=id_col)
                .select_columns([id_col, text_col])
                .iter_batches(batch_format="pyarrow", batch_size=None)
            )
        )
        text_map = dict(zip(texts_t.column(id_col).to_pylist(), texts_t.column(text_col).to_pylist()))
        ref = _ray.put(text_map)

        def verify(batch: pa.Table) -> pa.Table:
            tm = _ray.get(ref)
            ia = batch.column("id_a").to_pylist()
            ib = batch.column("id_b").to_pylist()
            return verify_cols(batch, [tm.get(a, "") for a in ia],
                               [tm.get(b, "") for b in ib])

        return pairs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)

    # distributed path: texts joined to the pair stream, nothing on the driver
    from .joins import bucket_hash_join

    texts = ds.select_columns([id_col, text_col])
    ta = texts.map_batches(lambda t: t.rename_columns(["__ia", "__ta"]),
                           batch_format="pyarrow", zero_copy_batch=True)
    tb = texts.map_batches(lambda t: t.rename_columns(["__ib", "__tb"]),
                           batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_hash_join(pairs, ta, on="id_a", right_on="__ia")
    joined = bucket_hash_join(joined, tb, on="id_b", right_on="__ib")

    def verify_joined(batch: pa.Table) -> pa.Table:
        ta_v = batch.column("__ta").to_pylist()
        tb_v = batch.column("__tb").to_pylist()
        return verify_cols(batch.drop_columns(["__ta", "__tb"]), ta_v, tb_v)

    return joined.map_batches(verify_joined, batch_format="pyarrow", zero_copy_batch=True)


def hamming_dedup_pairs(
    sigs: ray.data.Dataset,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
    bands: int | None = None,
    max_group: int = 1000,
) -> ray.data.Dataset:
    """Near-dup pairs over any 64-bit signature column (SimHash, perceptual
    phash, ...): band-bucket candidates, hamming-verified — only (band, id,
    sig) rows shuffle, never payloads.

    ``bands`` defaults to the smallest power-of-two divisor of 64 above
    ``max_hamming`` so any pair within the hamming budget shares at least one
    exact band (pigeonhole) — guaranteed recall, verification prunes the
    rest."""
    if bands is None:
        bands = next(b for b in (1, 2, 4, 8, 16, 32) if b > max_hamming)
    elif bands <= max_hamming:
        # pigeonhole requires MORE bands than differing bits — fewer would
        # silently drop true near-dup pairs (a pair may differ in every band)
        raise ValueError(
            f"bands={bands} <= max_hamming={max_hamming} voids the pigeonhole "
            f"recall guarantee; pass bands > max_hamming (or bands=None)"
        )

    def to_bands(batch: pa.Table) -> pa.Table:
        # vectorized over rows (matches functions.textfx.simhash_bands):
        # band key = (band_idx << 48) | the band's 64/bands-bit slice
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hs = batch.column(sig_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u = hs.view(np.uint64)
        n = len(ids)
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        keys = np.empty((n, bands), dtype=np.uint64)
        for bi in range(bands):
            keys[:, bi] = np.uint64(bi << 48) | ((u >> np.uint64(bi * width)) & mask)
        return pa.table(
            {
                "band": pa.array(keys.ravel().view(np.int64), pa.int64()),
                id_col: pa.array(np.repeat(ids, bands), pa.int64()),
                sig_col: pa.array(np.repeat(hs, bands), pa.int64()),
            }
        )

    banded = sigs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def candidates(group: pa.Table) -> pa.Table:
        # vectorized pairwise hamming: xor + byte-level popcount
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        hs = group.column(sig_col).to_numpy(zero_copy_only=False).astype(np.int64)
        truncated = len(ids) > max_group  # module contract: caps are FLAGGED
        order = np.argsort(ids, kind="stable")[:max_group]
        ids, u = ids[order], hs[order].view(np.uint64)
        g = len(ids)
        if g < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                    "truncated": pa.array([], pa.bool_()),
                }
            )
        iu, ju = np.triu_indices(g, k=1)
        xor = (u[iu] ^ u[ju]).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(xor, axis=1).sum(axis=1).astype(np.int64)
        m = (ham <= max_hamming) & (ids[iu] != ids[ju])
        return pa.table(
            {
                "id_a": pa.array(ids[iu[m]], pa.int64()),
                "id_b": pa.array(ids[ju[m]], pa.int64()),
                "hamming": pa.array(ham[m], pa.int64()),
                "truncated": pa.array(np.full(int(m.sum()), truncated), pa.bool_()),
            }
        )

    pairs = widen_blocks(banded).groupby("band").map_groups(candidates, batch_format="pyarrow")
    # hamming is constant per pair (same signatures in every band), so
    # ordering by truncated gives any-band flag semantics without touching
    # the surviving distance value (same pattern as minhash_dedup_pairs)
    return dedup_exact(pairs, ["id_a", "id_b"], order_col="truncated", keep="max")


def simhash_dedup_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int | None = None,
    max_group: int = 1000,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: signatures (columnar kernel, actor-cached
    token hashes) → :func:`hamming_dedup_pairs` banding."""

    class _SimHasher:
        """Actor fn: per-actor token→md5 cache feeds the columnar kernel."""

        def __init__(self):
            self.cache: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "simhash": pa.array(
                        simhash_batch(batch.column(text_col), self.cache), pa.int64()
                    ),
                }
            )

    sigs = ds.map_batches(
        _SimHasher, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    return hamming_dedup_pairs(
        sigs, id_col, "simhash", max_hamming=max_hamming, bands=bands, max_group=max_group
    )


def connected_components(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """Near-dup pair list → cluster assignment (id, cluster) by min-label
    propagation — the standard fuzzy-dedup endgame (candidate pairs →
    connected components → keep one representative per component).

    Hybrid execution: when the edge list is provably small
    (≤ ``driver_threshold`` edges — it is pair-bounded, never corpus-
    bounded), a driver union-find resolves it in one pass; larger graphs
    run the DISTRIBUTED loop, where each iteration sends every node's label
    to its neighbors (one ``bucket_hash_join`` of edges against labels) and
    takes grouped minima. Labels only decrease, so the global label SUM is
    a monotone convergence witness: when it stops changing the fixpoint is
    reached — no change-detection join. Diameter-bounded iterations
    (``max_iter`` is a backstop, logged if hit). Both paths produce the
    identical min-id-per-component labeling (property-tested against
    serial union-find).
    """
    import logging

    from ray.data.aggregate import Sum

    from .aggregates import grouped_agg_fast
    from .joins import bucket_hash_join

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False)
        b = t.column(id_b).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()  # reused every iteration; edge list is pair-sized
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
        )
    if n_edges <= driver_threshold:
        # provably-small graph: one driver pass beats ~diameter x 2 shuffles
        import ray.data as _rd

        et = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow", batch_size=None)))
        src = et.column("src").to_numpy(zero_copy_only=False)
        dst = et.column("dst").to_numpy(zero_copy_only=False)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(src.tolist(), dst.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = sorted(parent)
        labels = [find(n) for n in nodes]
        return _rd.from_arrow(
            pa.table({"id": pa.array(nodes, pa.int64()), "cluster": pa.array(labels, pa.int64())})
        )

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src"), "label": t.column("src")})

    labels = grouped_agg_fast(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        keys=["node"], specs=[("label", "label", "min")],
    ).materialize()
    prev_sum = None
    for it in range(max_iter):
        # neighbor messages: (dst, neighbor's current label)
        lab_src = labels.map_batches(
            lambda t: pa.table({"src": t.column("node"), "nlabel": t.column("label")}),
            batch_format="pyarrow",
        )
        # bucket join (union + per-bucket Acero): the native hash join
        # rejects the schema-less empty blocks the loop's aggregates emit
        msgs = bucket_hash_join(edges, lab_src, on="src", num_buckets=8).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("nlabel")}),
            batch_format="pyarrow",
        )
        combined = msgs.union(
            labels.map_batches(lambda t: t.select(["node", "label"]), batch_format="pyarrow")
        )
        labels = grouped_agg_fast(
            combined, keys=["node"], specs=[("label", "label", "min")]
        ).materialize()
        total = labels.aggregate(Sum(on="label"))["sum(label)"]
        if total == prev_sum:
            break
        prev_sum = total
    else:
        logging.getLogger(__name__).warning(
            "connected_components: label propagation hit max_iter=%d before the "
            "convergence witness settled — component diameter exceeds the budget",
            max_iter,
        )
    return labels.map_batches(
        lambda t: pa.table({"id": t.column("node"), "cluster": t.column("label")}),
        batch_format="pyarrow",
    )


def distributed_anti_join(
    ds: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key: str,
    keys_col: str | None = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """EXACT anti-join without materializing the key set anywhere: both sides
    hash-bucket on the key (one shuffle), each bucket drops its left rows
    whose key appears in its right slice (``pc.is_in`` per bucket). The key
    set may be corpus-scale — no driver collect, no broadcast; per-task
    memory is one bucket of each side."""
    from .util import arrow_schema_of

    kc = keys_col or key
    ds, lschema = arrow_schema_of(ds)
    key_type = lschema.types[lschema.names.index(key)]
    union_names = list(lschema.names) + ["__side", "__bucket"]

    from .util import key_bucketer

    bucket_of = key_bucketer(key_type, num_buckets)

    def prep_left(t: pa.Table) -> pa.Table:
        out = {n: t.column(n) for n in lschema.names}
        out["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        out["__bucket"] = bucket_of(t.column(key))
        return pa.table({n: out[n] for n in union_names})

    def prep_right(t: pa.Table) -> pa.Table:
        out = {}
        for n, typ in zip(lschema.names, lschema.types):
            out[n] = t.column(kc).cast(key_type) if n == key else pa.nulls(t.num_rows, typ)
        out["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        out["__bucket"] = bucket_of(t.column(kc))
        return pa.table({n: out[n] for n in union_names})

    lt = ds.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = keys_ds.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)
    out_names = list(lschema.names)

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 1)
        lpart = group.filter(lmask).select(out_names)
        rkeys = pc.unique(group.filter(pc.invert(lmask)).column(key).combine_chunks())
        if len(rkeys) == 0:
            return lpart
        hit = pc.is_in(lpart.column(key), value_set=rkeys)
        return lpart.filter(pc.invert(hit))

    return widen_blocks(lt.union(rt)).groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def dedup_keep_representatives(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_threshold: int = 100_000,
) -> ray.data.Dataset:
    """Fuzzy-dedup KEEP step: drop every row that belongs to a near-dup
    component but is not its min-id representative. Rows in no component
    pass through untouched (they never enter the label table, so only
    component membership — pair-bounded, never corpus-bounded — shuffles).

    The drop-id set is applied through :func:`distributed_anti_join` when it
    exceeds ``broadcast_threshold`` ids — at a 100 TB corpus with a high dup
    rate the drop set is corpus-scale, so it must never be collected or
    broadcast; small sets take the cheaper broadcast path (one count chooses).
    """
    comps = connected_components(pairs, id_a, id_b)

    def drop_ids(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("id"), t.column("cluster"))
        return pa.table({"drop_id": t.column("id").filter(keep)})

    to_drop = comps.map_batches(drop_ids, batch_format="pyarrow", zero_copy_batch=True)
    n_drop = to_drop.count()
    if n_drop > broadcast_threshold:
        return distributed_anti_join(ds, to_drop, key=id_col, keys_col="drop_id")
    drop_vals = to_drop.unique("drop_id") if n_drop else []
    drop_t = pa.table({id_col: pa.array(sorted(drop_vals), pa.int64())})
    from .joins import broadcast_semi_join

    return broadcast_semi_join(ds, drop_t, key=id_col, anti=True)


def embedding_dedup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    max_group: int = 2000,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via hyperplane-LSH bucketing + exact
    within-bucket cosine (float64)."""
    from .similarity import (_drop_null_embeddings, _hyperplanes, _normalize,
                             _stack_embeddings, lsh_bucket_ids)

    planes_holder: dict[int, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        # NULL embedding → no cosine → never a near-dup pair (SQL: a NULL
        # similarity passes no threshold); drop the row with its id
        batch = _drop_null_embeddings(batch, emb_col)
        if batch.num_rows == 0:
            return pa.table({
                id_col: batch.column(id_col),
                emb_col: batch.column(emb_col),
                "bucket": pa.array([], pa.int64()),
            })
        emb = _normalize(_stack_embeddings(batch.column(emb_col)))
        if not planes_holder:
            planes_holder[0] = _hyperplanes(emb.shape[1], n_planes, seed)
        buckets = lsh_bucket_ids(emb, planes_holder[0])
        return pa.table(
            {
                id_col: batch.column(id_col),
                emb_col: batch.column(emb_col),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def candidates(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        emb = _normalize(_stack_embeddings(group.column(emb_col)))
        truncated = len(ids) > max_group  # module contract: caps are FLAGGED
        order = np.argsort(ids, kind="stable")[:max_group]
        ids, emb = ids[order], emb[order]
        sims = emb @ emb.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[iu[mask]].astype(np.int64), pa.int64()),
                "id_b": pa.array(ids[ju[mask]].astype(np.int64), pa.int64()),
                "cosine": pa.array(sims[iu, ju][mask].astype(np.float64), pa.float64()),
                "truncated": pa.array(np.full(int(mask.sum()), truncated), pa.bool_()),
            }
        )

    pairs = widen_blocks(bucketed).groupby("bucket").map_groups(candidates, batch_format="pyarrow")
    # cosine is constant per pair across buckets → order by truncated for
    # any-bucket flag semantics (minhash pattern); value unchanged
    return dedup_exact(pairs, ["id_a", "id_b"], order_col="truncated", keep="max")


def substring_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str = "text",
    window: int = 8,
    max_group: int = 200,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Exact substring-overlap pairs: documents sharing at least one FULL
    ``window``-token n-gram, scored by the number of DISTINCT shared n-gram
    hashes — the n-gram-bucket formulation of exact-substring training-data
    dedup (the suffix-array method's distributed-friendly sibling), and the
    doc↔doc counterpart of the benchmark-decontamination scan
    (``stages.text.decontaminate``).

    Shape: one pass emits each doc's DISTINCT window hashes (md5-prefix
    token hashes, base-1000003 polynomial fold mod 2^63 — the exact kernel a
    DuckDB oracle replays), so only ``(hash, id)`` rows ever shuffle, never
    texts; a coarse hash-partitioned exchange co-locates equal hashes and
    emits in-run pairs (runs capped at ``max_group`` ids, deterministic by
    sorted id — a boilerplate n-gram shared by the whole corpus cannot
    produce O(n²) pairs in one task); a partial+final grouped count then
    folds duplicate (pair, hash) rows into ``n_shared``.

    Output: ``(id_a, id_b, n_shared)`` with ``id_a < id_b``.
    """
    from ..functions.textfx import _token_hash_stream, _window_fold

    def emit_hashes(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"wh": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        stream = _token_hash_stream(batch.column(text_col))
        if stream is None:
            return empty
        h, starts, counts = stream
        if len(h) < window:
            return empty
        acc = _window_fold(h, window)
        long_rows = np.flatnonzero(counts >= window)
        if not len(long_rows):
            return empty
        seg_start = starts[long_rows]
        seg_len = counts[long_rows] - window + 1
        ends = np.cumsum(seg_len)
        offs = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(ends - seg_len, seg_len)
        flat_pos = np.repeat(seg_start, seg_len) + offs
        wh = acc[flat_pos].view(np.int64)
        doc = ids[np.repeat(long_rows, seg_len)]
        # per-doc distinct hashes: lexsort then first-occurrence mask
        order = np.lexsort((wh, doc))
        d2, w2 = doc[order], wh[order]
        first = np.concatenate(([True], (d2[1:] != d2[:-1]) | (w2[1:] != w2[:-1])))
        return pa.table({"wh": pa.array(w2[first], pa.int64()),
                         id_col: pa.array(d2[first], pa.int64())})

    hashes = ds.map_batches(emit_hashes, batch_format="pyarrow", zero_copy_batch=True)

    def in_run_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        n = t.num_rows
        if n < 2:
            return empty
        wh = t.column("wh").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, wh))
        wh, ids = wh[order], ids[order]
        bounds = np.concatenate(([0], np.flatnonzero(wh[1:] != wh[:-1]) + 1, [n]))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # only runs of a SHARED hash (length >= 2) survive — loops over the
        # duplicated-gram runs only, each pair block fully vectorized
        for i in range(len(bounds) - 1):
            g = int(bounds[i + 1] - bounds[i])
            if g < 2:
                continue
            run_ids = ids[bounds[i] : bounds[i] + min(g, max_group)]
            iu, ju = np.triu_indices(len(run_ids), k=1)
            out_a.append(run_ids[iu])
            out_b.append(run_ids[ju])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    pairs = coarse_partitioned(hashes, "wh", in_run_pairs, n_partitions=n_partitions)
    from .aggregates import grouped_agg_fast

    return grouped_agg_fast(pairs, keys=["id_a", "id_b"], specs=[], count_alias="n_shared")


def consecutive_neardup_flags(
    ds: ray.data.Dataset,
    key: str = "image_id",
    ts: str = "ts",
    hash_col: str = "phash",
    max_hamming: int = 3,
    n_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-entity CONSECUTIVE near-duplicate detection: flag each version
    whose perceptual hash is within ``max_hamming`` bits of the entity's
    previous version — the cheap 'did this upload actually change anything'
    filter a versioned image corpus runs before the expensive all-pairs
    banded dedup (reference analog: frame-to-frame continuity deltas,
    SURVEY §2.4 Q3, recast over version timelines).

    One entity-hash shuffle; each partition lexsorts once and XOR+popcounts
    the segment-shifted 64-bit hash lane (uint8-view bit twiddling, no
    per-row Python). First version per entity → hamming NULL, flag false.
    """

    def vector_block(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(key, block.schema.field(key).type),
            pa.field(ts, pa.timestamp("us")),
            pa.field(hash_col, pa.int64()),
            pa.field("prev_hamming", pa.int64()),
            pa.field("is_consecutive_neardup", pa.bool_()),
        ])
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        g = block.column(key).combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # normalize the timestamp UNIT first: a ns- or s-unit input cast
        # straight to int64 would be reinterpreted as us downstream
        tcol = block.column(ts)
        if pa.types.is_timestamp(tcol.type):
            tcol = tcol.cast(pa.timestamp("us", tz=tcol.type.tz), safe=False)
        tsv = tcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((tsv, g))
        g = g[order]
        tsv = tsv[order]
        h = block.column(hash_col).to_numpy(zero_copy_only=False).astype(np.int64)[order]
        hu = h.view(np.uint64)
        same = np.empty(n, dtype=bool)
        same[0] = False
        same[1:] = g[1:] == g[:-1]
        x = np.zeros(n, dtype=np.uint64)
        x[1:] = hu[1:] ^ hu[:-1]
        # popcount via uint8 view + per-byte bit-count LUT
        lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
        ham = lut[x.view(np.uint8).reshape(n, 8)].sum(1).astype(np.int64)
        flag = same & (ham <= max_hamming)
        ham_f = np.where(same, ham.astype(np.float64), np.nan)  # NaN → Arrow null
        return pa.table({
            key: block.column(key).take(pa.array(order, pa.int64())),
            ts: pa.array(tsv.astype("datetime64[us]")),
            hash_col: pa.array(h, pa.int64()),
            "prev_hamming": pa.array(ham_f, pa.float64(), from_pandas=True).cast(pa.int64()),
            "is_consecutive_neardup": pa.array(flag),
        }, schema=out_schema)

    return coarse_partitioned(ds.select_columns([key, ts, hash_col]), key,
                              vector_block, n_partitions=n_partitions)


def semantic_dedup(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 16,
    iters: int = 8,
    threshold: float = 0.95,
    max_group: int = 100_000,
    chunk: int = 1024,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embedding space, then drop any row whose cosine to a
    LOWER-id row in the same cluster is ≥ ``threshold``. Keeping the lowest
    id per near-dup neighborhood is deterministic and cluster-size-invariant
    (the paper keeps the point farthest from the centroid; a fixed id rule
    replays identically across partitionings, which is what the gate hashes).

    Scale shape: Lloyd k-means (:func:`~.decomp.kmeans` — broadcast
    centroids, k×d packed partials per block) never shuffles the vectors;
    cluster assignment is recomputed inline from the broadcast centroids so
    the vectors cross the wire exactly once, in the cluster groupby. Within
    a cluster the pairwise test runs in ``chunk``-row Gram slabs against the
    strictly-lower-id prefix, so per-task memory is
    O(chunk × cluster_size), never O(cluster_size²) at once; clusters above
    ``max_group`` rows are truncated by ascending id with a ``truncated``
    flag (same contract as :func:`embedding_dedup_pairs`). Output:
    (id, cluster, keep, max_prior_sim, truncated) — filter ``keep`` for the
    surviving corpus.

    Reference analog: the quality-gated keep/drop pass of
    00_audio_data_collection_experiment/audio_quality_assessment.py:86-89,
    recast over embedding geometry instead of per-file heuristics.
    """
    from .decomp import kmeans
    from .similarity import _drop_null_embeddings, _normalize, _stack_embeddings

    import ray as _ray

    # SQL null exclusion: a row with a NULL embedding has no geometry to
    # dedup on — it is excluded (with its id) from clustering AND from the
    # output (kmeans applies the same filter internally; no-op clean data)
    base = ds.select_columns([id_col, emb_col]).map_batches(
        lambda t: _drop_null_embeddings(t, emb_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    _, cent = kmeans(base, emb_col, id_col, k=k, iters=iters)
    cref = _ray.put(cent)  # raw centroids: assignment must replay kmeans' own
    # euclidean argmin rule, not a cosine variant

    def assign(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(id_col, t.schema.field(id_col).type),
            pa.field(emb_col, t.schema.field(emb_col).type),
            pa.field("cluster", pa.int64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        craw = _ray.get(cref)
        m_raw = _stack_embeddings(t.column(emb_col))
        d2 = (m_raw * m_raw).sum(axis=1)[:, None] \
            - 2.0 * (m_raw @ craw.T) + (craw * craw).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        return pa.table({
            id_col: t.column(id_col),
            emb_col: t.column(emb_col),
            "cluster": pa.array(a.astype(np.int64)),
        })

    clustered = base.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def per_cluster(group: pa.Table) -> pa.Table:
        ids_all = group.column(id_col).to_numpy(zero_copy_only=False)
        order_all = np.argsort(ids_all, kind="stable")
        truncated = len(ids_all) > max_group
        order = order_all[:max_group]
        ids = ids_all[order]
        emb = _normalize(_stack_embeddings(group.column(emb_col)))[order]
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        max_prior = np.full(n, np.nan)
        for s in range(1, n, chunk):
            e = min(s + chunk, n)
            sims = emb[s:e] @ emb[:e].T          # rows s..e vs ALL lower ids
            # strictly-lower-id mask within the slab's own columns
            col = np.arange(e)
            mask = col[None, :] < np.arange(s, e)[:, None]
            sims = np.where(mask, sims, -np.inf)
            mp = sims.max(axis=1)
            max_prior[s:e] = np.where(np.isfinite(mp), mp, np.nan)
            keep[s:e] = ~(mp >= threshold)
        if truncated:
            # Overflow rows beyond max_group pass through UNCHECKED with
            # keep=True + truncated=True — the output must stay row-complete
            # so a downstream filter(keep) never silently loses corpus rows.
            over = ids_all[order_all[max_group:]]
            ids = np.concatenate([ids, over])
            keep = np.concatenate([keep, np.ones(len(over), dtype=bool)])
            max_prior = np.concatenate([max_prior, np.full(len(over), np.nan)])
        n_out = len(ids)
        cl = group.column("cluster")[0].as_py() if n_out else -1
        return pa.table({
            id_col: pa.array(ids, group.schema.field(id_col).type),
            "cluster": pa.array(np.full(n_out, cl, dtype=np.int64)),
            "keep": pa.array(keep),
            "max_prior_sim": pa.array(np.round(max_prior, 6), pa.float64(),
                                      from_pandas=True),
            "truncated": pa.array(np.full(n_out, truncated, dtype=bool)),
        })

    return widen_blocks(clustered).groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )
