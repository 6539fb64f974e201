"""Similarity search over an embedding column: brute-force cosine top-k
(baseline) and an LSH-bucketed variant (the scale path).

The query matrix is normalized once and broadcast via ``ray.put``; every map
task scores its batch with one float64 matmul and keeps a per-batch partial
top-k, then a small ``groupby(query_id)`` merge produces the final top-k —
the map-side combine pattern, so the shuffle moves only k rows per (query,
batch), never the corpus.

Determinism: ties broken by ascending vector id; scores computed in float64
(matches DuckDB ``list_cosine_similarity`` on the same data).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _stack_embeddings(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if a.null_count:
        # Arrow's flatten() SKIPS null list slots, so stacking a nullable
        # column would silently misalign rows against any id column the
        # caller zips with. Fail loudly; callers that tolerate nulls filter
        # first via _drop_null_embeddings.
        raise ValueError(
            "embedding column contains nulls; filter them (with their id "
            "rows) before stacking — see _drop_null_embeddings")
    if pa.types.is_fixed_size_list(a.type):
        d = a.type.list_size
        return a.flatten().to_numpy(zero_copy_only=False).reshape(-1, d).astype(np.float64)
    if len(a) == 0:
        # np.stack([]) raises; an upstream filter can legally empty a block
        return np.empty((0, 0), dtype=np.float64)
    return np.stack(a.to_pylist()).astype(np.float64)


def _drop_null_embeddings(batch: pa.Table, emb_col: str) -> pa.Table:
    """Drop rows whose embedding is null — WITH their id/label columns, so
    downstream stacking stays row-aligned (SQL null-exclusion semantics,
    same contract as the stat operators)."""
    col = batch.column(emb_col)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        batch = batch.filter(arr.is_valid())
    return batch


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    def __init__(self, q_ref, k, id_col, emb_col):
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.qids, self.qmat = q  # (Q,), (Q, D) normalized
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = _drop_null_embeddings(batch, self.emb_col)
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        emb = _normalize(_stack_embeddings(batch.column(self.emb_col)))
        scores = emb @ self.qmat.T  # (B, Q)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[1]):
            s = scores[:, qi]
            # top-k by (score desc, id asc) — deterministic
            order = np.lexsort((ids, -s))[:k]
            out_q.extend([self.qids[qi]] * len(order))
            out_id.extend(ids[order])
            out_s.extend(s[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.asarray(out_id, dtype=np.int64), pa.int64()),
                "score": pa.array(np.asarray(out_s, dtype=np.float64), pa.float64()),
            }
        )


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Exact cosine top-k: (query_id, vec_id, score, rank), rank 1-based."""
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), _normalize(query_matrix.astype(np.float64))))
    partial = ds.map_batches(
        _PartialTopK,
        fn_constructor_args=(q_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def merge(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": group.column("query_id").take(pa.array(order, pa.int64())),
                "vec_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(s[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def train_ivf_centroids(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    iters: int = 10,
) -> np.ndarray:
    """Train an IVF coarse quantizer: deterministic sample (first rows of the
    dataset order) + Lloyd k-means in float64 on normalized vectors.

    Driver-side on a bounded sample — at 10^12 scale this is the standard
    train-on-sample / assign-distributed IVF split."""
    tabs = [_drop_null_embeddings(t, emb_col)
            for t in ds.limit(sample_size).select_columns([emb_col])
            .iter_batches(batch_format="pyarrow", batch_size=None)]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        # empty (or all-null) input: no cells to train — callers get zero
        # centroids and produce an empty result instead of a driver crash
        return np.empty((0, 0), dtype=np.float64)
    sample = pa.concat_tables(tabs)
    x = _normalize(_stack_embeddings(sample.column(emb_col)))
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x495646]))  # "IVF"
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def knn_ivf(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """IVF approximate top-k: score only vectors whose coarse cell is among
    each query's ``n_probe`` nearest cells — compute drops by roughly
    n_probe/n_centroids at some recall cost (the scale path next to
    :func:`knn_bruteforce`; recall tunable via n_probe)."""
    cent = train_ivf_centroids(ds, emb_col, n_centroids, seed=seed)
    if len(cent) == 0:
        # empty corpus: same clean empty result knn_bruteforce returns
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }))
    qm = _normalize(query_matrix.astype(np.float64))
    q_cells = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, cent, q_cells))

    class PartialIVF:
        def __init__(self):
            self.qids, self.qm, self.cent, self.qcells = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = _drop_null_embeddings(batch, emb_col)
            if batch.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            emb = _normalize(_stack_embeddings(batch.column(emb_col)))
            cells = np.argmax(emb @ self.cent.T, axis=1)
            out_q, out_id, out_s = [], [], []
            for qi in range(len(self.qids)):
                m = np.isin(cells, self.qcells[qi])
                if not m.any():
                    continue
                s = emb[m] @ self.qm[qi]
                cand = ids[m]
                order = np.lexsort((cand, -s))[: min(k, len(cand))]
                out_q.extend([self.qids[qi]] * len(order))
                out_id.extend(cand[order])
                out_s.extend(s[order])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(np.asarray(out_id, dtype=np.int64), pa.int64()),
                    "score": pa.array(np.asarray(out_s, dtype=np.float64), pa.float64()),
                }
            )

    partial = ds.map_batches(
        PartialIVF, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )

    def merge(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": group.column("query_id").take(pa.array(order, pa.int64())),
                "vec_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(s[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x4C5348]))  # "LSH"
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_ids(emb: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH: sign bits packed into an int64 bucket id."""
    bits = (emb @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights[None, :]).sum(axis=1)


def knn_lsh(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Approximate top-k: score only vectors sharing the query's LSH bucket.

    The scale path — each map task filters its batch to same-bucket candidates
    before the matmul, cutting compute by ~2^n_planes at some recall cost.
    """
    qm = _normalize(query_matrix.astype(np.float64))
    planes = _hyperplanes(qm.shape[1], n_planes, seed)
    q_buckets = lsh_bucket_ids(qm, planes)
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, planes, q_buckets))

    class PartialLSH:
        def __init__(self):
            self.qids, self.qm, self.planes, self.qb = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = _drop_null_embeddings(batch, emb_col)
            if batch.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            emb = _normalize(_stack_embeddings(batch.column(emb_col)))
            buckets = lsh_bucket_ids(emb, self.planes)
            out_q, out_id, out_s = [], [], []
            for qi in range(len(self.qids)):
                m = buckets == self.qb[qi]
                if not m.any():
                    continue
                s = emb[m] @ self.qm[qi]
                cand_ids = ids[m]
                order = np.lexsort((cand_ids, -s))[: min(k, len(cand_ids))]
                out_q.extend([self.qids[qi]] * len(order))
                out_id.extend(cand_ids[order])
                out_s.extend(s[order])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(np.asarray(out_id, dtype=np.int64), pa.int64()),
                    "score": pa.array(np.asarray(out_s, dtype=np.float64), pa.float64()),
                }
            )

    partial = ds.map_batches(PartialLSH, batch_format="pyarrow",
                             zero_copy_batch=True, concurrency=concurrency)

    def merge(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "query_id": group.column("query_id").take(pa.array(order, pa.int64())),
                "vec_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(s[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")

def label_centroids_cosine(
    ds: ray.data.Dataset,
    label_col: str,
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Pairwise cosine similarity between per-label embedding centroids —
    the class-separation / cluster-compactness diagnostic for a labeled
    embedding table.

    Per batch, one matmul-free vectorized pass turns the list column into
    per-(label, dim) partial sums (``np.add.at`` over label codes); the only
    exchange ships |labels|·d tiny partials through the map-side combiner.
    The |labels|·d centroid table finalizes in one task: cosine over the
    upper triangle, ties ordered (label_a < label_b). Output:
    (label_a, label_b, cosine).
    """
    import pyarrow.compute as pc

    from .aggregates import grouped_agg_fast

    def to_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    label_col: pa.array([], t.schema.field(label_col).type),
                    "dim": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        # null labels carry no centroid mass (their dictionary index is
        # null -> int64 garbage -> IndexError in the scatter-add); null
        # embeddings likewise (flatten() would skip them and misalign the
        # scatter against the label codes)
        t = t.filter(pc.is_valid(t.column(label_col)))
        t = _drop_null_embeddings(t, emb_col)
        if t.num_rows == 0:
            return pa.table(
                {
                    label_col: pa.array([], t.schema.field(label_col).type),
                    "dim": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        m = _stack_embeddings(t.column(emb_col))
        labels = t.column(label_col).combine_chunks()
        de = labels.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k, d = int(codes.max()) + 1, m.shape[1]
        sums = np.zeros((k, d))
        np.add.at(sums, codes, m)
        counts = np.bincount(codes, minlength=k)
        lab = de.dictionary.take(pa.array(np.repeat(np.arange(k), d)))
        return pa.table(
            {
                label_col: lab,
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "v": pa.array(sums.ravel(), pa.float64()),
                "cnt": pa.array(np.repeat(counts, d).astype(np.int64)),
            }
        )

    partials = ds.select_columns([label_col, emb_col]).map_batches(
        to_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    sums = grouped_agg_fast(
        partials,
        keys=[label_col, "dim"],
        specs=[("v", "v", "sum"), ("cnt", "cnt", "sum")],
    )

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "label_a": pa.array([], t.schema.field(label_col).type),
                "label_b": pa.array([], t.schema.field(label_col).type),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[(label_col, "ascending"),
                                                 ("dim", "ascending")]))
        labels = t.column(label_col).combine_chunks()
        de = labels.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = int(codes.max()) + 1
        d = t.num_rows // k
        cent = (t.column("v").to_numpy(zero_copy_only=False)
                / t.column("cnt").to_numpy(zero_copy_only=False)).reshape(k, d)
        cn = _normalize(cent)
        cos = cn @ cn.T
        ia, ib = np.triu_indices(k, 1)
        # dictionary order == ascending label order (the column is sorted)
        uniq = de.dictionary
        return pa.table(
            {
                "label_a": uniq.take(pa.array(ia)),
                "label_b": uniq.take(pa.array(ib)),
                "cosine": pa.array(cos[ia, ib], pa.float64()),
            }
        )

    return sums.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def quantize_embeddings(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Symmetric per-vector int8 quantization of the embedding column — the
    4x storage/bandwidth reduction an ANN index wants at 10^12 rows. Each
    row keeps (id, packed int8 bytes, float scale = max|x| / 127); pure
    vectorized map, zero shuffle. ``scale == 0`` encodes the all-zero
    vector. Companion: :func:`dequantize_embeddings`."""

    def quant(t: pa.Table) -> pa.Table:
        t = _drop_null_embeddings(t, emb_col)
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                "q": pa.array([], pa.large_binary()),
                "scale": pa.array([], pa.float64()),
            })
        m = _stack_embeddings(t.column(emb_col))
        scale = np.abs(m).max(axis=1) / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.clip(np.round(m / safe[:, None]), -127, 127).astype(np.int8)
        return pa.table({
            id_col: t.column(id_col),
            "q": pa.array([q[i].tobytes() for i in range(len(q))], pa.large_binary()),
            "scale": pa.array(scale, pa.float64()),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        quant, batch_format="pyarrow", zero_copy_batch=True
    )


def dequantize_embeddings(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Inverse of :func:`quantize_embeddings`: unpack int8 bytes × scale
    back to a float64 list column. Pure map, zero shuffle."""

    def dequant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                "embedding": pa.array([], pa.list_(pa.float64())),
            })
        qs = t.column("q").to_pylist()
        scale = t.column("scale").to_numpy(zero_copy_only=False)
        m = np.stack([np.frombuffer(b, dtype=np.int8) for b in qs]).astype(np.float64)
        m *= scale[:, None]
        return pa.table({
            id_col: t.column(id_col),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
        })

    return ds.map_batches(dequant, batch_format="pyarrow", zero_copy_batch=True)
