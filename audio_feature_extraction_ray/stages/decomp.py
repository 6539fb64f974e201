"""Decomposition / clustering over the embedding column: exact distributed
PCA (streaming second-moment sums) and Lloyd k-means (broadcast centroids,
map-side partial sums per iteration).

Both follow the small-model / big-data split: the d×d moment matrix and the
k×d centroid table live on the driver (KBs), while every row-touching step
is a vectorized ``map_batches`` — the shape that holds when the embedding
table is 10^12 rows. Reference analog: the serial sklearn-style feature
post-processing the comparison step does in RAM
(03_feature_comparison_experiment/feature_comparison.py:1 region).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _drop_null_embeddings, _stack_embeddings


def _moment_partials(ds: ray.data.Dataset, emb_col: str, d: int) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact (n, Σx, ΣxᵀX) via map-side partials: each batch emits one row
    carrying its count, d-vector sum and packed d×d Gram contribution
    (float64 bytes in a ``large_binary`` — Acero rejects fixed-size-list
    payloads); partials are summed in DETERMINISTIC order (sorted by their
    content hash) in one final task, so repeated runs produce bitwise-equal
    moments regardless of block arrival order."""

    def partial(t: pa.Table) -> pa.Table:
        # SQL null exclusion: rows with a NULL embedding contribute nothing
        # to the fitted moments (an aggregate over NULL vectors skips them).
        t = _drop_null_embeddings(t, emb_col)
        if t.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.large_binary()),
                "gram": pa.array([], pa.large_binary()),
            })
        m = _stack_embeddings(t.column(emb_col))
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "sx": pa.array([m.sum(axis=0).tobytes()], pa.large_binary()),
            "gram": pa.array([(m.T @ m).tobytes()], pa.large_binary()),
        })

    rows = ds.select_columns([emb_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    rows.sort(key=lambda r: (r["n"], r["sx"]))
    n = sum(r["n"] for r in rows)
    sx = np.zeros(d)
    gram = np.zeros((d, d))
    for r in rows:
        sx += np.frombuffer(r["sx"], dtype=np.float64)
        gram += np.frombuffer(r["gram"], dtype=np.float64).reshape(d, d)
    return n, sx, gram


def pca_fit(ds: ray.data.Dataset, emb_col: str, d: int, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact PCA of the embedding column: covariance from one streaming
    moment pass, ``eigh`` on the driver's d×d matrix. Returns
    (mean (d,), components (k, d) row-major, explained_variance (k,)).
    Component signs are canonicalized (largest-|coefficient| entry positive,
    first-index tiebreak) so the basis is deterministic."""
    n, sx, gram = _moment_partials(ds, emb_col, d)
    if n == 0:
        raise ValueError("pca_fit on an empty dataset")
    mu = sx / n
    cov = gram / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(-w, kind="stable")[:k]
    comps = v[:, idx].T
    flip = comps[np.arange(len(idx)), np.argmax(np.abs(comps), axis=1)] < 0
    comps[flip] *= -1.0
    return mu, comps, w[idx]


def pca_transform(
    ds: ray.data.Dataset,
    emb_col: str,
    mu: np.ndarray,
    comps: np.ndarray,
    id_col: str | None = None,
    prefix: str = "pc",
    explained_variance: np.ndarray | None = None,
    whiten: bool = False,
    eps: float = 1e-12,
) -> ray.data.Dataset:
    """Project rows onto the fitted components: one broadcast of (μ, W) via
    ``ray.put``, one matmul per batch. Output: id column (when given) +
    ``{prefix}{i}`` float64 score columns.

    ``whiten=True`` (requires ``explained_variance`` from :func:`pca_fit`)
    scales each score lane by 1/√λᵢ so the output has identity covariance —
    the standard pre-step before cosine/Euclidean ANN on anisotropic
    embeddings. Near-zero eigenvalues are floored at ``eps`` (a degenerate
    direction whitens to ~0, never to ±inf).
    """
    comps = np.asarray(comps, dtype=np.float64)
    if whiten:
        if explained_variance is None:
            raise ValueError("whiten=True requires explained_variance from pca_fit")
        scale = 1.0 / np.sqrt(np.maximum(np.asarray(explained_variance, np.float64), eps))
        comps = comps * scale[:, None]  # fold the whitening into W once
    ref = ray.put((np.asarray(mu), comps))
    k = comps.shape[0]

    def project(t: pa.Table) -> pa.Table:
        m, w = ray.get(ref)
        # a NULL vector has no projection — its row is excluded WITH its id
        # (SQL null exclusion; clean data is unaffected)
        t = _drop_null_embeddings(t, emb_col)
        cols: dict[str, object] = {}
        if id_col is not None:
            cols[id_col] = t.column(id_col)
        if t.num_rows == 0:
            scores = np.zeros((0, k))
        else:
            scores = (_stack_embeddings(t.column(emb_col)) - m) @ w.T
        for i in range(k):
            cols[f"{prefix}{i + 1}"] = pa.array(scores[:, i], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def kmeans(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    k: int,
    iters: int = 10,
    d: int | None = None,
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Lloyd k-means over the embedding column with deterministic
    initialization (the k rows with the smallest ``id_col`` values).

    Per iteration: centroids broadcast once (``ray.put``), every batch does
    one distance matmul and emits k packed partial rows (cluster sums +
    counts); the driver folds the tiny k×d partials in sorted order and
    updates. Empty clusters keep their previous centroid. The input is
    materialized once so the T iterations re-read object-store blocks, not
    the source. Returns (assignments Dataset (id, cluster, dist), final
    centroids (k, d)).

    Ties (equidistant centroids) go to the LOWEST cluster index — matches
    ``np.argmin`` so a serial replay reproduces assignments exactly.
    """
    from .util import topk

    # null-embedding rows can neither seed nor join a cluster — exclude
    # them (with their ids) up front, once, so every iteration's stacking
    # stays row-aligned (SQL null exclusion; no-op on clean data)
    ds = ds.select_columns([id_col, emb_col]).map_batches(
        lambda t: _drop_null_embeddings(t, emb_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    # k smallest ids via partial top-k (no global sort for k seed rows)
    seed_rows = topk(ds, [id_col], k, descending=False).take_all()
    if len(seed_rows) < k:
        raise ValueError(f"k={k} but dataset has only {len(seed_rows)} rows")
    cent = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in seed_rows])
    if d is None:
        d = cent.shape[1]

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            if t.num_rows == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.large_binary()),
                })
            m = _stack_embeddings(t.column(emb_col))
            d2 = ((m * m).sum(axis=1)[:, None]
                  - 2.0 * (m @ c.T)
                  + (c * c).sum(axis=1)[None, :])
            a = np.argmin(d2, axis=1)
            sums = np.zeros((len(c), m.shape[1]))
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(c))
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
                "s": pa.array([sums[i].tobytes() for i in range(len(c))],
                              pa.large_binary()),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        rows.sort(key=lambda r: (r["cluster"], r["n"], r["s"]))
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.frombuffer(r["s"], dtype=np.float64)
            counts[r["cluster"]] += r["n"]
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]

    ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                "cluster": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            })
        m = _stack_embeddings(t.column(emb_col))
        d2 = ((m * m).sum(axis=1)[:, None]
              - 2.0 * (m @ c.T)
              + (c * c).sum(axis=1)[None, :])
        a = np.argmin(d2, axis=1)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0)),
                             pa.float64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True), cent
