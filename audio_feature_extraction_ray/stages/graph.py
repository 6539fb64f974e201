"""Graph operators over edge-list Datasets: PageRank (power iteration).

Complements :func:`~.dedup.connected_components` (label propagation): where
components answer "which rows are the same thing", PageRank answers "which
nodes matter" — the centrality signal a curation pipeline uses to weight
link-rich sources. Reference analog: the grouped alignment report's
per-entity importance rollup (05_dtw_alignment_experiment/
dtw_alignment.py:1044-1100), recast as an iterative fixpoint over an edge
list.

Scale shape (broadcast path, |nodes| ≤ threshold): the edge list is indexed
ONCE against the sorted node vector (searchsorted per block, no Python per
row) and materialized as integer pairs; each power iteration is one
streaming pass over the edge blocks emitting per-block ``bincount``
partials (node-scale rows, the HLL-register shape), folded on the driver in
deterministic order. Driver state is O(|nodes|) — the documented contract,
with the same escape hatch as the other broadcast-bounded operators: above
the threshold the caller shards ranks with ``bucket_hash_join`` per
iteration (2 exchanges × iters) instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def pagerank(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    node_threshold: int = 5_000_000,
    digits: int = 9,
) -> ray.data.Dataset:
    """Power-iteration PageRank over a directed edge list.

    ``r_{t+1}[v] = (1-d)/N + d * (Σ_{(u,v)∈E} r_t[u]/deg[u] + dangling/N)``
    with ``dangling = Σ_{deg[u]=0} r_t[u]`` (teleport mass of sink nodes)
    and uniform ``r_0 = 1/N``. Fixed iteration count keeps the result
    SQL-replayable (the oracle chains one CTE per iteration). Output:
    (node, rank) with rank rounded to ``digits``.

    Raises if the node count exceeds ``node_threshold`` — the broadcast
    contract (see module docstring for the sharded alternative).
    """
    pairs = edges.select_columns([src_col, dst_col]).materialize()

    def keys_of(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(src_col), pa.string())
        d = pc.cast(t.column(dst_col), pa.string())
        return pa.table({"node": pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in (s, d)])})

    node_rows = pairs.map_batches(
        keys_of, batch_format="pyarrow", zero_copy_batch=True
    ).unique("node")
    # Dataset.unique returns None (not []) on an empty dataset
    nodes = np.sort(np.asarray(node_rows or [], dtype=object))
    n = len(nodes)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64()),
        }))
    if n > node_threshold:
        raise ValueError(
            f"pagerank broadcast path holds O(nodes) driver state; "
            f"{n} nodes > node_threshold={node_threshold} — shard ranks "
            f"with bucket_hash_join per iteration instead"
        )
    nref = ray.put(nodes)

    def index_block(t: pa.Table) -> pa.Table:
        nd = ray.get(nref)
        s = np.asarray(pc.cast(t.column(src_col), pa.string()).to_pylist(),
                       dtype=object)
        d = np.asarray(pc.cast(t.column(dst_col), pa.string()).to_pylist(),
                       dtype=object)
        return pa.table({
            "si": pa.array(np.searchsorted(nd, s), pa.int64()),
            "di": pa.array(np.searchsorted(nd, d), pa.int64()),
        })

    idx = pairs.map_batches(
        index_block, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # out-degrees: one pass of per-block bincount partials
    def deg_partial(t: pa.Table) -> pa.Table:
        si = t.column("si").to_numpy(zero_copy_only=False)
        cnt = np.bincount(si, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"i": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    deg = np.zeros(n, dtype=np.int64)
    drows = idx.map_batches(deg_partial, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    drows.sort(key=lambda r: r["i"])
    for r in drows:
        deg[r["i"]] += r["c"]

    rank = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        wref = ray.put(np.where(deg > 0, rank / np.maximum(deg, 1), 0.0))

        def contrib_partial(t: pa.Table, _w=wref) -> pa.Table:
            w = ray.get(_w)
            si = t.column("si").to_numpy(zero_copy_only=False)
            di = t.column("di").to_numpy(zero_copy_only=False)
            acc = np.zeros(len(w))
            np.add.at(acc, di, w[si])
            nz = np.flatnonzero(acc)
            return pa.table({"i": pa.array(nz, pa.int64()),
                             "v": pa.array(acc[nz], pa.float64())})

        rows = idx.map_batches(contrib_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        # deterministic fold: sorted (index, value) accumulation
        rows.sort(key=lambda r: (r["i"], r["v"]))
        acc = np.zeros(n)
        for r in rows:
            acc[r["i"]] += r["v"]
        dangling = float(rank[deg == 0].sum())
        rank = base + damping * (acc + dangling / n)

    return ray.data.from_arrow(pa.table({
        "node": pa.array(list(nodes), pa.string()),
        "rank": pa.array(np.round(rank, digits), pa.float64()),
    }))
