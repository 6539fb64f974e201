"""Graph operators over edge-list Datasets: PageRank (power iteration) and
exact triangle counting (degree-oriented wedge joins).

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


def triangle_count(
    edges: ray.data.Dataset,
    a_col: str = "src",
    b_col: str = "dst",
    max_adj: int = 10_000,
    n_partitions: int = 32,
) -> ray.data.Dataset:
    """Exact triangle count over an undirected graph given as an edge list
    (direction and duplicates ignored; self-loops dropped) — the standard
    multi-way self-join benchmark and the clustering-coefficient numerator.

    Algorithm (compact-forward / degree orientation, public): orient every
    edge from the (degree, node)-smaller endpoint to the larger, so each
    node's out-neighborhood is bounded by ~sqrt(2m) on any graph — the
    orientation that keeps hub nodes from generating quadratic wedges.
    Wedges (pairs within one node's out-neighborhood) are emitted per
    coarse src partition and joined against the oriented edge set
    (:func:`~.joins.bucket_hash_join` on the packed pair key); each match
    is exactly one triangle. ``max_adj`` caps a single adjacency list
    (logged flag column, same contract as the dedup pair caps).

    Degrees are node-scale and broadcast once (same contract as
    :func:`pagerank`). Output: one row ``(n_triangles, truncated)``.
    """
    from .aggregates import grouped_agg_fast
    from .joins import bucket_hash_join
    from .util import coarse_partitioned

    def norm(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.string())
        b = pc.cast(t.column(b_col), pa.string())
        keep = pc.invert(pc.equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        return pa.table({"u": lo, "v": hi})

    und = grouped_agg_fast(
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        keys=["u", "v"], specs=[],
    ).materialize()

    # node degrees over the distinct undirected edges (broadcast, node-scale)
    def deg_rows(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (t.column("u"), t.column("v"))])
        return pa.table({"node": both})

    deg_ds = grouped_agg_fast(
        und.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True),
        keys=["node"], specs=[], count_alias="d",
    )
    deg = {r["node"]: r["d"] for r in deg_ds.take_all()}
    dref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dm = ray.get(dref)
        u = t.column("u").to_pylist()
        v = t.column("v").to_pylist()
        su, sv = [], []
        for x, y in zip(u, v):
            # orient from (deg, node)-smaller to larger
            if (dm[x], x) <= (dm[y], y):
                su.append(x); sv.append(y)
            else:
                su.append(y); sv.append(x)
        return pa.table({"s": pa.array(su, pa.string()),
                         "t": pa.array(sv, pa.string())})

    oriented = und.map_batches(orient, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def wedges(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([pa.field("pair", pa.string()),
                                pa.field("n", pa.int64()),
                                pa.field("trunc", pa.bool_())])
        if block.num_rows == 0:
            return out_schema.empty_table()
        s = np.asarray(block.column("s").to_pylist(), dtype=object)
        t_ = np.asarray(block.column("t").to_pylist(), dtype=object)
        order = np.lexsort((t_, s))
        s, t_ = s[order], t_[order]
        starts = np.concatenate(([0], np.flatnonzero(s[1:] != s[:-1]) + 1,
                                 [len(s)]))
        pairs: dict[str, int] = {}
        truncated = False
        for i in range(len(starts) - 1):
            adj = t_[starts[i]:starts[i + 1]]
            if len(adj) > max_adj:
                adj = adj[:max_adj]
                truncated = True
            L = len(adj)
            for j in range(L - 1):
                aj = adj[j]
                for k in range(j + 1, L):
                    key = aj + "\x1f" + adj[k]
                    pairs[key] = pairs.get(key, 0) + 1
        if not pairs:
            return out_schema.empty_table()
        return pa.table({
            "pair": pa.array(list(pairs.keys()), pa.string()),
            "n": pa.array(list(pairs.values()), pa.int64()),
            "trunc": pa.array([truncated] * len(pairs)),
        })

    wedge_ds = coarse_partitioned(oriented, "s", wedges,
                                  n_partitions=n_partitions)

    def edge_keys(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t.column("s"), t.column("t"), "\x1f")
        rev = pc.binary_join_element_wise(t.column("t"), t.column("s"), "\x1f")
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (key, rev)])
        return pa.table({"pair": both})

    # wedge endpoints are both out-neighbors of some node; the closing edge
    # may be oriented either way between them, so match both key orders
    ekeys = oriented.map_batches(edge_keys, batch_format="pyarrow",
                                 zero_copy_batch=True)
    matched = bucket_hash_join(wedge_ds, ekeys, on="pair",
                               num_buckets=n_partitions)

    def reduce_part(t: pa.Table) -> pa.Table:
        n = int(pc.sum(t.column("n")).as_py() or 0) if t.num_rows else 0
        tr = bool(pc.any(t.column("trunc")).as_py()) if t.num_rows else False
        return pa.table({"n_triangles": pa.array([n], pa.int64()),
                         "truncated": pa.array([tr])})

    parts = matched.map_batches(reduce_part, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
    total = sum(r["n_triangles"] for r in parts)
    trunc = any(r["truncated"] for r in parts)
    return ray.data.from_arrow(pa.table({
        "n_triangles": pa.array([total], pa.int64()),
        "truncated": pa.array([trunc]),
    }))


def local_clustering(
    edges: ray.data.Dataset,
    a_col: str = "src",
    b_col: str = "dst",
    max_adj: int = 10_000,
    n_partitions: int = 32,
    digits: int = 6,
) -> ray.data.Dataset:
    """Per-node triangle counts and local clustering coefficient
    ``cc(v) = 2·T(v) / (d(v)·(d(v)−1))`` — the neighborhood-density signal
    (how clique-like is each node's egonet). Same degree-oriented wedge
    machinery as :func:`triangle_count`, but wedges keep their apex node so
    each closed triangle attributes to all THREE corners; the per-node
    counts then combine map-side. Nodes with degree < 2 get cc = 0.

    Output: (node, degree, triangles, cc) with cc rounded to ``digits``.
    """
    from .aggregates import grouped_agg_fast
    from .joins import bucket_hash_join
    from .util import coarse_partitioned

    def norm(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.string())
        b = pc.cast(t.column(b_col), pa.string())
        keep = pc.invert(pc.equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"u": pc.min_element_wise(a, b),
                         "v": pc.max_element_wise(a, b)})

    und = grouped_agg_fast(
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        keys=["u", "v"], specs=[],
    ).materialize()

    def deg_rows(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (t.column("u"), t.column("v"))])
        return pa.table({"node": both})

    deg_ds = grouped_agg_fast(
        und.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True),
        keys=["node"], specs=[], count_alias="degree",
    ).materialize()
    deg = {r["node"]: r["degree"] for r in deg_ds.take_all()}
    dref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dm = ray.get(dref)
        u = t.column("u").to_pylist()
        v = t.column("v").to_pylist()
        su, sv = [], []
        for x, y in zip(u, v):
            if (dm[x], x) <= (dm[y], y):
                su.append(x); sv.append(y)
            else:
                su.append(y); sv.append(x)
        return pa.table({"s": pa.array(su, pa.string()),
                         "t": pa.array(sv, pa.string())})

    oriented = und.map_batches(orient, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def wedges(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([pa.field("pair", pa.string()),
                                pa.field("apex", pa.string())])
        if block.num_rows == 0:
            return out_schema.empty_table()
        s = np.asarray(block.column("s").to_pylist(), dtype=object)
        t_ = np.asarray(block.column("t").to_pylist(), dtype=object)
        order = np.lexsort((t_, s))
        s, t_ = s[order], t_[order]
        starts = np.concatenate(([0], np.flatnonzero(s[1:] != s[:-1]) + 1,
                                 [len(s)]))
        pair_out, apex_out = [], []
        for i in range(len(starts) - 1):
            adj = t_[starts[i]:starts[i + 1]][:max_adj]
            iu, ju = np.triu_indices(len(adj), k=1)
            if len(iu) == 0:
                continue
            pair_out.extend(a + "\x1f" + b for a, b in zip(adj[iu], adj[ju]))
            apex_out.extend([s[starts[i]]] * len(iu))
        if not pair_out:
            return out_schema.empty_table()
        return pa.table({"pair": pa.array(pair_out, pa.string()),
                         "apex": pa.array(apex_out, pa.string())})

    wedge_ds = coarse_partitioned(oriented, "s", wedges,
                                  n_partitions=n_partitions)

    def edge_keys(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t.column("s"), t.column("t"), "\x1f")
        rev = pc.binary_join_element_wise(t.column("t"), t.column("s"), "\x1f")
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (key, rev)])
        return pa.table({"pair": both})

    ekeys = oriented.map_batches(edge_keys, batch_format="pyarrow",
                                 zero_copy_batch=True)
    matched = bucket_hash_join(wedge_ds, ekeys, on="pair",
                               num_buckets=n_partitions)

    # each matched wedge is one triangle {apex, a, b}: 3 corner rows
    def corners(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string())})
        pairs = t.column("pair").to_pylist()
        apex = t.column("apex").to_pylist()
        nodes = []
        for p, u in zip(pairs, apex):
            a, b = p.split("\x1f")
            nodes.extend((u, a, b))
        return pa.table({"node": pa.array(nodes, pa.string())})

    tri_counts = grouped_agg_fast(
        matched.map_batches(corners, batch_format="pyarrow",
                            zero_copy_batch=True),
        keys=["node"], specs=[], count_alias="triangles",
    )

    joined = bucket_hash_join(deg_ds, tri_counts, on="node",
                              join_type="left outer",
                              num_buckets=n_partitions)

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy(zero_copy_only=False).astype(np.float64)
        tr = t.column("triangles").to_numpy(zero_copy_only=False)
        tr = np.where(np.isnan(tr.astype(np.float64)), 0, tr).astype(np.int64) \
            if tr.dtype != np.int64 else tr
        denom = d * (d - 1.0)
        cc = np.where(denom > 0, 2.0 * tr / np.where(denom > 0, denom, 1.0), 0.0)
        return pa.table({
            "node": t.column("node"),
            "degree": pa.array(d.astype(np.int64)),
            "triangles": pa.array(tr.astype(np.int64)),
            "cc": pa.array(np.round(cc, digits), pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
