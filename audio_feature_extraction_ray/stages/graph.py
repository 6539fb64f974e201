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

    Below ``node_threshold`` nodes the broadcast path runs (O(nodes)
    driver state, zero exchange per iteration); above it the sharded path
    takes over automatically — ranks stay a Dataset joined to the edges
    each iteration (2 bucket exchanges), with only three scalars on the
    driver. Route parity is pinned in pytest.
    """
    def drop_null_edges(t: pa.Table) -> pa.Table:
        # an edge with a NULL endpoint is not an edge (SQL join semantics);
        # a None in the node vector would also break np.sort/searchsorted
        keep = pc.and_(pc.is_valid(t.column(src_col)),
                       pc.is_valid(t.column(dst_col)))
        return t.filter(keep)

    pairs = edges.select_columns([src_col, dst_col]).map_batches(
        drop_null_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

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
        return _pagerank_sharded(pairs, src_col, dst_col, iters, damping,
                                 digits)
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

    # out-degrees: one pass of per-block bincount partials. Each block
    # returns ONE row of packed (indices, values) list columns; the driver
    # fold is a vectorized lexsort + weighted bincount — deterministic
    # (same-index additions happen in sorted (i, v) order) and numpy-speed,
    # never a Python loop over per-node rows (ADVICE r5).
    def _fold_sparse(rows: list[dict], val_key: str, dtype) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        if rows:
            i = np.concatenate([np.asarray(r["i"], dtype=np.int64)
                                for r in rows])
            v = np.concatenate([np.asarray(r[val_key], dtype=np.float64)
                                for r in rows])
            order = np.lexsort((v, i))
            acc = np.bincount(i[order], weights=v[order], minlength=n)
        return acc.astype(dtype)

    def deg_partial(t: pa.Table) -> pa.Table:
        si = t.column("si").to_numpy(zero_copy_only=False)
        cnt = np.bincount(si, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"i": pa.array([nz], pa.list_(pa.int64())),
                         "c": pa.array([cnt[nz]], pa.list_(pa.int64()))})

    deg = _fold_sparse(
        idx.map_batches(deg_partial, batch_format="pyarrow",
                        zero_copy_batch=True).take_all(),
        "c", np.int64)

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
            return pa.table({"i": pa.array([nz], pa.list_(pa.int64())),
                             "v": pa.array([acc[nz]], pa.list_(pa.float64()))})

        rows = idx.map_batches(contrib_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        acc = _fold_sparse(rows, "v", np.float64)
        dangling = float(rank[deg == 0].sum())
        rank = base + damping * (acc + dangling / n)

    return ray.data.from_arrow(pa.table({
        "node": pa.array(list(nodes), pa.string()),
        "rank": pa.array(np.round(rank, digits), pa.float64()),
    }))


def _pagerank_sharded(
    pairs: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    iters: int,
    damping: float,
    digits: int,
) -> ray.data.Dataset:
    """The above-threshold PageRank path: ranks live as a DATASET and join
    the edge list per iteration (2 bucket exchanges × iters) — no O(nodes)
    driver state; only three scalars (N, dangling mass, residual base)
    touch the driver per iteration. Semantics identical to the broadcast
    path (same formula, same dangling redistribution); parity is pinned in
    pytest by forcing this route on a small graph.
    """
    from .aggregates import grouped_agg_fast
    from .joins import bucket_hash_join

    def keys_of(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(src_col), pa.string())
        d = pc.cast(t.column(dst_col), pa.string())
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (s, d)])
        return pa.table({"node": both})

    nodes = grouped_agg_fast(
        pairs.map_batches(keys_of, batch_format="pyarrow", zero_copy_batch=True),
        keys=["node"], specs=[],
    ).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64()),
        }))

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t.column(src_col), pa.string()),
            "dst": pc.cast(t.column(dst_col), pa.string()),
        })

    edges = pairs.map_batches(edge_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    deg = grouped_agg_fast(
        edges.map_batches(lambda t: pa.table({"node": t.column("src")}),
                          batch_format="pyarrow", zero_copy_batch=True),
        keys=["node"], specs=[], count_alias="deg",
    )
    # nodes ⟕ deg: sinks get deg NULL→0
    nd = bucket_hash_join(nodes, deg, on="node", join_type="left outer")

    def init_rank(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        d = np.nan_to_num(d.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table({
            "node": t.column("node"),
            "deg": pa.array(d),
            "rank": pa.array(np.full(t.num_rows, 1.0 / n)),
        })

    ranks = nd.map_batches(init_rank, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    base = (1.0 - damping) / n

    for _ in range(iters):
        # dangling mass: one tiny aggregate over sink rows
        dangling = ranks.filter(expr="deg == 0").sum("rank") or 0.0

        def weights(t: pa.Table) -> pa.Table:
            d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            r = t.column("rank").to_numpy(zero_copy_only=False)
            w = np.where(d > 0, r / np.maximum(d, 1), 0.0)
            return pa.table({"node": t.column("node"),
                             "w": pa.array(w, pa.float64())})

        contrib_src = bucket_hash_join(
            edges, ranks.map_batches(weights, batch_format="pyarrow",
                                     zero_copy_batch=True),
            on="src", right_on="node",
        )
        contribs = grouped_agg_fast(
            contrib_src.map_batches(
                lambda t: pa.table({"node": t.column("dst"),
                                    "c": t.column("w")}),
                batch_format="pyarrow", zero_copy_batch=True),
            keys=["node"], specs=[("c", "c", "sum")],
        )
        joined = bucket_hash_join(ranks.select_columns(["node", "deg"]),
                                  contribs, on="node", join_type="left outer")
        extra = damping * dangling / n

        def update(t: pa.Table, _extra=extra) -> pa.Table:
            c = np.nan_to_num(
                t.column("c").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0)
            return pa.table({
                "node": t.column("node"),
                "deg": t.column("deg"),
                "rank": pa.array(base + damping * c + _extra, pa.float64()),
            })

        ranks = joined.map_batches(update, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

    def finish(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table({"node": t.column("node"),
                         "rank": pa.array(np.round(r, digits), pa.float64())})

    return ranks.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _col_np(col) -> np.ndarray:
    """Column → numpy vector for searchsorted/bitset index math: integer
    columns come out as native int64 (no Python boxing — the fast path for
    numeric node keys), anything else as an object array of Python
    values. Both sort/compare consistently within one dtype, which is all
    the callers rely on."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False)
    return np.asarray(arr.to_pylist(), dtype=object)


def _normalize_edges(edges: ray.data.Dataset, a_col: str, b_col: str):
    """Distinct undirected (u, v) pairs with self-loops dropped — the
    shared first step of the wedge-join operators. Integer endpoints stay
    int64 end-to-end (the distinct groupby and every downstream
    searchsorted run on native ints); any other label type is normalized
    to string."""
    from .aggregates import grouped_agg_fast
    from .util import arrow_schema_of

    edges, schema = arrow_schema_of(edges)
    int_labels = (pa.types.is_integer(schema.field(a_col).type)
                  and pa.types.is_integer(schema.field(b_col).type))
    label_t = pa.int64() if int_labels else pa.string()

    def norm(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), label_t)
        b = pc.cast(t.column(b_col), label_t)
        keep = pc.invert(pc.equal(a, b))
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"u": pc.min_element_wise(a, b),
                         "v": pc.max_element_wise(a, b)})

    return grouped_agg_fast(
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        keys=["u", "v"], specs=[],
    ).materialize()


def _degrees(und: ray.data.Dataset):
    """(degree Dataset, sorted node vector, aligned degree vector) over the
    distinct undirected edges. The two numpy vectors are node-scale and
    broadcast — the same contract as :func:`pagerank`'s node vector."""
    from .aggregates import grouped_agg_fast

    def deg_rows(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (t.column("u"), t.column("v"))])
        return pa.table({"node": both})

    deg_ds = grouped_agg_fast(
        und.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True),
        keys=["node"], specs=[], count_alias="degree",
    ).materialize()
    rows = deg_ds.take_all()
    node_dtype = (np.int64 if rows and isinstance(rows[0]["node"],
                                                  (int, np.integer))
                  else object)
    nodes = np.asarray([r["node"] for r in rows], dtype=node_dtype)
    degs = np.asarray([r["degree"] for r in rows], dtype=np.int64)
    order = np.argsort(nodes, kind="stable")
    return deg_ds, nodes[order], degs[order]


def _orient(und: ray.data.Dataset, nodes: np.ndarray, degs: np.ndarray):
    """Compact-forward orientation: every edge points from its
    (degree, node)-smaller endpoint to the larger, bounding any node's
    out-neighborhood by ~sqrt(2m). Vectorized: degrees map onto the
    endpoints via searchsorted against the broadcast sorted node vector,
    endpoint choice is one np.where over (deg, label) comparisons — no
    per-edge Python."""
    nref = ray.put((nodes, degs))

    def orient(t: pa.Table) -> pa.Table:
        nd, dg = ray.get(nref)
        u = _col_np(t.column("u"))
        v = _col_np(t.column("v"))
        du = dg[np.searchsorted(nd, u)]
        dv = dg[np.searchsorted(nd, v)]
        u_first = (du < dv) | ((du == dv) & (u <= v))
        label_t = t.schema.field("u").type
        return pa.table({"s": pa.array(np.where(u_first, u, v), label_t),
                         "t": pa.array(np.where(u_first, v, u), label_t)})

    return und.map_batches(orient, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _scatter_or(mat: np.ndarray, flat: np.ndarray, bits: np.ndarray) -> None:
    """OR ``bits`` into ``mat.reshape(-1)[flat]`` with duplicate ``flat``
    entries combined first — vectorized scatter-OR shared by both bitset
    builders (np.bitwise_or.at is interpreter-speed; sort + reduceat is
    not)."""
    order = np.argsort(flat, kind="stable")
    flat, bits = flat[order], bits[order]
    starts = np.concatenate(([0], np.flatnonzero(flat[1:] != flat[:-1]) + 1))
    mat.reshape(-1)[flat[starts]] |= np.bitwise_or.reduceat(bits, starts)


def _popcount_rows(words: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (k, W) uint64 array — uint8-view + 256-entry
    table (numpy 1.x has no bitwise_count)."""
    return _POPCOUNT8[words.view(np.uint8)].sum(axis=1, dtype=np.int64)


@ray.remote
def _build_bitset_adjacency(nodes: np.ndarray, *tables) -> np.ndarray:
    """One task: distinct undirected (u, v) edge blocks → symmetric V×W
    bitset adjacency matrix (W = ceil(V/64) uint64 words). Edges never
    touch the driver; the matrix is V²/8 bytes — the dense-route bound."""
    n = len(nodes)
    w = (n + 63) // 64
    mat = np.zeros((n, w), dtype=np.uint64)
    for t in tables:
        if t.num_rows == 0:
            continue
        u = np.searchsorted(nodes, _col_np(t.column("u")))
        v = np.searchsorted(nodes, _col_np(t.column("v")))
        rows = np.concatenate([u, v])
        cols = np.concatenate([v, u])
        bits = (np.uint64(1) << (cols.astype(np.uint64) & np.uint64(63)))
        flat = rows.astype(np.int64) * w + (cols >> 6).astype(np.int64)
        _scatter_or(mat, flat, bits)
    return mat


def _dense_edge_commons(und: ray.data.Dataset, nodes: np.ndarray):
    """Per distinct edge (u, v): |N(u) ∩ N(v)| — the triangles through that
    edge — via broadcast bitset rows ANDed and popcounted per block. The
    dense-graph fast path: O(E·V/64) word ops instead of O(Σ deg²) wedge
    rows, zero wedge exchange (the adjacency matrix broadcasts once,
    V²/8 bytes)."""
    refs = und.to_arrow_refs()
    matref = _build_bitset_adjacency.remote(nodes, *refs)
    nref = ray.put(nodes)

    def per_block(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([t.schema.field("u"), t.schema.field("v"),
                                pa.field("c", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        mat = ray.get(matref)
        nd = ray.get(nref)
        ui = np.searchsorted(nd, _col_np(t.column("u")))
        vi = np.searchsorted(nd, _col_np(t.column("v")))
        c = _popcount_rows(mat[ui] & mat[vi])
        return pa.table({"u": t.column("u"), "v": t.column("v"),
                         "c": pa.array(c, pa.int64())})

    return und.map_batches(per_block, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _build_bipartite_bitset(items: np.ndarray, group_col: str, item_col: str,
                            *tables) -> np.ndarray:
    """One task: distinct (group, item) blocks → (|items| × ceil(G/64))
    uint64 bitset, bit g of row i set iff item i occurs in group g. The
    co-occurrence support of items (i, j) is then popcount(row_i & row_j)
    — no pair ever crosses an exchange."""
    parts = [t for t in tables if t.num_rows]
    if not parts:
        return np.zeros((len(items), 1), dtype=np.uint64)
    gv = np.concatenate([_col_np(t.column(group_col)) for t in parts])
    iv = np.concatenate([_col_np(t.column(item_col)) for t in parts])
    _, ginv = np.unique(gv, return_inverse=True)
    ii = np.searchsorted(items, iv)
    w = (int(ginv.max()) + 64) // 64
    mat = np.zeros((len(items), w), dtype=np.uint64)
    bits = np.uint64(1) << (ginv.astype(np.uint64) & np.uint64(63))
    flat = ii.astype(np.int64) * w + (ginv >> 6).astype(np.int64)
    _scatter_or(mat, flat, bits)
    return mat


def cooccurrence_pairs_dense(
    pairs_ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    items: np.ndarray,
    min_support: int = 2,
    rows_per_task: int = 64,
) -> ray.data.Dataset:
    """All item pairs co-occurring in ≥ ``min_support`` groups, from a
    DISTINCT (group, item) dataset — the dense-side route of a
    co-occurrence projection. One task builds the bipartite bitset
    (|items| × G/64 words — the route's memory bound; the caller gates on
    |items| and an approximate group count), each downstream task popcounts
    one block of item rows against the broadcast matrix and emits only
    qualifying pairs. The Θ(Σ per-group k²) wedge-pair exchange of the
    sparse path disappears entirely: nothing item-pair-shaped ever crosses
    the wire. ``items`` must be the sorted distinct item vector."""
    refs = pairs_ds.to_arrow_refs()
    matref = _build_bipartite_bitset.remote(items, group_col, item_col, *refs)
    iref = ray.put(items)
    n = len(items)
    chunks = [(lo, min(lo + rows_per_task, n))
              for lo in range(0, n, rows_per_task)]
    chunk_ds = ray.data.from_items(
        [{"lo": lo, "hi": hi} for lo, hi in chunks]
    ).repartition(max(1, len(chunks)))

    def per_chunk(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([pa.field("src", pa.int64()),
                                pa.field("dst", pa.int64()),
                                pa.field("support", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        mat = ray.get(matref)
        it = ray.get(iref)
        srcs, dsts, sups = [], [], []
        for lo, hi in zip(t.column("lo").to_pylist(), t.column("hi").to_pylist()):
            for i in range(lo, hi):
                if i + 1 >= len(it):
                    continue
                c = _popcount_rows(mat[i][None, :] & mat[i + 1:])
                hit = np.flatnonzero(c >= min_support)
                if len(hit):
                    srcs.append(np.full(len(hit), it[i]))
                    dsts.append(np.asarray(it)[i + 1 + hit])
                    sups.append(c[hit])
        if not srcs:
            return out_schema.empty_table()
        return pa.table({
            "src": pa.array(np.concatenate(srcs).astype(np.int64), pa.int64()),
            "dst": pa.array(np.concatenate(dsts).astype(np.int64), pa.int64()),
            "support": pa.array(np.concatenate(sups), pa.int64()),
        })

    return chunk_ds.map_batches(per_chunk, batch_format="pyarrow",
                                zero_copy_batch=True)


def _pair_key(a, b) -> "pa.Array":
    """Collision-free join key for a node pair: ``f"{len(a)}:{a}{b}"``.
    Node labels are arbitrary strings (any byte may appear), so no
    separator char is safe — the length prefix makes the encoding
    injective instead. Integer labels are rendered as decimal strings
    first (distinct ints → distinct digit strings, so injectivity
    holds). Accepts pyarrow arrays or numpy vectors."""
    if not isinstance(a, (pa.Array, pa.ChunkedArray)):
        a = pa.array(a)
    if not isinstance(b, (pa.Array, pa.ChunkedArray)):
        b = pa.array(b)
    a = pc.cast(a, pa.string())
    b = pc.cast(b, pa.string())
    ln = pc.cast(pc.utf8_length(a), pa.string())
    return pc.binary_join_element_wise(ln, a, b, ":")


def _edge_keys(oriented: ray.data.Dataset) -> ray.data.Dataset:
    """Both key orders of every oriented edge — a wedge's two endpoints may
    be closed by an edge oriented either way between them."""

    def edge_keys(t: pa.Table) -> pa.Table:
        key = _pair_key(t.column("s"), t.column("t"))
        rev = _pair_key(t.column("t"), t.column("s"))
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (key, rev)])
        return pa.table({"pair": both})

    return oriented.map_batches(edge_keys, batch_format="pyarrow",
                                zero_copy_batch=True)


def _adjacency_wedges(block: pa.Table, max_adj: int, keep_apex: bool):
    """Vectorized wedge enumeration over one coarse partition of oriented
    edges: per apex, all out-neighbor pairs via ``np.triu_indices``.
    Returns (a, b, apex, truncated) numpy arrays (apex None-filled when
    ``keep_apex`` is False)."""
    s = _col_np(block.column("s"))
    t_ = _col_np(block.column("t"))
    order = np.lexsort((t_, s))
    s, t_ = s[order], t_[order]
    starts = np.concatenate(([0], np.flatnonzero(s[1:] != s[:-1]) + 1,
                             [len(s)]))
    a_out, b_out, apex_out = [], [], []
    truncated = False
    for i in range(len(starts) - 1):
        adj = t_[starts[i]:starts[i + 1]]
        if len(adj) > max_adj:
            adj = adj[:max_adj]
            truncated = True
        iu, ju = np.triu_indices(len(adj), k=1)
        if len(iu) == 0:
            continue
        a_out.append(adj[iu])
        b_out.append(adj[ju])
        if keep_apex:
            apex_out.append(np.full(len(iu), s[starts[i]], dtype=s.dtype))
    if not a_out:
        return None, None, None, truncated
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    apex = np.concatenate(apex_out) if keep_apex else None
    return a, b, apex, truncated


def triangle_count(
    edges: ray.data.Dataset,
    a_col: str = "src",
    b_col: str = "dst",
    max_adj: int = 10_000,
    n_partitions: int = 32,
    dense_node_threshold: int = 16_384,
) -> ray.data.Dataset:
    """Exact triangle count over an undirected graph given as an edge list
    (direction and duplicates ignored; self-loops dropped) — the standard
    multi-way self-join benchmark and the clustering-coefficient numerator.

    Two routes, selected by node count (the same broadcast-vs-sharded
    routing as :func:`pagerank`; parity pinned in pytest):

    - **dense** (|V| ≤ ``dense_node_threshold``): a V²/8-byte bitset
      adjacency matrix builds in one task and broadcasts; each edge block
      popcounts ``N(u) & N(v)`` — O(E·V/64) word ops, zero wedge exchange.
      On dense graphs (co-purchase projections, similarity graphs) the
      wedge count is Θ(Σ deg²) ≫ E and this path wins by orders of
      magnitude (measured 21.4 s → 3.9 s on the sf0.1 supplier projection).
    - **sparse/large** (compact-forward, public): orient every edge from
      the (degree, node)-smaller endpoint, enumerate wedges per coarse
      src partition with vectorized ``triu_indices`` + a polars
      count-combine, close them with ONE bucket join against the oriented
      edge set (length-prefixed injective pair keys). ``max_adj`` caps a
      single adjacency list (``truncated`` flag).

    Output: one row ``(n_triangles, truncated)``.
    """
    import polars as pl

    from .joins import bucket_hash_join
    from .util import coarse_partitioned

    und = _normalize_edges(edges, a_col, b_col)
    _, nodes, degs = _degrees(und)

    if len(nodes) <= dense_node_threshold:
        commons = _dense_edge_commons(und, nodes)
        # each triangle is counted once per incident edge (3x total)
        total = commons.sum("c") or 0
        return ray.data.from_arrow(pa.table({
            "n_triangles": pa.array([int(total) // 3], pa.int64()),
            "truncated": pa.array([False]),
        }))

    oriented = _orient(und, nodes, degs)

    def wedges(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([pa.field("pair", pa.string()),
                                pa.field("n", pa.int64()),
                                pa.field("trunc", pa.bool_())])
        if block.num_rows == 0:
            return out_schema.empty_table()
        a, b, _, truncated = _adjacency_wedges(block, max_adj, keep_apex=False)
        if a is None:
            return out_schema.empty_table()
        key = _pair_key(a, b)
        agg = (
            pl.from_arrow(pa.table({"pair": key}))
            .group_by("pair").len("n")
            .to_arrow()
        )
        agg = agg.cast(pa.schema([pa.field("pair", pa.string()),
                                  pa.field("n", pa.int64())]))
        return agg.append_column(
            "trunc", pa.array([truncated] * agg.num_rows))

    wedge_ds = coarse_partitioned(oriented, "s", wedges,
                                  n_partitions=n_partitions)
    matched = bucket_hash_join(wedge_ds, _edge_keys(oriented), on="pair",
                               num_buckets=n_partitions)

    def reduce_part(t: pa.Table) -> pa.Table:
        n = int(pc.sum(t.column("n")).as_py() or 0) if t.num_rows else 0
        tr = bool(pc.any(t.column("trunc")).as_py()) if t.num_rows else False
        return pa.table({"n_triangles": pa.array([n], pa.int64()),
                         "truncated": pa.array([tr])})

    parts = matched.map_batches(reduce_part, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
    return ray.data.from_arrow(pa.table({
        "n_triangles": pa.array([sum(r["n_triangles"] for r in parts)],
                                pa.int64()),
        "truncated": pa.array([any(r["truncated"] for r in parts)]),
    }))


def local_clustering(
    edges: ray.data.Dataset,
    a_col: str = "src",
    b_col: str = "dst",
    max_adj: int = 10_000,
    n_partitions: int = 32,
    digits: int = 6,
    dense_node_threshold: int = 16_384,
) -> ray.data.Dataset:
    """Per-node triangle counts and local clustering coefficient
    ``cc(v) = 2·T(v) / (d(v)·(d(v)−1))`` — the neighborhood-density signal
    (how clique-like is each node's egonet). Routes like
    :func:`triangle_count`: below ``dense_node_threshold`` the broadcast
    bitset path computes per-EDGE common-neighbor counts and attributes
    them to both endpoints (a triangle {u,v,w} reaches node v through its
    two incident edges, so T(v) = Σ_incident c / 2); above it, the
    oriented wedge join keeps apex + both endpoints as columns so each
    closed triangle attributes to all THREE corners. Per-node counts
    combine map-side either way. Nodes with degree < 2 get cc = 0.

    Output: (node, degree, triangles, cc) with cc rounded to ``digits``.
    """
    from .aggregates import grouped_agg_fast
    from .joins import bucket_hash_join
    from .util import coarse_partitioned

    und = _normalize_edges(edges, a_col, b_col)
    deg_ds, nodes, degs = _degrees(und)

    if len(nodes) <= dense_node_threshold:
        commons = _dense_edge_commons(und, nodes)

        def endpoint_rows(t: pa.Table) -> pa.Table:
            both = pa.concat_arrays([
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in (t.column("u"), t.column("v"))])
            cc2 = pa.concat_arrays([
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in (t.column("c"), t.column("c"))])
            return pa.table({"node": both, "c": cc2})

        half = grouped_agg_fast(
            commons.map_batches(endpoint_rows, batch_format="pyarrow",
                                zero_copy_batch=True),
            keys=["node"], specs=[("c2", "c", "sum")],
        )
        tri_counts = half.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "triangles": pc.cast(
                    pc.divide(t.column("c2"), pa.scalar(2)), pa.int64()),
            }),
            batch_format="pyarrow", zero_copy_batch=True)
        joined = bucket_hash_join(deg_ds, tri_counts, on="node",
                                  join_type="left outer",
                                  num_buckets=n_partitions)
        return joined.map_batches(_cc_finish(digits), batch_format="pyarrow",
                                  zero_copy_batch=True)

    oriented = _orient(und, nodes, degs)
    label_t = pa.int64() if nodes.dtype == np.int64 else pa.string()

    def wedges(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([pa.field("pair", pa.string()),
                                pa.field("wa", label_t),
                                pa.field("wb", label_t),
                                pa.field("apex", label_t)])
        if block.num_rows == 0:
            return out_schema.empty_table()
        a, b, apex, _ = _adjacency_wedges(block, max_adj, keep_apex=True)
        if a is None:
            return out_schema.empty_table()
        aa = pa.array(a, label_t)
        bb = pa.array(b, label_t)
        return pa.table({"pair": _pair_key(aa, bb), "wa": aa, "wb": bb,
                         "apex": pa.array(apex, label_t)})

    wedge_ds = coarse_partitioned(oriented, "s", wedges,
                                  n_partitions=n_partitions)
    matched = bucket_hash_join(wedge_ds, _edge_keys(oriented), on="pair",
                               num_buckets=n_partitions)

    # each matched wedge is one triangle {apex, wa, wb}: 3 corner rows
    def corners(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], label_t)})
        both = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (t.column("apex"), t.column("wa"), t.column("wb"))])
        return pa.table({"node": both})

    tri_counts = grouped_agg_fast(
        matched.map_batches(corners, batch_format="pyarrow",
                            zero_copy_batch=True),
        keys=["node"], specs=[], count_alias="triangles",
    )

    joined = bucket_hash_join(deg_ds, tri_counts, on="node",
                              join_type="left outer",
                              num_buckets=n_partitions)

    return joined.map_batches(_cc_finish(digits), batch_format="pyarrow",
                              zero_copy_batch=True)


def _cc_finish(digits: int):
    """(node, degree, triangles-or-null) → (node, degree, triangles, cc):
    shared final projection of both local-clustering routes."""

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

    return finish
