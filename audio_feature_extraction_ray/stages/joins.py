"""Joins: broadcast hash join (small dim side), anti/semi joins, and a thin
wrapper over Ray's distributed hash join for large–large cases.

Reference recasts (SURVEY.md §2.5): the teacher↔student pairing equi-join (J1,
00_audio_data_collection_experiment/audio_quality_assessment.py:57-91), the
Excel scores lookup (J3, 00/src/main.py:24-31 — classic small-side broadcast),
and missing-counterpart detection (J2 anti-join,
05_dtw_alignment_experiment/dtw_alignment.py:1466-1468).

The broadcast join puts the small side in the object store ONCE (``ray.put``)
and every map task does a zero-copy pyarrow (Acero) join per batch — no
shuffle of the big side, the right pattern for dim tables at 100 TB scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


class _BroadcastJoiner:
    """Actor-pool stage holding the broadcast side (fetched once per actor)."""

    def __init__(self, small_ref, keys, join_type, rsuffix):
        self.small: pa.Table = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.keys = keys
        self.join_type = join_type
        self.rsuffix = rsuffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small,
            keys=self.keys,
            join_type=self.join_type,
            right_suffix=self.rsuffix,
        )


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table | ray.data.Dataset,
    keys: str | list[str],
    join_type: str = "inner",
    rsuffix: str = "_r",
    batch_size: int | None = 4096,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory table without shuffling.

    ``small`` may be a pyarrow Table or a (small!) Dataset that is collected
    on the driver. join_type follows pyarrow: 'inner', 'left outer', ...
    """
    if isinstance(small, ray.data.Dataset):
        tables = list(small.iter_batches(batch_format="pyarrow", batch_size=None))
        small = pa.concat_tables(tables) if tables else small.schema().empty_table()
    small = small.combine_chunks()
    ref = ray.put(small)
    keys = [keys] if isinstance(keys, str) else list(keys)
    return big.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, keys, join_type, rsuffix),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def broadcast_lookup(
    big: ray.data.Dataset,
    small: pa.Table | ray.data.Dataset,
    key: str,
    value_cols: list[str],
    small_key: str | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Attach dimension columns to ``big`` by a broadcast UNIQUE-key lookup —
    the sorted-array/searchsorted fast path of :func:`broadcast_join` for the
    dominant dim-table shape (numeric unique key → a few value columns).

    The small side's key is sorted ONCE into a numpy array and ``ray.put``
    with the value columns; every map task then does one vectorized
    ``np.searchsorted`` per batch instead of rebuilding an Acero hash join
    (measured 2.4× faster on the lineitem→orders custkey attach at sf0.1).
    ``how='inner'`` drops probe rows with no match; ``'left'`` attaches
    nulls. NULL probe keys are always misses. Falls back to requiring a
    numpy-sortable (numeric) key — use :func:`broadcast_join` for string or
    composite keys. The small side must be unique on ``small_key``
    (duplicate keys would need the general join) — asserted at build time.
    """
    if isinstance(small, ray.data.Dataset):
        tabs = list(small.iter_batches(batch_format="pyarrow", batch_size=None))
        small = pa.concat_tables(tabs) if tabs else small.schema().empty_table()
    small_key = small_key or key
    skey = small.column(small_key).combine_chunks()
    if skey.null_count:
        # a NULL dim key can never match (SQL equi-join) — drop the row up
        # front; leaving it in would also degrade int64 keys to float64 in
        # to_numpy, colliding keys above 2^53 onto the WRONG dim row
        small = small.filter(pc.is_valid(skey))
        skey = small.column(small_key).combine_chunks()
    keys_np = skey.to_numpy(zero_copy_only=False)
    order = np.argsort(keys_np, kind="stable")
    keys_np = keys_np[order]
    assert len(keys_np) == 0 or (keys_np[1:] != keys_np[:-1]).all(), (
        "broadcast_lookup requires a unique small-side key; "
        "use broadcast_join for many-to-many")
    vals = {c: pc.take(small.column(c).combine_chunks(), pa.array(order))
            for c in value_cols}
    ref = ray.put((keys_np, vals))
    out_types = {c: small.schema.field(c).type for c in value_cols}

    def fn(batch: pa.Table) -> pa.Table:
        kn, vs = ray.get(ref)
        probe_arr = batch.column(key).combine_chunks()
        if probe_arr.null_count:
            null_mask = np.asarray(probe_arr.is_null())
            ty = probe_arr.type
            if pa.types.is_integer(ty):
                # fill_null keeps the NATIVE dtype: to_numpy on a nullable
                # int64 column degrades to float64, where keys above 2^53
                # collide and can hit the WRONG small-side row for the
                # batch's non-null probes too. Sentinels are masked below.
                probe = probe_arr.fill_null(0).to_numpy(zero_copy_only=False)
            elif pa.types.is_string(ty) or pa.types.is_large_string(ty):
                # None objects would crash searchsorted's str comparisons
                probe = probe_arr.fill_null("").to_numpy(zero_copy_only=False)
            elif pa.types.is_binary(ty) or pa.types.is_large_binary(ty):
                probe = probe_arr.fill_null(b"").to_numpy(zero_copy_only=False)
            else:
                # float → NaN, temporal → NaT: both sort/compare inertly in
                # their native dtype, and the mask belts the miss anyway
                probe = probe_arr.to_numpy(zero_copy_only=False)
        else:
            null_mask = None
            probe = probe_arr.to_numpy(zero_copy_only=False)
        if len(kn) == 0:
            idx = np.zeros(len(probe), dtype=np.int64)
            hit = np.zeros(len(probe), dtype=bool)
        else:
            idx = np.searchsorted(kn, probe)
            idx_c = np.minimum(idx, len(kn) - 1)
            with np.errstate(invalid="ignore"):
                hit = kn[idx_c] == probe
            idx = idx_c
        if null_mask is not None:
            hit &= ~null_mask
        cols = {c: batch.column(c) for c in batch.column_names}
        if how == "inner":
            if not hit.all():
                batch = batch.filter(pa.array(hit))
                idx = idx[hit]
                cols = {c: batch.column(c) for c in batch.column_names}
            for c in value_cols:
                cols[c] = pc.take(vs[c], pa.array(idx, pa.int64()))
        else:  # left: nulls on miss
            take_idx = np.where(hit, idx, -1).astype(np.int64)
            ti = pa.array(np.where(take_idx < 0, None, take_idx),
                          pa.int64(), from_pandas=True)
            for c in value_cols:
                cols[c] = pc.take(vs[c], ti)
        out = pa.table(cols)
        if out.num_rows == 0:
            fields = [batch.schema.field(c) for c in batch.column_names]
            fields += [pa.field(c, out_types[c]) for c in value_cols
                       if c not in batch.column_names]
            return pa.schema(fields).empty_table()
        return out

    return big.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)


def broadcast_semi_join(
    big: ray.data.Dataset,
    small_keys: pa.Table,
    key: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Keep big rows whose ``key`` is (anti: is not) present in the small key
    set — membership test via ``pc.is_in`` against a broadcast value set."""
    values = ray.put(small_keys.column(key).combine_chunks())

    def fn(batch: pa.Table) -> pa.Table:
        vs = ray.get(values)
        mask = pc.is_in(batch.column(key), value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _BloomFilter:
    """Vectorized Bloom filter over int64/string keys: k polars row hashes
    with distinct seeds index one numpy bit array. Build and probe are both
    columnar; NO false negatives by construction, false-positive rate
    ~(1 - e^{-kn/m})^k."""

    def __init__(self, n_keys: int, fpp: float = 0.01):
        import math

        n = max(n_keys, 1)
        m = max(8, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / n * math.log(2)))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    @classmethod
    def with_params(cls, m: int, k: int) -> "_BloomFilter":
        """Empty filter with explicit geometry — lets distributed build tasks
        construct size-identical partials that OR-merge losslessly."""
        obj = cls.__new__(cls)
        obj.m, obj.k = m, k
        obj.bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        return obj

    def _hashes(self, arr: pa.Array) -> np.ndarray:
        import polars as pl

        t = pa.table({"k": arr})
        hs = np.empty((self.k, len(arr)), dtype=np.uint64)
        for j in range(self.k):
            hs[j] = pl.from_arrow(t).hash_rows(seed=1000 + j).to_numpy()
        return hs % np.uint64(self.m)

    def add(self, arr: pa.Array) -> None:
        for pos in self._hashes(arr):
            np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains(self, arr: pa.Array) -> np.ndarray:
        out = np.ones(len(arr), dtype=bool)
        for pos in self._hashes(arr):
            out &= (self.bits[pos >> np.uint64(3)]
                    >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return out


def bloom_semi_join(
    big: ray.data.Dataset,
    keys_ds: ray.data.Dataset,
    key: str,
    keys_col: str | None = None,
    fpp: float = 0.01,
) -> ray.data.Dataset:
    """APPROXIMATE semi-join pre-filter: keep big-side rows whose key
    PROBABLY appears in ``keys_ds`` — never drops a true match (no false
    negatives), passes ~``fpp`` of non-matching rows. The scale pattern when
    the key set itself is too large to broadcast exactly (10^9 keys ≈ GBs;
    the Bloom filter is 10–100x smaller): Bloom-prefilter here, then
    exact-join the surviving fraction.

    The build is DISTRIBUTED — the key list never materializes anywhere:
    each build block sets bits into its own m-bit partial array (emitted as
    ONE fixed-size binary row), partials OR-merge in a single combine task,
    and the driver holds only the final m-bit array (sized from the build
    side's ROW count, which upper-bounds its distinct count — repeats only
    oversize m, i.e. lower the real fpp). Filter geometry (m, k) is fixed
    up front so partials merge losslessly.
    """
    import ray as _ray

    kc = keys_col or key
    # pin the key pipeline: count() would otherwise EXECUTE it once for
    # sizing and the partial-bits scan would execute it again — doubling
    # the cost whenever keys_ds is a computed pipeline, not a raw read
    keys_ds = keys_ds.select_columns([kc]).materialize()
    n_est = keys_ds.count()
    proto = _BloomFilter(n_est, fpp)
    m, k = proto.m, proto.k

    def partial_bits(t: pa.Table) -> pa.Table:
        f = _BloomFilter.with_params(m, k)
        if t.num_rows:
            col = t.column(kc)
            f.add(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.large_binary())})

    merged = (
        keys_ds
        .map_batches(partial_bits, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .repartition(1)
        .map_batches(
            lambda t: pa.table({"bits": pa.array(
                [np.bitwise_or.reduce(
                    np.frombuffer(b"".join(t.column("bits").to_pylist()), dtype=np.uint8)
                    .reshape(-1, (m + 7) // 8), axis=0).tobytes()], pa.large_binary())}),
            batch_format="pyarrow", batch_size=None,
        )
    )
    parts = list(merged.iter_batches(batch_format="pyarrow", batch_size=None))
    bf = _BloomFilter.with_params(m, k)
    for p in parts:
        for b in p.column("bits").to_pylist():
            bf.bits |= np.frombuffer(b, dtype=np.uint8)
    ref = _ray.put(bf)

    def fn(batch: pa.Table) -> pa.Table:
        f: _BloomFilter = _ray.get(ref)
        col = batch.column(key)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return batch.filter(pa.array(f.contains(col)))

    return big.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Large–large distributed hash join (Ray Data native shuffle join)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is not None:
        right_on = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions, on=on, right_on=right_on
    )


def bucket_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_buckets: int = 16,
    rsuffix: str = "_r",
) -> ray.data.Dataset:
    """Large–large equi-join on our own primitives: ONE union + groupby(bucket)
    shuffle, per-bucket zero-copy Acero hash join.

    Both sides get ``__bucket = hash(key) % num_buckets`` (columnar polars row
    hash — identical buckets for identical key values on both sides), are
    schema-aligned into one union (non-own columns null), and each bucket group
    joins its two slices with ``pa.Table.join``. Neither input is ever
    collected on the driver and no task holds more than one bucket — the
    100 TB-safe large–large shape; skewed keys are bounded by the bucket count
    (raise ``num_buckets``, or pre-aggregate/salt upstream for a hot key).

    Wall-time is on par with Ray's native ``Dataset.join`` at bench scale
    (~2.9 s each on lineitem⋈orders at sf0.1; the native join was 3x slower
    in round 1 and has since improved). The value of this variant is
    compositional: it is a plain Dataset-in/Dataset-out primitive our other
    operators embed (connected-components label joins, dedup signature
    verification) with explicit control over bucketing and key normalization.
    """
    from .util import arrow_schema_of

    right_on = right_on or on
    left, lschema = arrow_schema_of(left)
    right, rschema = arrow_schema_of(right)
    lcols = list(zip(lschema.names, lschema.types))
    key_type = lschema.types[lschema.names.index(on)]
    # right columns as they appear post-join (key consumed, clashes suffixed)
    lnames = set(lschema.names)
    rcols = [
        (n + rsuffix if n in lnames else n, t)
        for n, t in zip(rschema.names, rschema.types)
        if n != right_on
    ]
    # suffixing must not collide with a right column literally named that way
    # (e.g. right has both 'x' → 'x_r' AND a native 'x_r'): the dict-keyed
    # union schema would silently collapse the two and join wrong data
    rout_names = [n for n, _ in rcols]
    if len(set(rout_names)) != len(rout_names):
        dupes = sorted({n for n in rout_names if rout_names.count(n) > 1})
        raise ValueError(
            f"bucket_hash_join: right-side output column(s) {dupes} are "
            f"ambiguous after applying rsuffix={rsuffix!r} — rename the "
            f"clashing column(s) or pick a collision-free suffix"
        )
    # ...and must not collide with a LEFT column either (e.g. left already
    # has 'x_r' while right's 'x' suffixes to 'x_r'): prep_left would
    # overwrite the left data with nulls and the duplicated union-schema
    # field crashes the per-bucket select
    cross = sorted(set(rout_names) & lnames)
    if cross:
        raise ValueError(
            f"bucket_hash_join: suffixed right column(s) {cross} collide "
            f"with left column(s) of the same name — rename them or pick a "
            f"collision-free rsuffix (got {rsuffix!r})"
        )
    union_fields = lcols + rcols + [("__side", pa.int8()), ("__bucket", pa.int32())]
    union_names = [n for n, _ in union_fields]

    from .util import key_bucketer

    bucket_of = key_bucketer(key_type, num_buckets)

    def prep_left(t: pa.Table) -> pa.Table:
        out = {n: t.column(n) for n, _ in lcols}
        for n, typ in rcols:
            out[n] = pa.nulls(t.num_rows, typ)
        out["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        out["__bucket"] = bucket_of(t.column(on))
        return pa.table({n: out[n] for n in union_names})

    def prep_right(t: pa.Table) -> pa.Table:
        out: dict = {}
        for n, typ in lcols:
            if n == on:
                out[n] = t.column(right_on).cast(key_type)
            else:
                out[n] = pa.nulls(t.num_rows, typ)
        for n, _ in rcols:
            src = n[: -len(rsuffix)] if n.endswith(rsuffix) and n not in rschema.names else n
            out[n] = t.column(src)
        out["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        out["__bucket"] = bucket_of(t.column(right_on))
        return pa.table({n: out[n] for n in union_names})

    lt = left.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)
    out_schema = pa.schema([pa.field(n, t) for n, t in lcols + rcols])

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 1)
        lpart = group.filter(lmask).select([n for n, _ in lcols])
        rpart = group.filter(pc.invert(lmask)).select([on] + [n for n, _ in rcols])
        joined = lpart.join(rpart, keys=[on], join_type=join_type)
        # Acero may reorder columns; restore the declared layout
        return joined.select(out_schema.names).cast(out_schema)

    return unioned.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")
