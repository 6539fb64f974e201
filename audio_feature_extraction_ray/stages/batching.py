"""Training-batch shaping: aspect-ratio bucketing + global batch assignment.

Training dataloaders over variable-shape images group samples into
near-uniform aspect buckets so each batch pads to one target shape (the
standard trick in large-scale vision/diffusion training). The reference's
analog is the dynamic frame-length adjuster that groups equal-shape frame
matrices before stacking (04_feature_extraction_experiment/.../
feature_extractor.py dynamic n_fft sizing); here the grouping is explicit,
distributed, and deterministic.

``assign_aspect_buckets`` is a stateless metadata map (never decodes bytes);
``with_batch_ids`` adds a per-bucket global batch id via ONE bucket-hash
exchange — batch ids are deterministic (ordered by (image_id, ts)), so a
resumed job rebuilds the same batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .util import widen_blocks

DEFAULT_BUCKETS: tuple[float, ...] = (0.5, 2 / 3, 0.75, 1.0, 4 / 3, 1.5, 2.0)

_PACK_SCHEMA = pa.schema([
    pa.field("batch_id", pa.int64()),
    pa.field("aspect_bucket", pa.int32()),
    pa.field("th", pa.int32()), pa.field("tw", pa.int32()),
    pa.field("n_ok", pa.int32()),
    pa.field("image_ids", pa.list_(pa.string())),
    pa.field("ts_us", pa.list_(pa.int64())),
    pa.field("pixels", pa.large_binary()),
    pa.field("token_ids", pa.large_binary()),
    pa.field("token_offsets", pa.list_(pa.int32())),
    pa.field("failed_ids", pa.list_(pa.string())),
])


def _bucket_targets(buckets: tuple[float, ...], target_area: int) -> list[tuple[int, int]]:
    """Canonical (th, tw) per aspect bucket: constant area, bucket's ratio."""
    out = []
    for r in np.asarray(sorted(buckets), dtype=np.float64):
        th = int(round(np.sqrt(target_area / r)))
        tw = int(round(np.sqrt(target_area * r)))
        out.append((max(th, 1), max(tw, 1)))
    return out


def _decode_resize_tokenize_cls(targets: list[tuple[int, int]]):
    """Actor-pool stage: decode bytes, area-resize to the row's bucket
    target, hash-tokenize the caption. Failures are data (status rows).
    Passes ``batch_id`` through when the input carries one (the
    shard-resume path assigns ids BEFORE decode)."""
    from ..functions import codecs
    from ..functions.imagefx import resize_area
    from ..functions.textfx import _token_hash32, bpe_ish_tokens

    class DecodeResizeTokenize:
        def __init__(self):
            _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            raw = batch.column("bytes")
            bkt = batch.column("aspect_bucket").to_numpy(zero_copy_only=False)
            caps = batch.column("caption").to_pylist()
            px_out, st_out, tok_out = [], [], []
            for i in range(n):
                th, tw = targets[int(bkt[i])]
                try:
                    px = codecs.decode_image(raw[i].as_py())
                    rz = np.stack(
                        [resize_area(px[:, :, c].astype(np.float64), th, tw)
                         for c in range(px.shape[2])], axis=2)
                    px_out.append(np.clip(np.rint(rz), 0, 255)
                                  .astype(np.uint8).tobytes())
                    st_out.append("ok")
                except codecs.DecodeError as e:
                    px_out.append(None)
                    st_out.append(f"decode_error:{str(e).split(':')[0]}")
                toks = bpe_ish_tokens(caps[i] or "")
                tok_out.append(np.array([_token_hash32(t) for t in toks],
                                        dtype=np.int32).tobytes())
            cols = {
                "image_id": batch.column("image_id"),
                "ts": batch.column("ts"),
                "aspect_bucket": batch.column("aspect_bucket"),
                "status": pa.array(st_out, pa.string()),
                "pixels": pa.array(px_out, pa.large_binary()),
                "token_ids": pa.array(tok_out, pa.large_binary()),
            }
            if "batch_id" in batch.column_names:
                cols["batch_id"] = batch.column("batch_id")
            return pa.table(cols)

    return DecodeResizeTokenize


def _sort_by_order_key(t: pa.Table) -> pa.Table:
    """Stable (image_id, ts) lexsort — THE batch order key everywhere."""
    t = t.combine_chunks()
    iid = np.asarray(t.column("image_id").to_pylist(), dtype=object)
    tsv = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    return t.take(pa.array(np.lexsort((tsv, iid)), pa.int64()))


def _pack_chunks(t: pa.Table, bucket: int, targets: list[tuple[int, int]],
                 starts: list[int], batch_ids: list) -> pa.Table:
    """Pack a SORTED single-bucket table into one row per chunk: chunk i is
    rows [starts[i], starts[i+1]) with id batch_ids[i]."""
    n = t.num_rows
    th, tw = targets[bucket]
    ids_l = t.column("image_id").to_pylist()
    ts_l = t.column("ts").cast(pa.int64()).to_pylist()
    st_l = t.column("status").to_pylist()
    px_l = t.column("pixels").to_pylist()
    tk_l = t.column("token_ids").to_pylist()
    rows: dict[str, list] = {f.name: [] for f in _PACK_SCHEMA}
    bounds = list(starts) + [n]
    for i, bid in enumerate(batch_ids):
        lo, hi = bounds[i], bounds[i + 1]
        ok = [j for j in range(lo, hi) if st_l[j] == "ok"]
        toks = [tk_l[j] for j in ok]
        lens = [len(x) // 4 for x in toks]
        rows["batch_id"].append(int(bid))
        rows["aspect_bucket"].append(bucket)
        rows["th"].append(th); rows["tw"].append(tw)
        rows["n_ok"].append(len(ok))
        rows["image_ids"].append([ids_l[j] for j in ok])
        rows["ts_us"].append([ts_l[j] for j in ok])
        rows["pixels"].append(b"".join(px_l[j] for j in ok))
        rows["token_ids"].append(b"".join(toks))
        rows["token_offsets"].append(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int32).tolist())
        rows["failed_ids"].append(
            [ids_l[j] for j in range(lo, hi) if st_l[j] != "ok"])
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in _PACK_SCHEMA},
                    schema=_PACK_SCHEMA)


def assign_aspect_buckets(
    ds: ray.data.Dataset,
    w_col: str = "w",
    h_col: str = "h",
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Append ``aspect`` (w/h, float64) and ``aspect_bucket`` (int32 index of
    the nearest bucket ratio in LOG space — so 1:2 and 2:1 are equidistant
    from square). Pure vectorized metadata math; bytes never touched."""
    b = np.asarray(sorted(buckets), dtype=np.float64)
    log_b = np.log(b)
    # midpoints in log space: searchsorted boundary = nearest-neighbor assign
    mids = (log_b[1:] + log_b[:-1]) / 2.0

    def fn(t: pa.Table) -> pa.Table:
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = t.column(h_col).to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            aspect = w / h
            # corrupt metadata (null/zero dims -> NaN/inf aspect) falls back
            # to ratio 1.0 (square = least resize distortion) instead of
            # silently landing in the WIDEST bucket via searchsorted's
            # NaN/inf end-position behavior
            safe = np.where(np.isfinite(aspect), aspect, 1.0)
            idx = np.searchsorted(mids, np.log(np.maximum(safe, 1e-12)))
        t = t.append_column("aspect", pa.array(aspect, pa.float64(), from_pandas=True))
        return t.append_column("aspect_bucket", pa.array(idx.astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def with_batch_ids(
    ds: ray.data.Dataset,
    batch_size: int,
    order_cols: tuple[str, str] = ("image_id", "ts"),
    bucket_col: str = "aspect_bucket",
) -> ray.data.Dataset:
    """Append a global, deterministic ``batch_id`` within each aspect bucket:
    rows ordered by ``order_cols`` inside their bucket, chunked into
    ``batch_size`` groups. One bucket-hash exchange co-locates each bucket;
    the id is (bucket << 32) | (row_number // batch_size), collision-free up
    to 2^32 batches per bucket.

    SCALE NOTE: one bucket = one task's sort (buckets are few and balanced
    by construction — ratios cluster near the chosen grid). For a corpus
    where a single bucket exceeds task memory, pre-split by a coarse hash of
    ``order_cols[0]`` and accept per-split batch numbering (documented
    trade; training only needs uniform-shape batches, not a global order).
    """

    def per_bucket(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("batch_id", pa.array([], pa.int64()))
        t = t.combine_chunks()
        a = t.column(order_cols[0]).to_numpy(zero_copy_only=False)
        b = t.column(order_cols[1]).to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        t = t.take(pa.array(order, pa.int64()))
        bucket = int(t.column(bucket_col)[0].as_py())
        bid = (np.int64(bucket) << np.int64(32)) | (np.arange(n, dtype=np.int64) // batch_size)
        return t.append_column("batch_id", pa.array(bid, pa.int64()))

    return ds.groupby(bucket_col).map_groups(per_bucket, batch_format="pyarrow")



# per-worker-process decoder cache for the task-pool path (same
# load-once-per-worker semantics as the actor pool without its
# per-execution spin-up; see stages/features.py for the measured trade)
_DECODE_WORKERS: dict = {}


def _decode_task(batch, *, buckets, target_area):
    key = (tuple(buckets), int(target_area))
    f = _DECODE_WORKERS.get(key)
    if f is None:
        f = _DECODE_WORKERS[key] = _decode_resize_tokenize_cls(
            _bucket_targets(list(buckets), target_area))()
    return f(batch)


def _rk_of(t: pa.Table) -> pa.Array:
    """The batch order key (image_id, ts) folded into one string column —
    Acero-joinable and broadcast-lookupable without nested types."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        t.column("image_id").cast(pa.string()),
        pc.cast(t.column("ts").cast(pa.int64()), pa.string()), "@")


def _attach_ids(
    ds: ray.data.Dataset,
    ids: ray.data.Dataset,
    broadcast_threshold: int,
) -> ray.data.Dataset:
    """Attach metadata-assigned ``batch_id`` to raw image rows by row key.

    ``ids`` carries (``image_id``, ``ts``, ``batch_id``); the projection to
    (``__rk``, ``batch_id``) scalars happens here — the row-key scheme lives
    in ONE place. Below ``broadcast_threshold`` id rows the id table is
    ``ray.put`` once and looked up inside every map task — the raw bytes
    never enter an exchange; above it, one :func:`~.joins.bucket_hash_join`
    co-locates the raw rows with the id scalars (that route DOES move the
    raw bytes through the join's bucket exchange — count it when tuning the
    threshold). Raw rows without an id (committed shards, rows before a
    resume cursor) are dropped either way. The metadata pass executes HERE,
    at pipeline-construction time (the id table must exist to broadcast)."""
    import pyarrow.compute as pc

    import ray as _ray

    def id_rows(t: pa.Table) -> pa.Table:
        return pa.table({"__rk": _rk_of(t), "batch_id": t.column("batch_id")})

    ids_mat = ids.map_batches(id_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    if ids_mat.count() <= broadcast_threshold:
        parts = list(ids_mat.iter_batches(batch_format="pyarrow", batch_size=None))
        idt = (pa.concat_tables(parts).combine_chunks() if parts
               else pa.schema([pa.field("__rk", pa.string()),
                               pa.field("batch_id", pa.int64())]).empty_table())
        ref = _ray.put(idt)

        def attach(t: pa.Table) -> pa.Table:
            m: pa.Table = _ray.get(ref)
            idx = pc.index_in(_rk_of(t), value_set=m.column("__rk").combine_chunks())
            t = t.append_column(
                "batch_id", pc.take(m.column("batch_id").combine_chunks(), idx))
            return t.filter(pc.is_valid(t.column("batch_id")))

        return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    from .joins import bucket_hash_join

    raw = ds.map_batches(lambda t: t.append_column("__rk", _rk_of(t)),
                         batch_format="pyarrow", zero_copy_batch=True)
    return bucket_hash_join(raw, ids_mat, on="__rk").drop_columns(["__rk"])


def _decode_pack_by_id(
    tagged: ray.data.Dataset,
    targets: list[tuple[int, int]],
    buckets: tuple[float, ...],
    target_area: int,
) -> ray.data.Dataset:
    """Shared tail of the packed-batch pipelines: exchange RAW rows by
    batch id, decode AFTER the shuffle, fused into the per-batch pack —
    encoded bytes are ~10x smaller than decoded canonical pixels and the
    sort-shuffle cost is per byte (measured 428 core-s to move 6.2 GB of
    decoded pixels vs ~40 for the raw rows), so decoded pixels never cross
    the wire. Group cardinality is images/batch_size; no task ever holds
    more than one batch."""
    meta = assign_aspect_buckets(tagged, buckets=buckets)
    pack = _pack_by_id_fn(targets)
    bkts, area = tuple(buckets), int(target_area)

    def decode_pack(group: pa.Table) -> pa.Table:
        return pack(_decode_task(group, buckets=bkts, target_area=area))

    return widen_blocks(meta).groupby("batch_id").map_groups(
        decode_pack, batch_format="pyarrow")


def _pack_by_id_fn(targets: list[tuple[int, int]]):
    """Per-batch packer for ``groupby(batch_id).map_groups`` — each group is
    exactly one pre-assigned batch."""

    def pack_by_id(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PACK_SCHEMA.empty_table()
        t = _sort_by_order_key(t)
        bucket = int(t.column("aspect_bucket")[0].as_py())
        bid = int(t.column("batch_id")[0].as_py())
        return _pack_chunks(t, bucket, targets, [0], [bid])

    return pack_by_id


def training_batches_ds(
    ds: ray.data.Dataset,
    batch_size: int = 8,
    target_area: int = 256 * 256,
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
    start_after: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    decode_batch_size: int = 32,
    broadcast_ids_threshold: int = 2_000_000,
    meta_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """One packed row per deterministic training batch — the distributed
    half of :func:`iter_training_batches`.

    Shape (metadata first, ONE raw-byte exchange, per-BATCH packing): batch
    ids are assigned by a no-decode pass over (image_id, ts, w, h) scalars
    (:func:`with_batch_ids` — ``(bucket << 32) | seq``), attached to the raw
    rows via a broadcast lookup (``ray.put`` of the id table; above
    ``broadcast_ids_threshold`` rows a :func:`~.joins.bucket_hash_join`
    instead — NOTE that route moves the raw bytes through the join's bucket
    exchange too, i.e. two raw-byte exchanges total), decode +
    bucket-canonical resize + caption tokenization run IN PLACE, then a
    single ``groupby(batch_id)`` exchange packs every batch into one row:
    stacked uint8 pixel blob + int32 caption token-id blob + per-image
    offsets. Packing is keyed by batch_id — cardinality ≈ images/batch_size
    — so no task ever holds more than one batch; the earlier
    ``groupby(aspect_bucket)`` variant serialized each bucket's whole packing
    into one task (measured: a 51.7 s straggler packing the dominant bucket
    at 6.5k images while 43 tasks idled).

    ``start_after`` is the resume cursor (the last fully consumed
    batch_id): ids are metadata-deterministic, so resume is a plain
    ``batch_id > cursor`` filter BEFORE any byte is decoded, and a resumed
    run's batches are bit-identical to a clean run's. Rows must be unique
    on ``(image_id, ts)`` (the batch order key). Failed decodes stay
    deterministic: they occupy their metadata-assigned batch slot and are
    reported in ``failed_ids`` rather than shifting later batches.

    ``concurrency`` and ``decode_batch_size`` are accepted for backward
    compatibility and ignored: decode now runs fused inside the per-batch
    pack task, so there is no separate decode stage to size.

    Reference lifecycle analog: the per-batch student-feature loop at
    04_feature_extraction_experiment/feature_extraction_for_student.py:152-197.
    """
    del concurrency, decode_batch_size
    targets = _bucket_targets(buckets, target_area)
    # metadata pass: pass ``meta_ds`` (a column-pruned read of the same
    # table) so id assignment never touches pixel bytes; the default derives
    # it from ``ds`` by projection, which over a generator source re-runs
    # generation just to drop the bytes
    meta_src = (meta_ds if meta_ds is not None
                else ds.select_columns(["image_id", "ts", "w", "h"]))
    ids = with_batch_ids(
        assign_aspect_buckets(meta_src, buckets=buckets),
        batch_size, bucket_col="aspect_bucket",
    )
    if start_after is not None:
        ids = ids.filter(expr=f"batch_id > {int(start_after)}")

    tagged = _attach_ids(ds, ids, broadcast_ids_threshold)
    return _decode_pack_by_id(tagged, targets, buckets, target_area)


def _unpack_batch_row(row) -> dict:
    n, th, tw = int(row["n_ok"]), int(row["th"]), int(row["tw"])
    px = np.frombuffer(row["pixels"], dtype=np.uint8).reshape(n, th, tw, 3)
    toks = np.frombuffer(row["token_ids"], dtype=np.int32)
    offs = np.asarray(row["token_offsets"], dtype=np.int64)
    return {
        "batch_id": int(row["batch_id"]),
        "aspect_bucket": int(row["aspect_bucket"]),
        "pixels": px.astype(np.float32) / np.float32(255.0),
        "token_ids": [toks[offs[i]:offs[i + 1]] for i in range(n)],
        "image_ids": list(row["image_ids"]),
        "ts_us": list(row["ts_us"]),
        "failed_ids": list(row["failed_ids"]),
    }


def _read_cursor(path: str) -> int | None:
    import json
    import os

    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(json.load(f)["last_batch_id"])


def _write_cursor(path: str, batch_id: int) -> None:
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_batch_id": int(batch_id)}, f)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn cursor


def iter_training_batches(
    ds: ray.data.Dataset,
    batch_size: int = 8,
    target_area: int = 256 * 256,
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
    start_after: int | None = None,
    cursor_path: str | None = None,
    concurrency: int | tuple[int, int] | None = None,
    meta_ds: ray.data.Dataset | None = None,
):
    """Consume :func:`training_batches_ds` as a training loop would: yields
    one dict per batch in ascending ``batch_id`` order —
    ``pixels`` float32 (n_ok, th, tw, 3) in [0, 1], ``token_ids`` a list of
    int32 arrays (hashed BPE-ish caption tokens, one per image), plus
    ``batch_id`` / ``aspect_bucket`` / ``image_ids`` / ``ts_us`` /
    ``failed_ids``. Stacking happened in the workers; the driver only
    reshapes one packed blob per batch (streaming ``iter_rows``, never a
    whole-dataset collect).

    Resume: persist the last fully consumed ``batch_id``; passing it as
    ``start_after`` replays the remaining batches byte-identically, with
    the skip pushed BEFORE the decode stage (finished work is never
    re-decoded). ``cursor_path`` automates that contract with AT-LEAST-ONCE
    delivery: the cursor file is atomically rewritten when the caller comes
    back for the NEXT batch (the only point the iterator can know the
    previous one was fully processed — the reference's
    save-progress-every-N analog,
    05_dtw_alignment_experiment/dtw_alignment.py:1323-1325). A crash (or
    ``break``) between receiving a batch and requesting the next replays
    that one batch byte-identically on resume — deterministic ids make the
    replay idempotent for any sink keyed on ``batch_id``. An explicit
    ``start_after`` overrides the cursor file.

    Pass ``meta_ds`` (a column-pruned (image_id, ts, w, h) read of the SAME
    table) so the batch-id metadata pass never executes the full source a
    second time; the default derives it by projecting ``ds``, which a
    columnar read prunes but a generator source re-runs."""
    if start_after is None and cursor_path is not None:
        start_after = _read_cursor(cursor_path)
    packed = training_batches_ds(
        ds, batch_size=batch_size, target_area=target_area, buckets=buckets,
        start_after=start_after, concurrency=concurrency, meta_ds=meta_ds,
    )
    for row in packed.sort("batch_id").iter_rows():
        out = _unpack_batch_row(row)
        yield out
        if cursor_path is not None:
            _write_cursor(cursor_path, out["batch_id"])


def _pack_shard_fn(targets: list[tuple[int, int]],
                   buckets: tuple[float, ...], target_area: int):
    """Per-SHARD decode+pack for the fused resumable writer: the group is
    one shard's RAW rows (all its batches, ids pre-assigned). Decodes one
    batch slice at a time, so peak heap is one decoded batch plus the
    shard's packed blobs — which must fit regardless, since they become one
    parquet file. Per-batch output is bit-identical to
    :func:`_pack_by_id_fn`'s (same slice → decode → order-key sort → pack)."""
    bkts, area = tuple(buckets), int(target_area)

    def pack_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PACK_SCHEMA.empty_table()
        t = t.combine_chunks()
        bid = t.column("batch_id").to_numpy(zero_copy_only=False)
        iid = np.asarray(t.column("image_id").to_pylist(), dtype=object)
        tsv = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((tsv, iid, bid))
        t = t.take(pa.array(order, pa.int64()))
        bid = bid[order]
        starts = np.flatnonzero(np.concatenate(([True], bid[1:] != bid[:-1])))
        bounds = np.concatenate((starts, [len(bid)]))
        out = []
        for i, lo in enumerate(starts):
            lo, hi = int(lo), int(bounds[i + 1])
            dec = _sort_by_order_key(
                _decode_task(t.slice(lo, hi - lo), buckets=bkts, target_area=area))
            out.append(_pack_chunks(dec, int(bid[lo] >> 32), targets,
                                    [0], [int(bid[lo])]))
        return pa.concat_tables(out)

    return pack_shard


def write_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    batch_size: int = 8,
    n_shards: int = 32,
    target_area: int = 256 * 256,
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
    concurrency: int | tuple[int, int] | None = None,
    meta_ds: ray.data.Dataset | None = None,
    broadcast_ids_threshold: int = 2_000_000,
):
    """Offline complement of :func:`iter_training_batches`: materialize the
    packed-batch table as ``n_shards`` hash-partitioned parquet shards with
    the engine's lineage manifest — multiple trainers each read a disjoint
    shard set; a failed write resumes skipping committed shards (the
    :func:`~..state.checkpoint.write_partitioned_resumable` protocol).
    Returns the manifest table (one row per shard). ``concurrency`` is
    accepted for backward compatibility and ignored (decode runs fused in
    the shard write tasks).

    Shape (ONE raw-byte exchange on the broadcast id-attach route; the
    >threshold bucket-join route adds a second): batch ids come from the
    no-decode metadata pass, committed shards' ids are dropped, survivors
    attach to the raw rows, and the writer's shard
    exchange moves those RAW encoded rows once — decode + per-batch pack
    run INSIDE each shard's write task (``group_transform``), so the packed
    table (decoded pixels, ~10x the encoded bytes; measured 6.2 GB vs
    231 MB at 32k images) never enters an exchange. shard =
    ``partition_of(batch_id)``, deterministic from metadata, which is what
    makes both the fusion and source-pruned resume possible: a
    fully-committed re-run returns the manifest without touching data; a
    partial re-run ships and decodes ONLY rows whose batch lands in an
    uncommitted shard. Resume cost is proportional to the UNFINISHED work,
    never the corpus.
    """
    del concurrency
    from ..state.checkpoint import (completed_partitions, partition_of,
                                    read_manifest, write_partitioned_resumable)

    done = completed_partitions(out_dir, n_shards)  # scheme-verified
    if len(done) == n_shards:
        return pa.Table.from_pylist(read_manifest(out_dir))
    targets = _bucket_targets(buckets, target_area)
    meta_src = (meta_ds if meta_ds is not None
                else ds.select_columns(["image_id", "ts", "w", "h"]))
    ids = with_batch_ids(assign_aspect_buckets(meta_src, buckets=buckets),
                         batch_size)
    if done:
        done_arr = np.asarray(sorted(done), dtype=np.int64)

        def drop_done(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            sh = partition_of(t.column("batch_id"), n_shards)
            return t.filter(pa.array(~np.isin(sh, done_arr)))

        ids = ids.map_batches(drop_done, batch_format="pyarrow",
                              zero_copy_batch=True)

    tagged = _attach_ids(ds, ids, broadcast_ids_threshold)
    manifest = write_partitioned_resumable(
        assign_aspect_buckets(tagged, buckets=buckets), out_dir, key="batch_id",
        n_partitions=n_shards, sort_keys=["batch_id"],
        group_transform=_pack_shard_fn(targets, buckets, target_area))
    if done:
        # Partial resume: drop_done pruned the committed shards upstream, so
        # the writer never saw their groups and `manifest` holds only the
        # newly written shards. Reload the on-disk manifest — now complete —
        # to honor the "one row per shard" return contract.
        return pa.Table.from_pylist(read_manifest(out_dir))
    return manifest


def iter_shard_batches(out_dir: str, start_after: int | None = None):
    """Replay written shards (:func:`write_training_shards`) as unpacked
    training batches in ascending ``batch_id`` order — the no-recompute
    resume path: reading skips nothing but decoding already happened."""
    import ray.data as rd

    ds = rd.read_parquet(out_dir)
    if start_after is not None:
        ds = ds.filter(expr=f"batch_id > {int(start_after)}")
    for row in ds.sort("batch_id").iter_rows():
        yield _unpack_batch_row(row)


def resize_to_bucket_stage(
    ds: ray.data.Dataset,
    target_area: int = 256 * 256,
    buckets: tuple[float, ...] = DEFAULT_BUCKETS,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    keep_pixels: bool = False,
) -> ray.data.Dataset:
    """Decode + resize every image to its aspect bucket's canonical shape —
    the step after :func:`assign_aspect_buckets` that makes batches
    uniform-shape (constant ``target_area`` pixels, bucket's ratio): all
    rows in a bucket come back ``(th, tw)``-identical, ready to stack.

    Area-pooling resize per channel (the engine's shared kernel, mean-
    preserving); actor pool warms decoder state once; resized pixels ship
    only when ``keep_pixels`` (stats + dims otherwise — training sinks
    re-encode per shard instead of shipping raw float planes).
    """
    from ..functions import codecs
    from ..functions.imagefx import resize_area

    if concurrency is None:
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        concurrency = (1, max(2, ncpu))
    targets = _bucket_targets(buckets, target_area)

    class ResizeToBucket:
        def __init__(self):
            _ = codecs._D8, codecs._QSTEP  # warm per-actor codec state

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            raw = batch.column("bytes")
            bkt = batch.column("aspect_bucket").to_numpy(zero_copy_only=False)
            out: dict[str, list] = {
                "image_id": batch.column("image_id").to_pylist(),
                "ts": batch.column("ts").to_pylist(),
                "aspect_bucket": bkt.tolist(),
                "th": [], "tw": [], "mean_px": [], "std_px": [], "status": [],
            }
            if keep_pixels:
                out["pixels"] = []
            for i in range(n):
                th, tw = targets[int(bkt[i])]
                try:
                    px = codecs.decode_image(raw[i].as_py())
                except codecs.DecodeError as e:
                    out["th"].append(0); out["tw"].append(0)
                    out["mean_px"].append(None); out["std_px"].append(None)
                    out["status"].append(f"decode_error:{str(e).split(':')[0]}")
                    if keep_pixels:
                        out["pixels"].append(None)
                    continue
                rz = np.stack(
                    [resize_area(px[:, :, c].astype(np.float64), th, tw)
                     for c in range(px.shape[2])], axis=2)
                out["th"].append(th); out["tw"].append(tw)
                out["mean_px"].append(float(rz.mean()))
                out["std_px"].append(float(rz.std()))
                out["status"].append("ok")
                if keep_pixels:
                    out["pixels"].append(
                        np.clip(np.rint(rz), 0, 255).astype(np.uint8).tobytes())
            fields = [
                pa.field("image_id", pa.string()), pa.field("ts", pa.timestamp("us")),
                pa.field("aspect_bucket", pa.int32()),
                pa.field("th", pa.int32()), pa.field("tw", pa.int32()),
                pa.field("mean_px", pa.float64()), pa.field("std_px", pa.float64()),
                pa.field("status", pa.string()),
            ]
            if keep_pixels:
                fields.append(pa.field("pixels", pa.binary()))
            sch = pa.schema(fields)
            return pa.table({f.name: pa.array(out[f.name], f.type) for f in sch},
                            schema=sch)

    return ds.map_batches(
        ResizeToBucket,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
