"""Training-loop handoff: deterministic packed batches + byte-identical
resume (reference lifecycle analog: the per-batch student-feature loop at
04_feature_extraction_experiment/feature_extraction_for_student.py:152-197)."""
import numpy as np
import ray

from audio_feature_extraction_ray.sources.images import synth_images
from audio_feature_extraction_ray.stages.batching import iter_training_batches


def _collect(ds, **kw):
    return list(iter_training_batches(ds, batch_size=4, concurrency=(1, 2), **kw))


def test_training_batches_shapes_order_and_failures():
    full = _collect(synth_images(24, seed=42))
    assert len(full) > 3
    ids = [b["batch_id"] for b in full]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    n_failed = 0
    for b in full:
        n = b["pixels"].shape[0]
        assert n == b["n_ok"] if "n_ok" in b else True
        assert b["pixels"].dtype == np.float32
        assert b["pixels"].shape == (n, b["pixels"].shape[1], b["pixels"].shape[2], 3)
        assert 0.0 <= float(b["pixels"].min()) and float(b["pixels"].max()) <= 1.0
        assert len(b["token_ids"]) == n == len(b["image_ids"]) == len(b["ts_us"])
        assert n + len(b["failed_ids"]) <= 4  # metadata-assigned slots
        assert all(t.dtype == np.int32 and len(t) > 0 for t in b["token_ids"])
        n_failed += len(b["failed_ids"])
        # batch id encodes its aspect bucket
        assert b["batch_id"] >> 32 == b["aspect_bucket"]
    assert n_failed > 0  # synth corpus contains corrupt rows; they are data
    # per-bucket canonical shape: all batches of one bucket stack identically
    by_bucket = {}
    for b in full:
        if b["pixels"].shape[0]:
            by_bucket.setdefault(b["aspect_bucket"], set()).add(b["pixels"].shape[1:3])
    assert all(len(s) == 1 for s in by_bucket.values())


def test_training_batches_killed_iteration_resumes_byte_identical():
    full = _collect(synth_images(24, seed=42))
    consumed = 3  # "crash" after three fully consumed batches
    cursor = full[consumed - 1]["batch_id"]
    resumed = _collect(synth_images(24, seed=42), start_after=cursor)
    assert [b["batch_id"] for b in resumed] == [b["batch_id"] for b in full[consumed:]]
    for a, b in zip(full[consumed:], resumed):
        assert a["image_ids"] == b["image_ids"]
        assert a["ts_us"] == b["ts_us"]
        assert a["failed_ids"] == b["failed_ids"]
        assert a["pixels"].tobytes() == b["pixels"].tobytes()  # byte identity
        assert len(a["token_ids"]) == len(b["token_ids"])
        assert all(np.array_equal(x, y)
                   for x, y in zip(a["token_ids"], b["token_ids"]))

    # cursor at the very last batch -> nothing left, not an error
    tail = _collect(synth_images(24, seed=42), start_after=full[-1]["batch_id"])
    assert tail == []


def test_cursor_file_resumes_automatically(tmp_path):
    from audio_feature_extraction_ray.stages.batching import _read_cursor

    cur = str(tmp_path / "cursor.json")
    full = _collect(synth_images(16, seed=5))
    assert len(full) > 4

    got = []
    for i, b in enumerate(iter_training_batches(
            synth_images(16, seed=5), batch_size=4, concurrency=(1, 2),
            cursor_path=cur)):
        got.append(b)
        if i == 2:
            break  # "crash" after receiving batch 3, before requesting 4
    # at-least-once: the interrupted batch is NOT yet marked consumed
    assert _read_cursor(cur) == got[-2]["batch_id"]

    resumed = list(iter_training_batches(
        synth_images(16, seed=5), batch_size=4, concurrency=(1, 2),
        cursor_path=cur))
    # the in-flight batch replays byte-identically, then the rest follow
    assert resumed[0]["batch_id"] == got[-1]["batch_id"]
    assert resumed[0]["pixels"].tobytes() == got[-1]["pixels"].tobytes()
    seq = got[:-1] + resumed
    assert [b["batch_id"] for b in seq] == [b["batch_id"] for b in full]
    assert all(a["pixels"].tobytes() == b["pixels"].tobytes()
               for a, b in zip(seq, full))
    # a clean full drain leaves the cursor at the last batch
    assert _read_cursor(cur) == full[-1]["batch_id"]


def test_training_shards_roundtrip_and_skip_on_rerun(tmp_path):
    from audio_feature_extraction_ray.stages.batching import (
        iter_shard_batches, write_training_shards)

    out = str(tmp_path / "shards")
    man1 = write_training_shards(synth_images(16, seed=5), out,
                                 batch_size=4, n_shards=4, concurrency=(1, 2))
    assert man1.num_rows == 4

    live = _collect(synth_images(16, seed=5))
    replay = list(iter_shard_batches(out))
    assert [b["batch_id"] for b in replay] == [b["batch_id"] for b in live]
    for a, b in zip(replay, live):
        assert a["pixels"].tobytes() == b["pixels"].tobytes()
        assert a["image_ids"] == b["image_ids"]
        assert all(np.array_equal(x, y)
                   for x, y in zip(a["token_ids"], b["token_ids"]))

    # second write run: all shards committed -> skipped, read-back unchanged
    write_training_shards(synth_images(16, seed=5), out,
                          batch_size=4, n_shards=4, concurrency=(1, 2))
    replay2 = list(iter_shard_batches(out))
    assert all(a["pixels"].tobytes() == b["pixels"].tobytes()
               for a, b in zip(replay2, replay))

    # shard-level resume cursor
    tail = list(iter_shard_batches(out, start_after=replay[1]["batch_id"]))
    assert [b["batch_id"] for b in tail] == [b["batch_id"] for b in replay[2:]]


def test_shard_resume_is_source_pruned_and_exact(tmp_path):
    """Partial resume ships and decodes ONLY uncommitted shards' rows
    (pruned before decode) and reproduces the clean run byte-identically."""
    import os

    from audio_feature_extraction_ray.stages.batching import (
        _attach_ids, assign_aspect_buckets, iter_shard_batches,
        with_batch_ids, write_training_shards)
    from audio_feature_extraction_ray.state.checkpoint import partition_of
    import pyarrow as pa

    out = str(tmp_path / "shards")
    write_training_shards(synth_images(16, seed=5), out, batch_size=4,
                          n_shards=4, concurrency=(1, 2))
    clean = list(iter_shard_batches(out))

    # the pruned tagged stream (what resume ships to the writer) carries
    # exactly the uncommitted shards' rows — no committed bytes move
    done = {0, 2}
    src = synth_images(16, seed=5)
    ids = with_batch_ids(
        assign_aspect_buckets(src.select_columns(["image_id", "ts", "w", "h"])), 4)

    def drop_done(t):
        import numpy as _np
        sh = partition_of(t.column("batch_id"), 4)
        return t.filter(pa.array(~_np.isin(sh, sorted(done))))

    surv = ids.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)
    tagged = _attach_ids(synth_images(16, seed=5), surv, 2_000_000).take_all()
    got_shards = {int(partition_of(pa.chunked_array(
        [pa.array([r["batch_id"]], pa.int64())]), 4)[0]) for r in tagged}
    assert got_shards and got_shards.isdisjoint(done)
    want_ids = {b["batch_id"] for b in clean
                if partition_of(pa.chunked_array(
                    [pa.array([b["batch_id"]], pa.int64())]), 4)[0] not in done}
    assert {r["batch_id"] for r in tagged} == want_ids

    # end-to-end: delete two commit markers, re-run, read back identical
    for p in done:
        os.remove(os.path.join(out, "_manifest", f"{p:05d}.json"))
    write_training_shards(synth_images(16, seed=5), out, batch_size=4,
                          n_shards=4, concurrency=(1, 2))
    again = list(iter_shard_batches(out))
    assert [b["batch_id"] for b in again] == [b["batch_id"] for b in clean]
    assert all(a["pixels"].tobytes() == b["pixels"].tobytes()
               for a, b in zip(again, clean))

    # fully-committed fast path returns the manifest without recompute
    man = write_training_shards(synth_images(16, seed=5), out, batch_size=4,
                                n_shards=4, concurrency=(1, 2))
    assert man.num_rows == 4


def test_attach_ids_join_route_matches_broadcast():
    """The >threshold bucket-join id-attach route must produce batches
    identical to the default broadcast-lookup route (same pin style as
    minhash verify's two text-fetch routes)."""
    from audio_feature_extraction_ray.stages.batching import training_batches_ds

    def packed(threshold):
        ds = training_batches_ds(synth_images(16, seed=5), batch_size=4,
                                 broadcast_ids_threshold=threshold)
        return sorted(ds.take_all(), key=lambda r: r["batch_id"])

    via_broadcast = packed(2_000_000)
    via_join = packed(0)  # force the bucket_hash_join route
    assert [r["batch_id"] for r in via_join] == [r["batch_id"] for r in via_broadcast]
    for a, b in zip(via_join, via_broadcast):
        assert a["pixels"] == b["pixels"]
        assert a["token_ids"] == b["token_ids"]
        assert a["image_ids"] == b["image_ids"]


def test_packed_batches_invariant_to_input_block_layout():
    """Batch ids and packed bytes must not depend on how the input rows are
    split into blocks (a resumed/repartitioned read sees different layouts)."""
    from audio_feature_extraction_ray.stages.batching import training_batches_ds

    base = synth_images(16, seed=5)
    a = sorted(training_batches_ds(base, batch_size=4).take_all(),
               key=lambda r: r["batch_id"])
    relaid = synth_images(16, seed=5).repartition(7)
    b = sorted(training_batches_ds(relaid, batch_size=4).take_all(),
               key=lambda r: r["batch_id"])
    assert [r["batch_id"] for r in a] == [r["batch_id"] for r in b]
    for x, y in zip(a, b):
        assert x["pixels"] == y["pixels"]
        assert x["token_ids"] == y["token_ids"]


def test_custom_buckets_consistent_end_to_end(tmp_path):
    """A custom ``buckets`` tuple must flow to BOTH the metadata bucket
    assignment and the decode-side re-assignment (regression: the decode
    side once used DEFAULT_BUCKETS, indexing a 2-element targets list with
    bucket ids up to 6)."""
    from audio_feature_extraction_ray.stages.batching import (
        iter_shard_batches, training_batches_ds, write_training_shards)

    custom = (1.0, 2.0)
    rows = sorted(
        training_batches_ds(synth_images(12, seed=7), batch_size=4,
                            buckets=custom).take_all(),
        key=lambda r: r["batch_id"])
    assert rows
    for r in rows:
        assert 0 <= r["aspect_bucket"] < len(custom)
        assert len(r["pixels"]) == r["n_ok"] * r["th"] * r["tw"] * 3

    out = str(tmp_path / "shards")
    write_training_shards(synth_images(12, seed=7), out, batch_size=4,
                          n_shards=2, buckets=custom)
    replay = list(iter_shard_batches(out))
    assert [b["batch_id"] for b in replay] == [r["batch_id"] for r in rows]
    by_id = {r["batch_id"]: r for r in rows}
    for b in replay:
        exp = (np.frombuffer(by_id[b["batch_id"]]["pixels"], dtype=np.uint8)
               .astype(np.float32) / np.float32(255.0))
        assert b["pixels"].ravel().tobytes() == exp.tobytes()
        assert list(b["image_ids"]) == list(by_id[b["batch_id"]]["image_ids"])
