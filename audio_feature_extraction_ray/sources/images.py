"""Deterministic synthetic image+caption event table (the BASELINE.json
``input_hint`` shape + a ``ts`` event axis).

Schema: ``(image_id: string, ts: timestamp[us], bytes: binary, w: int32,
h: int32, fmt: string, caption: string, phash: int64)``.

Generation is entity-partitioned and seed-stable: every entity's whole
timeline is produced inside one task from a ``Philox(key=[seed, entity_id])``
stream, so the table is identical regardless of block layout or cluster size —
the property that makes the correctness oracle and the two-num_cpus scaling
bench comparable. Distribution properties required by FIXTURES.md F1:

- hot keys: the first ``hot_frac`` of entities carry ``hot_mult``× the events
  (skew/salting tests; analog of the 1-teacher:N-students fan-out,
  05_dtw_alignment_experiment/dtw_alignment.py:1410-1414),
- corrupt rows: truncated bytes / unknown fmt → must surface as status!='ok',
- degenerate rows: 1x1 and tiny images (reference short-record guard,
  04_feature_extraction_experiment/feature_extractor.py:42-60),
- irregular strictly-increasing per-entity ``ts`` (drives as-of / windows /
  sessionization); base epoch fixed, never ``now()``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs
from ..functions.imagefx import phash64

BASE_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z, fixed


def _coprime_stride(n: int) -> int:
    """Smallest odd k ≥ 0.618·n with gcd(k, n) == 1 — a deterministic
    multiplicative bijection ``i ↦ (i·k) mod n`` used to scatter hot entities
    across source blocks. Depends only on n, so the generated TABLE (a set of
    per-entity timelines keyed by Philox(seed, eid)) is identical at any
    block layout or cluster size; only task↦entity assignment changes."""
    import math

    if n <= 2:
        return 1
    k = (int(0.6180339887 * n)) | 1
    while math.gcd(k, n) != 1:
        k += 2
    return k
SIZES = (8, 16, 32, 64, 128)
FMTS = codecs.FORMATS  # raw, ppm, png, jpgl

_WORDS = (
    "the quick brown fox jumps over a lazy dog while café patrons watch "
    "gradient texture pattern синий 猫 naïve coöperation test image caption"
).split()


def _entity_base_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Seeded base pattern: gradient + noise + sinusoidal texture (the image
    analog of the reference's 1 s 440 Hz sine fixture,
    04_feature_extraction_experiment/audio_feature_extraction 2/tests/test_feature_extractor.py:14-19).
    """
    yy = np.linspace(0.0, 1.0, h)[:, None]
    xx = np.linspace(0.0, 1.0, w)[None, :]
    freq = float(rng.uniform(2.0, 8.0))
    phase = float(rng.uniform(0.0, 2 * np.pi))
    base = np.empty((h, w, 3), dtype=np.float64)
    base[:, :, 0] = 128 + 80 * yy + 30 * np.sin(2 * np.pi * freq * xx + phase)
    base[:, :, 1] = 128 + 80 * xx + 30 * np.sin(2 * np.pi * freq * yy + phase)
    base[:, :, 2] = 64 + 60 * (xx + yy) + 20 * np.cos(2 * np.pi * freq * (xx - yy))
    base += rng.normal(0.0, 6.0, size=base.shape)
    return base


def _caption(rng: np.random.Generator, eid: int, ev: int) -> str:
    k = int(rng.integers(3, 9))
    words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), size=k)]
    # leading/trailing spaces + unicode on purpose: byte-exact passthrough gate
    return f"  №{eid}-{ev} " + " ".join(words) + "  "


def generate_entity_events(
    entity_ids: np.ndarray,
    n_entities: int,
    seed: int = 42,
    base_events: int = 4,
    hot_frac: float = 0.01,
    hot_mult: int = 50,
    corrupt_frac: float = 0.02,
) -> pa.Table:
    """Generate all events for the given entities — pure function, used by both
    the distributed source and the serial test oracle."""
    n_hot = max(1, int(n_entities * hot_frac)) if n_entities > 0 else 0
    cols: dict[str, list] = {k: [] for k in ("image_id", "ts", "bytes", "w", "h", "fmt", "caption", "phash")}
    for eid in np.asarray(entity_ids, dtype=np.int64):
        eid = int(eid)
        rng = np.random.Generator(np.random.Philox(key=[seed, eid]))
        is_hot = eid < n_hot
        n_ev = base_events * hot_mult if is_hot else int(base_events + rng.integers(-1, 3))
        h = int(rng.choice(SIZES))
        w = int(rng.choice(SIZES))
        if rng.random() < 0.02:  # degenerate tiny images
            h, w = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        base = _entity_base_image(rng, h, w)
        gaps_us = (1_000_000 * (1 + rng.integers(0, 900, size=n_ev))).astype(np.int64)
        ts = BASE_EPOCH_US + np.cumsum(gaps_us)
        image_id = f"img{eid:08d}"
        for ev in range(n_ev):
            px = np.clip(base + rng.normal(0.0, 4.0, size=base.shape), 0, 255).astype(np.uint8)
            fmt = FMTS[int(rng.integers(0, len(FMTS)))]
            data = codecs.encode_image(px, fmt)
            ph = phash64(px)
            r = rng.random()
            if r < corrupt_frac:
                if r < corrupt_frac / 2:
                    data = data[: max(1, len(data) // 2)]  # truncated payload
                else:
                    data, fmt = b"BOGUS" + data[:8], "bogus"  # unknown magic
            cols["image_id"].append(image_id)
            cols["ts"].append(int(ts[ev]))
            cols["bytes"].append(data)
            cols["w"].append(w)
            cols["h"].append(h)
            cols["fmt"].append(fmt)
            cols["caption"].append(_caption(rng, eid, ev))
            cols["phash"].append(ph)
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )


def synth_images(
    n_entities: int,
    seed: int = 42,
    override_num_blocks: int | None = None,
    skip_partitions: frozenset[int] | set[int] | None = None,
    n_partitions: int | None = None,
    **gen_kwargs,
) -> ray.data.Dataset:
    """Distributed deterministic source: one Dataset row per image-version event.

    ``ray.data.range(n_entities)`` fans entity ids across tasks; each task
    generates its entities' full timelines (keeps per-entity time series local
    and cumulative-ts computation trivial). At 10^12-image scale this is the
    same pattern with entity ranges read from a manifest instead of range().

    ``skip_partitions`` (with ``n_partitions``, the sink's hash-partition
    count) is resume's SOURCE-LEVEL prune: each generation task drops
    entities whose output partition is already committed BEFORE synthesizing
    any pixel bytes — the analog of pushing a partition filter into a Lance/
    Parquet read, so a resumed job pays only for unfinished partitions
    instead of recomputing everything and discovering the skip at the sink.
    The filter runs distributed inside the tasks (never a driver-side entity
    enumeration) using the sink's own stable hash.
    """
    if override_num_blocks is None:
        # enough input blocks that the fused gen->featurize actor pool can
        # actually fan out (default range() blocking gave ~3 tasks for 600
        # entities → 3-way parallelism ceiling). ~8 entities per task keeps a
        # hot entity (hot_mult× the events) a bounded fraction of one task
        # instead of a straggler; per-task overhead is amortized by the pool.
        override_num_blocks = max(8, n_entities // 8)
    ents = ray.data.range(n_entities, override_num_blocks=override_num_blocks)
    stride = _coprime_stride(n_entities)
    skips = frozenset(skip_partitions or ())
    if skips and not n_partitions:
        raise ValueError("skip_partitions requires n_partitions (the sink's count)")

    def gen(batch: dict[str, np.ndarray]) -> pa.Table:
        # scatter hot entities across blocks: range() hands each task a
        # CONTIGUOUS id span, and the hot entities (ids < n_hot) would all
        # land in task 0 — one task owning hot_mult× the work (measured 36%
        # of all images in one straggler at bench scale). The multiplicative
        # bijection reassigns ids to tasks; the generated table is identical.
        eids = (np.asarray(batch["id"], dtype=np.int64) * stride) % max(1, n_entities)
        if skips:
            from ..state.checkpoint import partition_of

            img_ids = pa.array([f"img{e:08d}" for e in eids], pa.string())
            part = partition_of(img_ids, n_partitions)
            eids = eids[~np.isin(part, list(skips))]
        return generate_entity_events(eids, n_entities, seed=seed, **gen_kwargs)

    # batch_size=None → one batch per input block: a row-count batch size
    # would re-BUNDLE the small id blocks into bigger tasks (measured: 50
    # collapsed 75 blocks into 11 tasks → 11-way parallelism ceiling)
    return ents.map_batches(gen, batch_format="numpy", batch_size=None)


def count_events(
    n_entities: int,
    seed: int = 42,
    base_events: int = 4,
    hot_frac: float = 0.01,
    hot_mult: int = 50,
) -> int:
    """Exact event count of :func:`synth_images` without generating pixels —
    replays only the generator's first RNG draw per entity (cheap)."""
    n_hot = max(1, int(n_entities * hot_frac)) if n_entities > 0 else 0
    total = 0
    for eid in range(n_entities):
        rng = np.random.Generator(np.random.Philox(key=[seed, eid]))
        if eid < n_hot:
            total += base_events * hot_mult
        else:
            total += int(base_events + rng.integers(-1, 3))
    return total


def synth_asof_queries(
    n_entities: int,
    n_queries: int,
    seed: int = 43,
    miss_frac: float = 0.05,
    horizon_us: int = 1_000 * 900 * 1_000_000,
    skip_partitions: frozenset[int] | set[int] | None = None,
    n_partitions: int | None = None,
) -> ray.data.Dataset:
    """Probe side for the point-in-time join (FIXTURES.md F2): sampled entity
    ids (plus ~miss_frac unseen ids → anti-join coverage) and query_ts spread
    across the event horizon incl. before-first-event (must yield null, not
    leak) and after-last-event."""
    # size blocks to the gen batch (default range() blocking emits ~2x-cpus
    # tiny blocks that drown the downstream PIT union-sort in per-block
    # overhead — measured 5.3 s of a 10 s flagship run at 600 entities)
    qs = ray.data.range(n_queries, override_num_blocks=max(4, n_queries // 1024))

    def gen(batch: dict[str, np.ndarray]) -> pa.Table:
        qids, eids, tss = [], [], []
        for qid in np.asarray(batch["id"], dtype=np.int64):
            rng = np.random.Generator(np.random.Philox(key=[seed, int(qid)]))
            if rng.random() < miss_frac:
                eid = n_entities + int(rng.integers(0, max(1, n_entities)))  # miss
            else:
                eid = int(rng.integers(0, max(1, n_entities)))
            t = BASE_EPOCH_US + int(rng.integers(-3600 * 1_000_000, horizon_us))
            qids.append(int(qid))
            eids.append(f"img{eid:08d}")
            tss.append(t)
        t = pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "image_id": pa.array(eids, pa.string()),
                "query_ts": pa.array(tss, pa.timestamp("us")),
            }
        )
        if skips:
            from ..state.checkpoint import partition_of

            part = partition_of(t.column("image_id"), n_partitions)
            t = t.filter(pa.array(~np.isin(part, list(skips))))
        return t

    skips = frozenset(skip_partitions or ())
    if skips and not n_partitions:
        raise ValueError("skip_partitions requires n_partitions (the sink's count)")
    return qs.map_batches(gen, batch_format="numpy", batch_size=1024)
