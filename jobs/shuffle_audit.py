#!/usr/bin/env python
"""Per-stage shuffle-byte accounting for the top-5 headline pipelines.

Multi-node evidence this 1-core sandbox CAN produce: wall-clock cannot scale
past the single-CPU floor, but the bytes each pipeline pushes through its
exchanges (Sort / Aggregate / Repartition / join shuffles) are exactly what
crosses the network on a real cluster — a cluster operator extrapolates
100 TB behavior from these tables, not from local seconds.

Method: run each pipeline at sf0.1 and at a 4x-row tiled input (weak-scaling
shape: 4x rows AND 4x keys via key-shifted copies — entity counts grow with
corpus size), capture `ds.stats()` for every executed dataset (including
intermediate materializations, hooked via Dataset.materialize), and report
every operator's total output bytes. For an exchange operator the MAP-side
suboperator's output (SortMap / AggregateMap / RepartitionSplit) is what
would cross the wire.

Usage: python jobs/shuffle_audit.py [--cpus 32] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line per (pipeline, scale) plus a markdown summary table.
Only this script owns ray.init/ray.shutdown.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import time

# the package lives at the repo root; make it importable when launched as
# `python jobs/shuffle_audit.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(sf_dir: str) -> float:
    """Scale factor from the dir name (bench.py's parser): tolerate paths
    containing 'sf' with no trailing number instead of AttributeError."""
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1

EXCHANGE_RE = re.compile(r"Sort|Repartition|Aggregate|RandomShuffle|Shuffle|Join")

_OP_RE = re.compile(r"^(?:\t)?(Operator \d+|Suboperator \d+) (\S+?):", re.M)
_BYTES_RE = re.compile(r"Output size bytes per block:.*?([\d]+) total")
_ROWS_RE = re.compile(r"Output num rows per block:.*?([\d]+) total")


def parse_stats(text: str) -> list[dict]:
    """(operator, suboperator, rows, bytes) per section of a ds.stats() dump."""
    out = []
    matches = list(_OP_RE.finditer(text))
    for i, m in enumerate(matches):
        seg = text[m.end(): matches[i + 1].start() if i + 1 < len(matches) else len(text)]
        b = _BYTES_RE.search(seg)
        r = _ROWS_RE.search(seg)
        out.append({
            "kind": m.group(1).split()[0],  # Operator | Suboperator
            "name": m.group(2),
            "rows": int(r.group(1)) if r else None,
            "bytes": int(b.group(1)) if b else None,
            "_section": hashlib.md5((m.group(0) + seg).encode()).hexdigest(),
        })
    return out


def exchange_stages(sections: list[dict]) -> list[dict]:
    """One row per exchange: the map-side suboperator (what crosses the wire),
    or the operator itself when it has no suboperators (e.g. native Join).
    When Ray prints an exchange's suboperators as ``[execution cached]``
    (it lumps same-named AllToAll stats), the wire bytes are taken from the
    immediately preceding operator's output — the exchange's input — and
    flagged ``est_from_input``."""
    rows, i = [], 0
    prev_op = None  # last Operator section with measured bytes
    while i < len(sections):
        s = sections[i]
        if s["kind"] == "Operator" and EXCHANGE_RE.search(s["name"]):
            subs = []
            j = i + 1
            while j < len(sections) and sections[j]["kind"] == "Suboperator":
                subs.append(sections[j])
                j += 1
            src = subs[0] if subs and subs[0]["bytes"] is not None else (
                s if s["bytes"] is not None else None)
            reduce_side = subs[-1] if len(subs) > 1 else None
            row = {"stage": s["name"], "est_from_input": False}
            if src is not None:
                row.update(wire_rows=src["rows"], wire_bytes=src["bytes"],
                           out_rows=(reduce_side or src)["rows"],
                           out_bytes=(reduce_side or src)["bytes"])
            elif prev_op is not None:
                row.update(wire_rows=prev_op["rows"], wire_bytes=prev_op["bytes"],
                           out_rows=None, out_bytes=None, est_from_input=True)
            else:
                row.update(wire_rows=None, wire_bytes=None,
                           out_rows=None, out_bytes=None)
            rows.append(row)
            # An exchange's OUTPUT is the next operator's input: promote it
            # so a back-to-back cached exchange estimates from THIS stage,
            # not from whatever operator preceded the pair.
            tail = (reduce_side or src) if src is not None else None
            if tail is not None and tail["bytes"] is not None:
                prev_op = tail
            i = j
        else:
            if s["kind"] == "Operator" and s["bytes"] is not None:
                prev_op = s
            i += 1
    return rows


class StatsCapture:
    """Collect ds.stats() of every materialized + finally-consumed dataset."""

    def __init__(self):
        self.texts: list[str] = []

    def __enter__(self):
        import ray.data

        self._orig = ray.data.Dataset.materialize
        cap = self

        def materialize(ds, **kw):
            out = cap._orig(ds, **kw)
            cap.texts.append(out.stats())
            return out

        ray.data.Dataset.materialize = materialize
        return self

    def __exit__(self, *exc):
        import ray.data

        ray.data.Dataset.materialize = self._orig

    def add_final(self, ds):
        self.texts.append(ds.stats())

    def sections(self) -> list[dict]:
        seen, out = set(), []
        for t in self.texts:
            for s in parse_stats(t):
                if s["_section"] in seen:  # lineage shared across captures
                    continue
                seen.add(s["_section"])
                out.append(s)
        return out


# ---------------------------------------------------------------- tiling

def _tile(ds, k: int, shift_cols: dict[str, int]):
    """k key-shifted copies (4x rows AND 4x distinct keys — the weak-scaling
    input shape; shift spacing keeps copies' key spaces disjoint)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def shifted(i):
        def fn(t: pa.Table) -> pa.Table:
            for col, span in shift_cols.items():
                idx = t.schema.get_field_index(col)
                t = t.set_column(
                    idx, col,
                    pc.add(t.column(col), pa.scalar(i * span, pa.int64())))
            return t
        return fn

    parts = [ds] + [
        ds.map_batches(shifted(i), batch_format="pyarrow", zero_copy_batch=True)
        for i in range(1, k)
    ]
    return parts[0].union(*parts[1:])


# ---------------------------------------------------------------- pipelines

def consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        n += b.num_rows
    return n


def run_flagship(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    from audio_feature_extraction_ray.pipelines.flagship import feature_table, pit_join

    sf = _sf_of(sf_dir)
    n_entities = scale * max(60, int(6000 * sf))
    # the broadcast PIT join consumes the feature side inside its own tasks
    # and assembles probe-sized output on the driver, so the returned
    # dataset's lineage stops there — audit the feature pipeline's stats by
    # consuming it explicitly (expected: ZERO exchange operators end-to-end;
    # windows ride the entity partitioning, the PIT probe set is broadcast)
    feats = feature_table(n_entities=n_entities, concurrency=None)
    consume(feats)
    cap.add_final(feats)
    feats = feature_table(n_entities=n_entities, concurrency=None)
    joined = pit_join(feats, n_entities, n_queries=4 * n_entities)
    n = consume(joined)
    cap.add_final(joined)
    return n


def run_rolling_bucketed(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.window import window_features_bucketed

    HOUR_US = 3600 * 1_000_000
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    if scale > 1:
        ev = _tile(ev, scale, {"user_id": 10_000_000, "event_id": 1 << 40})
    out = window_features_bucketed(
        ev, key="user_id", ts="ts", value_cols=[], bucket_us=2 * HOUR_US,
        lags=(), leads=(), deltas=False, rolling_time_us={"value": HOUR_US},
    )
    n = consume(out)
    cap.add_final(out)
    return n


def run_interval_join(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    import pyarrow as pa
    import pyarrow.compute as pc

    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.interval import interval_join

    W = 7 * 24 * 3600 * 1_000_000
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type", "value"])
    if scale > 1:
        ev = _tile(ev, scale, {"user_id": 10_000_000, "event_id": 1 << 40})
    clicks = (
        ev.filter(expr="event_type == 'click'")
        .map_batches(
            lambda t: t.append_column(
                "end_ts", pc.add(t.column("ts"), pa.scalar(W, pa.duration("us")))),
            batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["event_id", "user_id", "ts", "end_ts"]))
    purchases = (
        ev.filter(expr="event_type == 'purchase'")
        .map_batches(lambda t: t.filter(pc.is_valid(t.column("value"))),
                     batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["event_id", "user_id", "ts", "value"]))
    out = interval_join(
        clicks, purchases, on="user_id", start_col="ts", end_col="end_ts",
        ts_col="ts", value_cols=["event_id", "value"], bucket_us=W)
    n = consume(out)
    cap.add_final(out)
    return n


def run_native_join(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast
    from audio_feature_extraction_ray.stages.joins import hash_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    if scale > 1:
        li = _tile(li, scale, {"l_orderkey": 1 << 40})
        orders = _tile(orders, scale, {"o_orderkey": 1 << 40})
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       join_type="inner", num_partitions=8 * scale)
    agg = grouped_agg_fast(
        joined, keys=["o_orderpriority"],
        specs=[("sum_qty", "l_quantity", "sum")], count_alias="n_items",
        num_final_partitions=1)
    n = consume(agg)
    cap.add_final(agg)
    return n


def run_minhash(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.dedup import minhash_dedup_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    if scale > 1:
        # key-shifted copies: texts repeat, so cross-copy EXACT dups add
        # candidate pairs superlinearly — band-shuffle bytes (the claim
        # under audit) still scale linearly with rows
        ds = _tile(ds, scale, {"doc_id": 1 << 40})
    pairs = minhash_dedup_pairs(ds, id_col="doc_id", threshold=0.7)
    n = consume(pairs)
    cap.add_final(pairs)
    return n


def run_asof_plain(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """The shuffle-based as-of join — the flagship PIT's fallback path when
    the probe set exceeds the broadcast limit."""
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.asof import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"])
    if scale > 1:
        ev = _tile(ev, scale, {"user_id": 10_000_000, "event_id": 1 << 40})
    clicks = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "value"]) \
        .map_batches(lambda t: t.rename_columns(["user_id", "r_ts", "value"]),
                     batch_format="pyarrow")
    out = asof_join(clicks, purchases, on="user_id", left_ts="ts",
                    right_ts="r_ts", value_cols=["value"], suffix="_purchase")
    n = consume(out)
    cap.add_final(out)
    return n


def run_asof_bucketed(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    import pyarrow as pa

    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.asof import asof_join_bucketed

    HOUR_US = 3600 * 1_000_000
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"])
    if scale > 1:
        ev = _tile(ev, scale, {"user_id": 10_000_000, "event_id": 1 << 40})
    clicks = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "value"]) \
        .map_batches(lambda t: t.rename_columns(["user_id", "r_ts", "value"]),
                     batch_format="pyarrow")
    out = asof_join_bucketed(clicks, purchases, on="user_id", left_ts="ts",
                             right_ts="r_ts", value_cols=["value"],
                             bucket_us=6 * HOUR_US, suffix="_purchase")
    n = consume(out)
    cap.add_final(out)
    return n


def run_top10(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    import pyarrow as pa
    import pyarrow.compute as pc

    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.aggregates import grouped_agg_fast
    from audio_feature_extraction_ray.stages.util import topk

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])
    if scale > 1:
        li = _tile(li, scale, {"l_orderkey": 1 << 40})

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "revenue": r})

    per_order = grouped_agg_fast(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"], specs=[("revenue", "revenue", "sum")])
    top = topk(per_order, ["revenue", "l_orderkey"], k=10,
               descending=[True, False])
    n = consume(top)
    cap.add_final(top)
    return n


def run_dedup_keep(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    from audio_feature_extraction_ray.pipelines.queries import QUERIES
    from audio_feature_extraction_ray.sources.tables import read_table

    res = QUERIES["dedup_keep_documents"][0](sf_dir)
    n = consume(res)
    cap.add_final(res)
    return n


# cross-copy prefix groups would merge tiled copies into one cluster and
# change dedup semantics; audit the dedup-keep exchange at 1x only
run_dedup_keep.scales = (1,)


def run_training_batches(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """Packed-training-batch pipeline: the audit claim is that the ONE data
    exchange moves ENCODED image bytes (not decoded canonical pixels, ~10x
    larger) plus a scalar id exchange from the metadata pass."""
    from audio_feature_extraction_ray.sources.images import (
        synth_images_balanced, synth_images_meta)
    from audio_feature_extraction_ray.stages.batching import training_batches_ds

    sf = _sf_of(sf_dir)
    n_entities = scale * max(12, int(600 * sf))
    packed = training_batches_ds(
        synth_images_balanced(n_entities), batch_size=8,
        meta_ds=synth_images_meta(n_entities))
    n = consume(packed)
    cap.add_final(packed)
    return n




def run_bpe_train(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """Tokenizer training: the audit claim is that raw tokens never shuffle —
    the exchanges are (a) the word-frequency combiner's partials
    (vocabulary-scale) and (b) per-merge (pair, count) partials + a 1-row
    top-k, all orders of magnitude below corpus bytes."""
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.text import bpe_train

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    if scale > 1:
        ds = _tile(ds, scale, {"doc_id": 1 << 40})
    merges = bpe_train(ds.select_columns(["text"]), "text", n_merges=4)
    n = consume(merges)
    cap.add_final(merges)
    return n


def run_pack_sequences(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """Sequence packing: the ONLY exchange is (id, n_tokens) scalar rows —
    text never ships."""
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.text import pack_sequences, token_count_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    if scale > 1:
        ds = _tile(ds, scale, {"doc_id": 1 << 40})
    toks = token_count_table(ds, "doc_id")
    packed = pack_sequences(toks, "doc_id", "token_count", budget=256)
    n = consume(packed)
    cap.add_final(packed)
    return n


def run_mix_domains(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """Mixture rebalancing: zero corpus shuffle — the only exchange is the
    #domains-row (domain, total) partial stream."""
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.sampling import mix_domains
    from audio_feature_extraction_ray.stages.text import token_count_table

    import pyarrow as pa

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
    if scale > 1:
        ds = _tile(ds, scale, {"doc_id": 1 << 40})

    def with_counts(t):
        from audio_feature_extraction_ray.functions.textfx import _flat_tokens

        _, _, n_tok = _flat_tokens(t.column("text"))
        return pa.table({"doc_id": t.column("doc_id"),
                         "source": t.column("source"),
                         "token_count": pa.array(n_tok, pa.int64())})

    toks = ds.map_batches(with_counts, batch_format="pyarrow", zero_copy_batch=True)
    mixed = mix_domains(toks, "source", "token_count", key_cols=["doc_id"])
    n = consume(mixed)
    cap.add_final(mixed)
    return n


def run_semdedup(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """SemDeDup: per-iteration k-means exchanges are k-row packed partials;
    the vectors cross the wire exactly once, in the cluster groupby."""
    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.dedup import semantic_dedup

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if scale > 1:
        ds = _tile(ds, scale, {"vec_id": 1 << 40})
    out = semantic_dedup(ds, "vec_id", "embedding", k=8, iters=3, threshold=0.6)
    n = consume(out)
    cap.add_final(out)
    return n



def run_pagerank(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """PageRank: the exchanges are the edge-build join + distinct; the
    power iterations themselves move only node-scale bincount partials."""
    from audio_feature_extraction_ray.pipelines.queries import QUERIES

    res = QUERIES["pagerank_orders"][0](sf_dir)
    n = consume(res)
    cap.add_final(res)
    return n


# tiling customers/suppliers would change the graph's degree structure and
# triangle density nonlinearly; audit the graph operators' exchange shape
# at 1x only (their per-iteration exchanges are node-scale by construction)
run_pagerank.scales = (1,)


def run_triangles(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    from audio_feature_extraction_ray.pipelines.queries import QUERIES

    res = QUERIES["triangles_suppliers"][0](sf_dir)
    n = consume(res)
    cap.add_final(res)
    return n


run_triangles.scales = (1,)



def run_psi(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """PSI: the claim is zero corpus shuffle — two combiner scans whose
    partials are #groups- and #groups×bins-scale."""
    from audio_feature_extraction_ray.pipelines.queries import QUERIES

    res = QUERIES["psi_event_types"][0](sf_dir)
    n = consume(res)
    cap.add_final(res)
    return n


run_psi.scales = (1,)


def run_ks(cap: StatsCapture, sf_dir: str, scale: int) -> int:
    """KS: one group-hash exchange of (group, value, flag) scalar rows."""
    from audio_feature_extraction_ray.pipelines.queries import QUERIES

    res = QUERIES["ks_event_types"][0](sf_dir)
    n = consume(res)
    cap.add_final(res)
    return n


run_ks.scales = (1,)


PIPELINES = {
    "flagship_images_pit": run_flagship,
    "rolling_time_mean_bucketed": run_rolling_bucketed,
    "interval_join_events": run_interval_join,
    "native_hash_join": run_native_join,
    "minhash_pairs_documents": run_minhash,
    "asof_events": run_asof_plain,
    "asof_events_bucketed": run_asof_bucketed,
    "top10_order_revenue": run_top10,
    "dedup_keep_documents": run_dedup_keep,
    "training_batches_images": run_training_batches,
    "bpe_train_documents": run_bpe_train,
    "pack_sequences_documents": run_pack_sequences,
    "mix_domains_documents": run_mix_domains,
    "semdedup_embeddings": run_semdedup,
    "pagerank_orders": run_pagerank,
    "triangles_suppliers": run_triangles,
    "psi_event_types": run_psi,
    "ks_event_types": run_ks,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level=logging.ERROR)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    results = []
    for name, fn in PIPELINES.items():
        if args.only and name != args.only:
            continue
        for scale in getattr(fn, "scales", (1, 4)):
            cap = StatsCapture()
            t0 = time.time()
            with cap:
                rows_out = fn(cap, args.sf_dir, scale)
            dt = time.time() - t0
            secs = cap.sections()
            # a section with no byte line is a cached/re-listed summary of a
            # stage whose bytes were already counted in an earlier capture
            ex = [e for e in exchange_stages(secs) if e["wire_bytes"] is not None]
            total_wire = sum(e["wire_bytes"] or 0 for e in ex)
            measured = [s for s in secs if s["bytes"] is not None]
            rec = {
                "pipeline": name, "scale": scale, "seconds": round(dt, 2),
                "rows_out": rows_out,
                "n_operators_measured": len(measured),
                "total_operator_output_bytes": sum(s["bytes"] for s in measured),
                "exchange_stages": [
                    {k: v for k, v in e.items()} for e in ex],
                "total_exchange_bytes": total_wire,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # markdown summary: per pipeline, exchange bytes at 1x and 4x + ratio
    by = {}
    for r in results:
        by.setdefault(r["pipeline"], {})[r["scale"]] = r
    print("\n| Pipeline | Exchanges | wire bytes @1x | wire bytes @4x | ratio | note |")
    print("|---|---|---|---|---|---|")
    for name, d in by.items():
        if 1 not in d or 4 not in d:
            continue
        b1, b4 = d[1]["total_exchange_bytes"], d[4]["total_exchange_bytes"]
        n_ex = len(d[1]["exchange_stages"])
        ratio = (b4 / b1) if b1 else float("nan")
        stages = "; ".join(
            f"{e['stage']}:{(e['wire_bytes'] or 0)/1e6:.1f}MB"
            for e in d[1]["exchange_stages"])
        print(f"| {name} | {n_ex} | {b1/1e6:.1f} MB | {b4/1e6:.1f} MB "
              f"| {ratio:.2f}x | {stages} |")

    ray.shutdown()


if __name__ == "__main__":
    main()
