#!/usr/bin/env python
"""End-to-end tokenizer-training + corpus-packing job — the text-side analog
of ``jobs/flagship_job.py``: curate → fit tokenizer artifacts → encode →
pack → resumable partitioned write.

Stages (every artifact lands under --out):
  1. curate: quality filter → exact dedup → domain-mixture equalization
  2. fit:    BPE merge table (``bpe_train``) + dense-id vocabulary
             (``build_vocab``) → merges.parquet / vocab.parquet
  3. encode: ``bpe_encode`` over the curated corpus (merge table broadcast)
  4. pack:   greedy sequence packing → hash-partitioned resumable parquet
             (re-run skips committed partitions; lineage manifest)

Usage: python jobs/tokenizer_job.py [--sf-dir /root/testdata/sf0.1]
         [--out /tmp/tokenizer_job] [--merges 16] [--tile 1] [--cpus 32]
Prints one JSON line with per-stage seconds + row counts.
Only this script owns ray.init/ray.shutdown.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/tokenizer_job")
    ap.add_argument("--merges", type=int, default=16)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--tile", type=int, default=1,
                    help="key-shifted corpus copies (scale rehearsal)")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import logging

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level=logging.ERROR)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from audio_feature_extraction_ray.sources.tables import read_table
    from audio_feature_extraction_ray.stages.dedup import dedup_exact
    from audio_feature_extraction_ray.stages.sampling import mix_domains
    from audio_feature_extraction_ray.stages.text import (
        bpe_encode, bpe_train, build_vocab, pack_sequences, text_features)
    from audio_feature_extraction_ray.state.checkpoint import write_partitioned_resumable

    rec: dict = {"sf_dir": args.sf_dir, "tile": args.tile, "merges": args.merges}
    t_all = time.time()

    docs = read_table(args.sf_dir, "documents", columns=["doc_id", "source", "text"])
    if args.tile > 1:
        # Shift keys AND perturb text: identical tiled text would share one
        # fingerprint_md5 and exact dedup would collapse the rehearsal back
        # to the 1x corpus before fit/encode/pack — the tile suffix keeps
        # every copy a distinct document while preserving token statistics.
        def shifted(i):
            def fn(t: pa.Table) -> pa.Table:
                t = t.set_column(
                    t.schema.get_field_index("doc_id"), "doc_id",
                    pc.add(t.column("doc_id"), pa.scalar(i << 40, pa.int64())))
                return t.set_column(
                    t.schema.get_field_index("text"), "text",
                    pc.binary_join_element_wise(
                        t.column("text").cast(pa.string()),
                        pa.scalar(f"tile{i}"), " "))
            return fn
        docs = docs.union(*[docs.map_batches(shifted(i), batch_format="pyarrow")
                            for i in range(1, args.tile)])

    # ---- 1. curate (same chain as corpus_train_prep_documents)
    t0 = time.time()
    feats = text_features(docs, quality=True, lang=False, fingerprints=True)
    kept = feats.filter(expr="n_tokens >= 10 and punct_ratio <= 0.2")
    deduped = dedup_exact(kept, ["fingerprint_md5"], order_col="doc_id", keep="min")
    curated = mix_domains(
        deduped.select_columns(["doc_id", "source", "text", "n_tokens"]),
        "source", "n_tokens", key_cols=["doc_id"],
    ).materialize()
    rec["curate_s"] = round(time.time() - t0, 2)
    rec["curated_docs"] = curated.count()

    # ---- 2. fit tokenizer artifacts
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    # Clear prior artifact dirs: write_parquet APPENDS uniquely-named files,
    # so a re-run after a stage-3/4 failure would leave every merge rule and
    # vocab row duplicated for any consumer reading the directory.
    import shutil
    for d in ("merges.parquet", "vocab.parquet"):
        shutil.rmtree(os.path.join(args.out, d), ignore_errors=True)
    merges = bpe_train(curated.select_columns(["text"]), "text",
                       n_merges=args.merges).materialize()
    merges.write_parquet(os.path.join(args.out, "merges.parquet"))
    vocab = build_vocab(curated.select_columns(["text"]), "text", min_count=2)
    vocab.write_parquet(os.path.join(args.out, "vocab.parquet"))
    rec["fit_s"] = round(time.time() - t0, 2)
    rec["n_merges"] = merges.count()
    rec["vocab_size"] = vocab.count()

    # ---- 3 + 4. encode, pack, resumable write (packed corpus partitioned by
    # pack partition so a re-run skips committed partitions)
    t0 = time.time()
    enc = bpe_encode(curated.select_columns(["doc_id", "text"]), merges, "text",
                     concurrency=(1, max(2, args.cpus // 2)))
    packed = pack_sequences(enc, "doc_id", "n_bpe_tokens", budget=args.budget)
    manifest = write_partitioned_resumable(
        packed, os.path.join(args.out, "packed"), key="pack_id",
        n_partitions=32, sort_keys=["pack_id", "pack_pos"])
    rec["encode_pack_write_s"] = round(time.time() - t0, 2)
    rec["packed_rows"] = int(pc.sum(manifest.column("rows")).as_py() or 0)
    rec["n_packs"] = ray.data.read_parquet(
        os.path.join(args.out, "packed")).select_columns(["pack_id"]).unique("pack_id").__len__()

    rec["total_s"] = round(time.time() - t_all, 2)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
