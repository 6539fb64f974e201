#!/usr/bin/env python
"""Cluster job entry point for the flagship PIT feature pipeline.

Submit to a Ray cluster (the north_rule launch path):

    ray job submit --working-dir . -- \
        python jobs/flagship_job.py --entities 100000 --out /data/features_out

or run locally:  python jobs/flagship_job.py --entities 600 --out /tmp/flag_out

The job is exactly resumable: output is hash-partitioned parquet with a
per-partition lineage manifest (state/checkpoint.py); resubmitting after a
failure skips committed partitions and reproduces byte-identical content.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

# the package lives at the repo root (the job's working dir under
# `ray job submit --working-dir .`); make it importable when launched
# from elsewhere too
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=600)
    ap.add_argument("--queries", type=int, default=None, help="PIT probe count (default 4x entities)")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for local runs; on a cluster leave unset")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        else:
            ray.init()  # cluster address from environment under `ray job submit`
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from audio_feature_extraction_ray.pipelines.flagship import feature_table, pit_join
    from audio_feature_extraction_ray.state.checkpoint import (
        completed_partitions, write_partitioned_resumable)

    t0 = time.time()
    # resume's source-level prune: committed partitions never regenerate,
    # decode, window, or join — the filter runs inside the source tasks via
    # the sink's own stable hash (see synth_images docstring)
    done = completed_partitions(args.out, args.partitions)
    if len(done) >= args.partitions:
        manifest = None  # every partition committed: nothing to compute at all
    else:
        feats = feature_table(n_entities=args.entities,
                              skip_partitions=done, n_partitions=args.partitions)
        joined = pit_join(feats, args.entities, args.queries or 4 * args.entities,
                          skip_partitions=done, n_partitions=args.partitions)
        manifest = write_partitioned_resumable(
            joined, args.out, key="image_id", n_partitions=args.partitions,
            sort_keys=["image_id", "query_ts"],
        )
    fresh = manifest.to_pylist() if manifest is not None else []
    # source-pruned partitions never reach the writer — fold their committed
    # marker rows back into the job summary
    committed = []
    for pid in sorted(done):
        with open(os.path.join(args.out, "_manifest", f"{pid:05d}.json")) as f:
            committed.append(json.load(f))
    rows = sum(r["rows"] for r in fresh) + sum(r["rows"] for r in committed)
    skipped = sum(1 for r in fresh if r["skipped"]) + len(committed)
    print(json.dumps({
        "out": args.out,
        "rows": rows,
        "partitions": len(fresh) + len(committed),
        "partitions_source_pruned": len(done),
        "partitions_skipped_on_resume": skipped,
        "seconds": round(time.time() - t0, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
