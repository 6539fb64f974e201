"""Flagship point-in-time feature pipeline (the north_star composition).

decode+featurize (fused actor pool, bytes never shipped) → per-entity window
features + sessionization (one shuffle) → as-of join of probe queries against
the feature timeline (second shuffle, same key) — the reference's
extract→evaluate→align lifecycle (SURVEY.md §3) rebuilt Ray-Data-first.

Every stage streams; nothing materializes the full dataset on the driver.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ..sources.images import synth_asof_queries, synth_images
from ..stages.asof import asof_join, asof_join_broadcast
from ..stages.features import feature_stage
from ..stages.window import window_features

SESSION_GAP_US = 120 * 1_000_000  # gaps > 120 s start a new session


def feature_table(
    n_entities: int,
    seed: int = 42,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 50,
    skip_partitions: frozenset[int] | set[int] | None = None,
    n_partitions: int | None = None,
) -> ray.data.Dataset:
    """input table → per-image features with per-entity window columns.

    ``batch_size`` counts ENTITY ids (the fused gen→featurize stage's input
    rows), not images: ~50 entities ≈ 300 images per task keeps the actor
    pool fanned out (256 collapsed the whole run to 3 tasks) without flooding
    the downstream window sort with tiny blocks.
    """
    images = synth_images(n_entities, seed=seed,
                          skip_partitions=skip_partitions, n_partitions=n_partitions)
    feats = feature_stage(images, concurrency=concurrency, batch_size=batch_size)
    # project off heavyweight derived columns before the shuffle
    feats = feats.drop_columns(["caption_tokens"])
    # the synthetic source emits each entity's whole timeline inside one
    # block, so the window stage can skip its shuffle (assume_partitioned)
    window_kwargs = dict(
        key="image_id",
        ts="ts",
        value_cols=["quality_score", "gray_mean"],
        session_gap_us=SESSION_GAP_US,
        assume_partitioned=True,
    )
    if skip_partitions and feats.schema() is None:
        # resume pruned EVERY feature entity (the only uncommitted partitions
        # hold probe-only rows) — Ray drops empty blocks, erasing the schema
        # schema-dependent downstreams need. Rebuild a TYPED empty feature
        # table (schema probed by running one locally-generated entity
        # through the identical window pipeline) so the PIT join still emits
        # the remaining probe rows with null feature columns; ``from_arrow``
        # datasets keep their schema at zero rows, unlike map outputs.
        import pyarrow as pa

        from ..sources.images import generate_entity_events
        from ..stages.features import DecodeFeaturize

        one = generate_entity_events(np.array([0], dtype=np.int64), n_entities, seed=seed)
        one_feats = DecodeFeaturize()(one).drop_columns(["caption_tokens"])
        s = window_features(ray.data.from_arrow(one_feats), **window_kwargs).schema()
        out_schema = pa.schema(list(zip(s.names, s.types)))
        return ray.data.from_arrow(out_schema.empty_table())
    return window_features(feats, **window_kwargs)


BROADCAST_PROBE_LIMIT = 200_000  # above this, probes shuffle like any fact side


def pit_join(
    features: ray.data.Dataset,
    n_entities: int,
    n_queries: int,
    seed: int = 43,
    skip_partitions: frozenset[int] | set[int] | None = None,
    n_partitions: int | None = None,
) -> ray.data.Dataset:
    """Point-in-time join of probe queries against the feature timeline.

    Small probe batches take the ZERO-SHUFFLE broadcast as-of (the feature
    table is entity-partitioned by construction, so each probe entity is
    owned by exactly one block); large probe sets fall back to the
    shuffle-based as-of. Both paths are pinned to the same serial PIT
    oracle in tests.
    """
    queries = synth_asof_queries(n_entities, n_queries, seed=seed,
                                 skip_partitions=skip_partitions,
                                 n_partitions=n_partitions)
    value_cols = ["quality_score", "gray_mean", "phash_calc", "session_id"]
    join = asof_join_broadcast if n_queries <= BROADCAST_PROBE_LIMIT else asof_join
    return join(
        queries,
        features,
        on="image_id",
        left_ts="query_ts",
        right_ts="ts",
        value_cols=value_cols,
    )


def flagship(
    n_entities: int = 50,
    n_queries: int = 200,
    seed: int = 42,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 256,
) -> ray.data.Dataset:
    feats = feature_table(n_entities, seed=seed, concurrency=concurrency, batch_size=batch_size)
    return pit_join(feats, n_entities, n_queries)
