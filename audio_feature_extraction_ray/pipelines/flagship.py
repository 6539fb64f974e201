"""Flagship point-in-time feature pipeline (the north_star composition).

decode+featurize (fused actor pool, bytes never shipped) → per-entity window
features + sessionization (one shuffle) → as-of join of probe queries against
the feature timeline (second shuffle, same key) — the reference's
extract→evaluate→align lifecycle (SURVEY.md §3) rebuilt Ray-Data-first.

Every stage streams; nothing materializes the full dataset on the driver.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.images import synth_asof_queries, synth_images
from ..stages.asof import asof_join, asof_join_broadcast
from ..stages.features import feature_stage
from ..stages.window import window_features, window_out_schema

SESSION_GAP_US = 120 * 1_000_000  # gaps > 120 s start a new session

# window-stage parameters shared by the pipeline and its schema derivation
_WINDOW_KWARGS = dict(
    key="image_id",
    ts="ts",
    value_cols=["quality_score", "gray_mean"],
    session_gap_us=SESSION_GAP_US,
    assume_partitioned=True,
)

PROBE_SCHEMA = pa.schema(
    [
        pa.field("query_id", pa.int64()),
        pa.field("image_id", pa.string()),
        pa.field("query_ts", pa.timestamp("us")),
    ]
)


@lru_cache(maxsize=1)
def _feats_schema() -> pa.Schema:
    """Feature-table schema derived LOCALLY (one non-hot entity through the
    fused featurizer in-process, ~10 ms) instead of ``ds.schema()`` — a probe
    on the lazy pipeline costs a full partial execution (executor + actor-pool
    spin-up, measured ~1.5-2 s) before the real run starts. The schema depends
    only on the source's static column layout, never on seed or entity."""
    from ..sources.images import generate_entity_events
    from ..stages.features import DecodeFeaturize

    one = generate_entity_events(np.array([99_999], dtype=np.int64), 100_000, seed=0)
    return DecodeFeaturize()(one).drop_columns(["caption_tokens"]).schema


@lru_cache(maxsize=1)
def _windowed_schema() -> pa.Schema:
    return window_out_schema(_feats_schema(), **_WINDOW_KWARGS)


def feature_table(
    n_entities: int,
    seed: int = 42,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    skip_partitions: frozenset[int] | set[int] | None = None,
    n_partitions: int | None = None,
) -> ray.data.Dataset:
    """input table → per-image features with per-entity window columns.

    ``batch_size`` counts ENTITY ids (the fused gen→featurize stage's input
    rows), not images. ``None`` (default) keeps one fused task per source
    block (~8 entities): a row-count batch size makes Ray re-BUNDLE the
    small id blocks into bigger tasks (measured: 50 collapsed 75 blocks into
    11 tasks → an 11-way parallelism ceiling on a 32-core node).
    """
    images = synth_images(n_entities, seed=seed,
                          skip_partitions=skip_partitions, n_partitions=n_partitions)
    feats = feature_stage(images, concurrency=concurrency, batch_size=batch_size)
    # project off heavyweight derived columns before the shuffle
    feats = feats.drop_columns(["caption_tokens"])
    # the synthetic source emits each entity's whole timeline inside one
    # block, so the window stage can skip its shuffle (assume_partitioned)
    window_kwargs = _WINDOW_KWARGS
    if skip_partitions and feats.schema() is None:
        # resume pruned EVERY feature entity (the only uncommitted partitions
        # hold probe-only rows) — Ray drops empty blocks, erasing the schema
        # schema-dependent downstreams need. Return a TYPED empty feature
        # table (the locally-derived window output schema) so the PIT join
        # still emits the remaining probe rows with null feature columns;
        # ``from_arrow`` datasets keep their schema at zero rows, unlike map
        # outputs.
        return ray.data.from_arrow(_windowed_schema().empty_table())
    return window_features(feats, in_schema=_feats_schema(), **window_kwargs)


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
    if n_queries <= BROADCAST_PROBE_LIMIT:
        # schemas are derived locally: skipping the two ds.schema() probes
        # avoids two partial pipeline executions before the real run
        return asof_join_broadcast(
            queries,
            features,
            on="image_id",
            left_ts="query_ts",
            right_ts="ts",
            value_cols=value_cols,
            left_schema=PROBE_SCHEMA,
            right_schema=_windowed_schema(),
        )
    return asof_join(
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
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    feats = feature_table(n_entities, seed=seed, concurrency=concurrency, batch_size=batch_size)
    return pit_join(feats, n_entities, n_queries)
