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

from ..sources.images import synth_asof_queries, synth_images_split
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
    s = DecodeFeaturize()(one).drop_columns(["caption_tokens"]).schema
    # strip field/schema metadata: an unhashable schema defeats Ray Data's
    # schema-dedup fast path and floods worker logs
    return pa.schema(list(zip(s.names, s.types)))


@lru_cache(maxsize=1)
def _windowed_schema() -> pa.Schema:
    return window_out_schema(_feats_schema(), **_WINDOW_KWARGS)


@lru_cache(maxsize=1)
def _hot_feats_schema() -> pa.Schema:
    """Feature schema of the halo-annotated hot branch (adds __ev/__keep/
    __sess passthrough columns), derived locally like :func:`_feats_schema`."""
    from ..sources.images import generate_entity_event_ranges
    from ..stages.features import DecodeFeaturize

    one = generate_entity_event_ranges(
        [(99_999, 0, 2)], 100_000, seed=0,
        halo_before=2, halo_after=1, annotate_session_us=SESSION_GAP_US,
    )
    s = DecodeFeaturize()(one).drop_columns(["caption_tokens"]).schema
    return pa.schema(list(zip(s.names, s.types)))


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

    Skew split (round 4): the source's hot entities (hot_mult× the events,
    up to multi-second single-entity timelines) are generated in ≈equal-cost
    event-range chunks on their own branch — otherwise ONE entity is a 2.4 s
    serial straggler under a 3.2 s ideal 32-CPU wall. The hot branch stays
    shuffle-free too: each chunk carries a 2-before/1-after event HALO plus
    the entity's true session ids (computable from the cheap gap array), so
    lag/lead/delta windows run chunk-locally and the halo rows are trimmed
    after — no per-entity regroup exchange anywhere (an earlier 64-way
    feature-row groupby variant starved the executor: two AllToAll ops cost
    more wall than the whole balanced compute).
    """

    def _featurize(ds):
        f = feature_stage(ds, concurrency=concurrency, batch_size=batch_size)
        # project off heavyweight derived columns before any exchange
        return f.drop_columns(["caption_tokens"])

    cold, hot = synth_images_split(
        n_entities, seed=seed, skip_partitions=skip_partitions,
        n_partitions=n_partitions,
        halo_before=2, halo_after=1, annotate_session_us=SESSION_GAP_US,
    )
    coldf = _featurize(cold)
    if skip_partitions and hot is None and coldf.schema() is None:
        # resume pruned EVERY feature entity (the only uncommitted partitions
        # hold probe-only rows) — Ray drops empty blocks, erasing the schema
        # schema-dependent downstreams need. Return a TYPED empty feature
        # table (the locally-derived window output schema) so the PIT join
        # still emits the remaining probe rows with null feature columns;
        # ``from_arrow`` datasets keep their schema at zero rows, unlike map
        # outputs.
        return ray.data.from_arrow(_windowed_schema().empty_table())
    # the cold branch emits each entity's whole timeline inside one block, so
    # its window stage skips the shuffle (assume_partitioned)
    cold_w = window_features(coldf, in_schema=_feats_schema(), **_WINDOW_KWARGS)
    if hot is None:
        return cold_w
    # hot chunks: halo-extended blocks are windowed locally (session disabled —
    # the chunk-local cumsum can't see prior events; __sess carries the true
    # global ids), then halo rows are trimmed and columns aligned to the cold
    # branch's schema
    hot_w_ext = window_features(
        _featurize(hot), in_schema=_hot_feats_schema(),
        **{**{k: v for k, v in _WINDOW_KWARGS.items() if k != "session_gap_us"},
           "session_gap_us": None},
    )
    out_schema = _windowed_schema()

    def trim_fix(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch.column("__keep"))
        cols = {
            name: (kept.column("__sess") if name == "session_id" else kept.column(name))
            for name in out_schema.names
        }
        return pa.table(cols, schema=out_schema)

    return cold_w.union(hot_w_ext.map_batches(trim_fix, batch_format="pyarrow",
                                              batch_size=None, zero_copy_batch=True))


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
