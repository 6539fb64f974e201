"""Flagship PIT pipeline vs serial oracle: the north_rule's core claim —
feature values correct at every entity×timestamp through the as-of join,
with zero temporal leakage (BASELINE.json)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from audio_feature_extraction_ray.functions.oracle import oracle_asof, oracle_features
from audio_feature_extraction_ray.pipelines.flagship import feature_table, pit_join
from audio_feature_extraction_ray.sources.images import (
    generate_entity_events,
    synth_asof_queries,
)

N = 25


def test_flagship_pit_matches_serial_oracle():
    # engine: distributed features + windows + as-of join
    feats = feature_table(n_entities=N, concurrency=(1, 2))
    joined = pit_join(feats, N, n_queries=120).to_pandas()

    # oracle: serial features + searchsorted as-of (failed-decode rows stay on
    # the timeline with null features, matching the engine)
    images = generate_entity_events(np.arange(N), N, seed=42)
    ofeats_all = oracle_features(images)
    queries = synth_asof_queries(N, 120).to_pandas()
    orc = oracle_asof(
        ofeats_all, queries, on="image_id", left_ts="query_ts", right_ts="ts",
        value_cols=("quality_score", "gray_mean"),
    )

    eng = joined.sort_values("query_id").reset_index(drop=True)
    orc = orc.sort_values("query_id").reset_index(drop=True)
    assert len(eng) == len(orc) == 120
    # identical match timestamps (incl. nulls for before-first / missing keys)
    assert eng["matched_ts"].isna().equals(orc["matched_ts"].isna())
    both = ~eng["matched_ts"].isna()
    assert (
        eng.loc[both, "matched_ts"].to_numpy() == orc.loc[both, "matched_ts"].to_numpy()
    ).all()
    # feature values allclose at every matched entity×timestamp
    for col in ("quality_score", "gray_mean"):
        a = eng.loc[both, f"{col}_asof"].to_numpy(dtype=np.float64)
        b = orc.loc[both, f"{col}_asof"].to_numpy(dtype=np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12, equal_nan=True)
    # anti-join coverage: some probes must miss (unknown entity / before first)
    assert (~both).sum() > 0


def test_flagship_pit_zero_leakage():
    """Deleting all feature rows with ts > max(query_ts) must not change any
    result — no feature at (entity, t) depends on rows after t."""
    full = pit_join(feature_table(n_entities=N, concurrency=(1, 2)), N, n_queries=80) \
        .to_pandas().sort_values("query_id")

    cutoff = synth_asof_queries(N, 80).to_pandas()["query_ts"].max()
    cutoff_scalar = pa.scalar(np.datetime64(cutoff, "us"), pa.timestamp("us"))

    pruned = feature_table(n_entities=N, concurrency=(1, 2)).map_batches(
        lambda t: t.filter(pc.less_equal(t.column("ts"), cutoff_scalar)),
        batch_format="pyarrow",
    )
    pruned_joined = pit_join(pruned, N, n_queries=80).to_pandas().sort_values("query_id")
    np.testing.assert_allclose(
        full["quality_score_asof"].to_numpy(dtype=np.float64),
        pruned_joined["quality_score_asof"].to_numpy(dtype=np.float64),
        equal_nan=True,
    )
