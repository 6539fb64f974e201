"""Stage protocol + registry: the user-extension surface (SURVEY.md §2.9).

The reference extends its pipeline by monkey-patching extractor methods
(``extractor.preprocess_audio = custom_fn``, README.md:129-138) and editing
YAML config chains (04_feature_extraction_experiment/process_audio.py:14-26).
The Ray-Data-first recast is
a declarative REGISTRY: every built-in operator registers under a name, users
register their own with :func:`register_stage`, and :func:`build_pipeline`
composes a ``Dataset → Dataset`` chain from plain config
(``[{"stage": name, ...params}, ...]``) — validated up front with actionable
errors, exactly like the preprocess chain validator
(stages/preprocess.py:136-147) but for the whole operator surface.

A stage factory is ``(ds: Dataset, **params) -> Dataset``. Registration is
idempotent per name unless ``replace=True`` (so user code can shadow a
built-in deliberately, never accidentally).
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

import ray.data

_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str, fn: Callable | None = None, replace: bool = False):
    """Register a stage factory under ``name``; usable as a decorator.

    >>> @register_stage("my_op")
    ... def my_op(ds, *, factor: float = 2.0): ...
    """

    def _do(f: Callable) -> Callable:
        if name in _REGISTRY and not replace:
            raise ValueError(
                f"stage {name!r} already registered (pass replace=True to shadow it)"
            )
        _REGISTRY[name] = f
        return f

    return _do(fn) if fn is not None else _do


def get_stage(name: str) -> Callable:
    if name not in _REGISTRY:
        known = ", ".join(sorted(_REGISTRY))
        raise KeyError(f"unknown stage {name!r}; registered stages: {known}")
    return _REGISTRY[name]


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def validate_chain(chain: list[dict]) -> None:
    """Fail fast with the exact step/param that is wrong — before any
    cluster work is scheduled."""
    for i, step in enumerate(chain):
        if "stage" not in step:
            raise ValueError(f"chain step {i} missing 'stage': {step!r}")
        fn = get_stage(step["stage"])
        sig = inspect.signature(fn)
        params = {k: v for k, v in step.items() if k != "stage"}
        has_kwargs = any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
        )
        if not has_kwargs:
            allowed = set(list(sig.parameters)[1:])  # first param is the Dataset
            unknown = set(params) - allowed
            if unknown:
                raise ValueError(
                    f"chain step {i} ({step['stage']!r}): unknown params {sorted(unknown)}; "
                    f"accepted: {sorted(allowed)}"
                )


def build_pipeline(ds: ray.data.Dataset, chain: list[dict]) -> ray.data.Dataset:
    """Apply a validated config chain of registered stages in order."""
    validate_chain(chain)
    for step in chain:
        fn = get_stage(step["stage"])
        ds = fn(ds, **{k: v for k, v in step.items() if k != "stage"})
    return ds


# ---------------------------------------------------------------- built-ins

def _register_builtins() -> None:
    from . import aggregates, dedup, sampling, text, window
    from .joins import broadcast_join  # noqa: F401  (broadcast needs a table arg)

    register_stage("filter_expr", lambda ds, *, expr: ds.filter(expr=expr))
    register_stage("select", lambda ds, *, columns: ds.select_columns(columns))
    register_stage("drop", lambda ds, *, columns: ds.drop_columns(columns))
    register_stage("limit", lambda ds, *, n: ds.limit(n))
    register_stage(
        "sort", lambda ds, *, keys, descending=False: ds.sort(keys, descending=descending)
    )
    from .util import grouped_topk, topk

    register_stage("topk", topk)
    register_stage("grouped_topk", grouped_topk)
    register_stage("repartition", lambda ds, *, n: ds.repartition(n))
    register_stage("window_features", window.window_features)
    register_stage("grouped_rank", window.grouped_rank)
    register_stage("window_features_bucketed", window.window_features_bucketed)
    register_stage("sessionize", window.sessionize)
    register_stage("time_bucket", window.time_bucket)
    register_stage("text_features", text.text_features)
    register_stage("redact", text.redact)
    register_stage("chunk_text", text.chunk_text)
    register_stage("grouped_stats", aggregates.grouped_stats)
    register_stage("grouped_agg_fast", aggregates.grouped_agg_fast)
    register_stage("approx_quantiles_grouped", aggregates.approx_quantiles_grouped)
    register_stage("dedup_exact", dedup.dedup_exact)
    register_stage("minhash_pairs", dedup.minhash_dedup_pairs)
    register_stage("simhash_pairs", dedup.simhash_dedup_pairs)
    register_stage("hamming_pairs", dedup.hamming_dedup_pairs)
    register_stage("connected_components", dedup.connected_components)
    register_stage("embedding_pairs", dedup.embedding_dedup_pairs)
    register_stage("deterministic_sample", sampling.deterministic_sample)
    register_stage("weighted_sample", sampling.weighted_sample)
    register_stage("hash_split", sampling.hash_split)


_register_builtins()
