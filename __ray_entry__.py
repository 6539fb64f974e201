"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count
+ schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``audio_feature_extraction_ray.pipelines.queries``;
this module is a thin adapter. Nothing here (or below) calls ``ray.init`` —
the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship point-in-time image-feature pipeline at smoke scale.

    The engine's input table (BASELINE.json input_hint: image+caption event
    rows) is synthesized deterministically — no external data; testdata
    parquet tables are exercised via ``queries()``.
    """
    from audio_feature_extraction_ray.pipelines.flagship import flagship

    return flagship(n_entities=40, n_queries=150)


def queries() -> dict[str, Callable[[str], Any]]:
    from audio_feature_extraction_ray.pipelines.queries import QUERIES

    return {name: impl for name, (impl, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from audio_feature_extraction_ray.pipelines.queries import QUERIES

    return {name: sql for name, (_impl, sql) in QUERIES.items() if sql is not None}
