"""audio_feature_extraction_ray — a Ray-Data-native point-in-time feature-engineering engine.

A from-scratch re-expression of the capabilities of the reference repo
``chiy48308/audio_feature_extraction`` (see SURVEY.md) as idiomatic Ray Data:

- one logical table per ``ray.data.Dataset``; every per-record stage is
  ``map_batches`` over zero-copy Arrow batches,
- stateful stages (decoders, tokenizers, min-hashers) are callable-class
  actor pools,
- wide steps (as-of join, sessionization, grouped stats, dedup) are
  ``groupby`` / ``sort`` / ``repartition`` compositions with explicit
  partitioning keys,
- failures are data (``status`` column), never exceptions from UDFs
  (reference precedent: sentinel dicts, 04/feature_extractor.py:25-40).

The package never calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, or the test fixture).
"""

__version__ = "0.1.0"

import logging as _logging


class _EmptyBlockSchemaNoise(_logging.Filter):
    """Drop ONE benign Ray warning: shuffle stages (sort-based groupby /
    repartition) legitimately emit zero-row blocks whose schema is EMPTY,
    and the streaming executor then warns "produced a RefBundle with a
    different schema ... new schema: ." once per such block — dozens of
    times per bench run. Only the empty-new-schema form is dropped; real
    schema divergence (non-empty mismatching schemas) still warns."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: ." in msg
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyBlockSchemaNoise())
