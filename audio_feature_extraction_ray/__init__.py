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
