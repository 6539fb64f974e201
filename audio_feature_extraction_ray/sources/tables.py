"""Parquet table source with pushed-down column pruning.

Replaces the reference's directory-glob sources (S1/S2, SURVEY.md §2.1): rows
in a columnar table, not files on disk. A thin indirection so the storage
format (parquet today; Lance when available) is a one-line switch.
"""

from __future__ import annotations

import os

import ray.data


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read ``{sf_dir}/{name}.parquet`` as a Dataset.

    Always pass ``columns`` in pipelines — a read that loads all columns for a
    two-column transform ships needless bytes out of storage at 100 TB scale.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns, **kwargs)
