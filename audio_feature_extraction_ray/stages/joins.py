"""Joins: broadcast hash join (small dim side), anti/semi joins, and a thin
wrapper over Ray's distributed hash join for large–large cases.

Reference recasts (SURVEY.md §2.5): the teacher↔student pairing equi-join (J1,
00_audio_data_collection_experiment/audio_quality_assessment.py:57-91), the
Excel scores lookup (J3, 00/src/main.py:24-31 — classic small-side broadcast),
and missing-counterpart detection (J2 anti-join,
05_dtw_alignment_experiment/dtw_alignment.py:1466-1468).

The broadcast join puts the small side in the object store ONCE (``ray.put``)
and every map task does a zero-copy pyarrow (Acero) join per batch — no
shuffle of the big side, the right pattern for dim tables at 100 TB scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


class _BroadcastJoiner:
    """Actor-pool stage holding the broadcast side (fetched once per actor)."""

    def __init__(self, small_ref, keys, join_type, rsuffix):
        self.small: pa.Table = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.keys = keys
        self.join_type = join_type
        self.rsuffix = rsuffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small,
            keys=self.keys,
            join_type=self.join_type,
            right_suffix=self.rsuffix,
        )


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table | ray.data.Dataset,
    keys: str | list[str],
    join_type: str = "inner",
    rsuffix: str = "_r",
    batch_size: int | None = 4096,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory table without shuffling.

    ``small`` may be a pyarrow Table or a (small!) Dataset that is collected
    on the driver. join_type follows pyarrow: 'inner', 'left outer', ...
    """
    if isinstance(small, ray.data.Dataset):
        tables = list(small.iter_batches(batch_format="pyarrow", batch_size=None))
        small = pa.concat_tables(tables) if tables else small.schema().empty_table()
    small = small.combine_chunks()
    ref = ray.put(small)
    keys = [keys] if isinstance(keys, str) else list(keys)
    return big.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, keys, join_type, rsuffix),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def broadcast_semi_join(
    big: ray.data.Dataset,
    small_keys: pa.Table,
    key: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Keep big rows whose ``key`` is (anti: is not) present in the small key
    set — membership test via ``pc.is_in`` against a broadcast value set."""
    values = ray.put(small_keys.column(key).combine_chunks())

    def fn(batch: pa.Table) -> pa.Table:
        vs = ray.get(values)
        mask = pc.is_in(batch.column(key), value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Large–large distributed hash join (Ray Data native shuffle join)."""
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is not None:
        right_on = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions, on=on, right_on=right_on
    )
