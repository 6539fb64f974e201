"""Reshape transforms: wide→long melt and one-hot encoding.

Complements the pivot shape (conditional aggregation through the combiner,
``q_pivot_event_counts``): ``melt`` is its inverse — pure per-batch
restructuring, ZERO shuffle — and ``one_hot`` is the categorical
feature-engineering staple (indicator columns against a bounded, globally
agreed category set). The reference reshapes per-file feature dicts into
flat rows (04_feature_extraction_experiment/feature_extraction.py:200-260);
these are the columnar corpus-level equivalents.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def melt(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Wide→long: one output row per (input row, value column), with the
    column name in ``var_col`` and its value cast to float64 in
    ``value_col``. Pure map_batches — each batch melts independently, no
    shuffle, streaming-safe at any scale."""

    def fn(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_col] = pa.array([c] * t.num_rows, pa.string())
            cols[value_col] = pc.cast(t.column(c), pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def one_hot(
    ds: ray.data.Dataset,
    col: str,
    categories: list[str] | None = None,
    prefix: str | None = None,
    max_categories: int = 1000,
) -> ray.data.Dataset:
    """Append one int8 indicator column per category of ``col``
    (``{prefix}{category}``, prefix defaults to ``{col}_``).

    When ``categories`` is None a distributed distinct pass fixes the
    category set (sorted — every task agrees on the output schema); the set
    must be BOUNDED because it becomes schema width, so more than
    ``max_categories`` raises instead of silently fanning out thousands of
    columns. A NULL value yields NULL in every indicator (SQL ``x = c``
    comparison semantics — an unknown category is unknown, not "not c").
    The encode itself is a pure vectorized map — no shuffle beyond the one
    distinct pass."""
    if categories is None:
        u = ds.select_columns([col]).unique(col)
        cats = sorted(c for c in u if c is not None)
        if len(cats) > max_categories:
            raise ValueError(
                f"{col} has {len(cats)} distinct values (> {max_categories}); "
                f"pass an explicit category subset for one-hot encoding"
            )
    else:
        cats = list(categories)
    p = prefix if prefix is not None else col + "_"

    def fn(t: pa.Table) -> pa.Table:
        x = t.column(col)
        for c in cats:
            ind = pc.cast(pc.equal(x, pa.scalar(c)), pa.int8())
            t = t.append_column(p + str(c), ind)
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def json_extract_fields(
    ds: "ray.data.Dataset",
    json_col: str,
    fields: dict[str, tuple[str, pa.DataType]],
    drop_json: bool = True,
) -> "ray.data.Dataset":
    """Semi-structured parsing: extract typed scalar fields from a JSON
    string column — the event-properties flattening step every telemetry /
    weblog pipeline needs before the relational operators can touch the
    values. ``fields`` maps output column → (JSONPath, Arrow type), e.g.
    ``{"k": ("$.k", pa.int64())}``.

    Per batch the extraction is one vectorized polars ``json_path_match``
    per field (SIMD JSON scan, no per-row Python); missing keys, JSON
    nulls and malformed documents all yield NULL (polars semantics — more
    lenient than DuckDB's ``->>``, which errors on malformed JSON; the
    synthetic events are all well-formed, and the oracle pins the common
    case). Zero shuffle; a pure map stage.
    """
    import polars as pl

    def fn(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(
            t.column(json_col).combine_chunks()
            if isinstance(t.column(json_col), pa.ChunkedArray)
            else t.column(json_col)
        )
        out = {
            n: t.column(n)
            for n in t.column_names
            if not (drop_json and n == json_col)
        }
        for out_name, (path, typ) in fields.items():
            raw = s.str.json_path_match(path)
            if pa.types.is_string(typ):
                out[out_name] = raw.to_arrow()
                continue
            # lenient typed cast (polars strict=False): a well-formed record
            # whose value doesn't fit the declared type yields NULL instead
            # of killing the batch — one bad telemetry row is data, not a
            # job failure (the same contract as the decode stages)
            target = pl.from_arrow(pa.array([], typ)).dtype
            casted = raw.cast(target, strict=False).to_arrow()
            out[out_name] = pc.cast(casted, typ)
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
