"""Deterministic sampling / splitting for training-data pipelines.

Hash-based (md5) row sampling is reproducible across engines and cluster
sizes — the property a 100 TB training-data subsample needs (and that
``random_shuffle``-based sampling lacks). The same expression is SQL-portable
(``md5(key) < threshold-hex``), so the gate can oracle-check it exactly.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _int_threshold(rate: float, digits: int = 4) -> int:
    """Integer hash-range threshold with an explicit match-all edge.

    Compared as ``int(md5_prefix, 16) < k``. At ``rate >= 1.0`` returns
    ``16**digits`` (match-all) — the STRING form of that threshold is
    ``'10000'`` (digits+1 chars), which loses the lexicographic compare
    against most digits-char hashes and silently mislabels the final
    split (mix_domains guards this with its ``k >= base`` branch; every
    hash-range operator must do the same)."""
    base = 16 ** digits
    if rate >= 1.0 - 1e-12:
        return base
    return max(0, min(base, int(rate * base)))


def _row_keys(t: pa.Table, cols: list[str], sep: str) -> list:
    """Concatenated per-row key strings, built columnar (Arrow cast + join —
    matches SQL ``CAST(c AS VARCHAR) || sep || ...`` exactly, INCLUDING null
    propagation: any null key column yields a None entry, which every caller
    treats as SQL's NULL-comparison no-match). Only the md5 itself remains
    per-row (the oracle contract pins the hash function)."""
    arrs = [pc.cast(t.column(c), pa.string()) for c in cols]
    joined = arrs[0] if len(arrs) == 1 else pc.binary_join_element_wise(*arrs, sep)
    return joined.to_pylist()


def deterministic_sample(
    ds: ray.data.Dataset,
    key_fn_cols: list[str],
    rate: float,
    sep: str = "-",
    digits: int = 4,
) -> ray.data.Dataset:
    """Keep rows where ``md5(join(cols)) < rate`` (first ``digits`` hex chars).

    Equivalent SQL predicate:
    ``substr(md5(CAST(c1 AS VARCHAR) || '-' || ...), 1, digits) < '<hex>'``.
    """
    thr = _int_threshold(rate, digits)

    def fn(t: pa.Table) -> pa.Table:
        keys = _row_keys(t, key_fn_cols, sep)
        # null key -> SQL `NULL < thr` is NULL -> row excluded
        keep = [k is not None
                and int(hashlib.md5(k.encode()).hexdigest()[:digits], 16) < thr
                for k in keys]
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: ray.data.Dataset,
    key_cols: list[str],
    weight_col: str,
    k: int,
    sep: str = "-",
    tiebreak: str | None = None,
) -> ray.data.Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis): each row scores ``u^(1/w)`` where ``u`` derives from the md5
    of its key — no RNG state, identical samples on any cluster size — and
    the global top-k scores win via the shuffle-free :func:`topk`. The
    quality-weighted corpus-selection primitive (weight = quality score /
    token count / dedup multiplicity). SQL-replayable: DuckDB parses the
    same md5 hex prefix and computes the same POW.
    """
    import numpy as np

    from .util import topk

    def score(t: pa.Table) -> pa.Table:
        keys = _row_keys(t, key_cols, sep)
        # null key -> no sampling score: the row is excluded outright
        # (SQL: POW over a NULL hash is NULL — never a top-k candidate)
        valid = [s is not None for s in keys]
        if not all(valid):
            t = t.filter(pa.array(valid))
            keys = [s for s in keys if s is not None]
        # null/NaN weight -> excluded outright, same SQL contract as null
        # keys (POW with a NULL exponent is NULL — never a top-k candidate);
        # a NaN score would otherwise survive Arrow's descending sort into
        # the final k slots. ONE pass: to_numpy on a nullable numeric
        # column already yields NaN for nulls, so one mask covers both.
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        wkeep = ~np.isnan(w)
        if not wkeep.all():
            t = t.filter(pa.array(wkeep))
            keys = [s for s, kp in zip(keys, wkeep) if kp]
            w = w[wkeep]
        u = np.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:13], 16) for s in keys],
            dtype=np.float64,
        ) / float(16**13)
        sc = np.power(u, 1.0 / np.maximum(w, 1e-12))
        return t.append_column("score", pa.array(sc, pa.float64())) \
            .append_column("__wskey", pa.array(keys, pa.string()))

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    # the key string is the default secondary order: identical scores can
    # only come from identical KEYS (u is a pure key hash), so the sample's
    # key multiset is deterministic on any cluster size; pass ``tiebreak``
    # (a unique column) when exact duplicate keys must also resolve their
    # payload rows deterministically
    keys = ["score", "__wskey"] + ([tiebreak] if tiebreak else [])
    desc = [True, False] + ([False] if tiebreak else [])
    out = topk(scored, keys, k, descending=desc)
    return out.map_batches(lambda t: t.drop_columns(["__wskey"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds: ray.data.Dataset,
    key_fn_cols: list[str],
    splits: dict[str, float],
    sep: str = "-",
    digits: int = 4,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Assign a deterministic train/val/test split column by hash range.

    ``splits`` maps name → fraction (must sum to ≤ 1; remainder → "rest").
    Rows with the same key always land in the same split, on any cluster.
    """
    bounds = []
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        bounds.append((name, _int_threshold(acc, digits)))

    def fn(t: pa.Table) -> pa.Table:
        keys = _row_keys(t, key_fn_cols, sep)
        out = []
        for k in keys:
            if k is None:
                # SQL: CASE WHEN NULL < thr ... -> every arm NULL -> ELSE
                out.append("rest")
                continue
            h = int(hashlib.md5(k.encode()).hexdigest()[:digits], 16)
            for name, b in bounds:
                if h < b:
                    out.append(name)
                    break
            else:
                out.append("rest")
        return t.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_cols: list[str],
    k: int,
    sep: str = "-",
    hash_col: str = "h",
    digits: int = 16,
) -> ray.data.Dataset:
    """Deterministic per-GROUP sampling: the ``k`` rows of each group with
    the smallest md5-prefix of their key — equal-depth stratification with
    no RNG state, identical on any cluster size, SQL-replayable as
    ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY substr(md5(key),
    1, digits), key) <= k``.

    Rides :func:`~.util.grouped_topk`'s map-side combine: every batch keeps
    at most ``k`` rows per group it sees, so the shuffle moves ≤ blocks×k
    rows per group, never the stratum's full population."""
    from .util import grouped_topk

    def add_hash(t: pa.Table) -> pa.Table:
        keys = _row_keys(t, key_cols, sep)
        # null key -> lexicographically-last sentinel ('g' > any hex char):
        # sampled only after every hashed row, mirroring SQL NULLS LAST
        h = ["g" if s is None else
             hashlib.md5(s.encode()).hexdigest()[:digits] for s in keys]
        return t.append_column(hash_col, pa.array(h, pa.string()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_topk(
        hashed, group_col, [hash_col] + key_cols, k,
        descending=[False] * (1 + len(key_cols)),
    )


def mix_domains(
    ds: ray.data.Dataset,
    domain_col: str,
    weight_col: str,
    key_cols: list[str],
    budgets: dict[str, int] | None = None,
    sep: str = "-",
    digits: int = 4,
) -> ray.data.Dataset:
    """Domain-mixture rebalancing: deterministically subsample each domain
    to a token budget — the corpus-mixing step (DoReMi-style static
    reweighting, public) between per-domain curation and training. With
    ``budgets=None`` every domain is equalized DOWN to the smallest
    domain's total weight (uniform mixture); otherwise ``budgets`` maps
    domain → absolute weight budget (domains absent from the map are
    dropped).

    Per domain the keep rate is the integer threshold
    ``k = min(16^digits, budget * 16^digits // total)`` and a row survives
    iff ``md5(key) < k`` on the first ``digits`` hex chars — the same
    cross-engine reproducible rule as :func:`deterministic_sample`, so the
    realized mixture is cluster-size-invariant and SQL-replayable
    (integer arithmetic both sides; no float thresholds to drift).

    Scale shape: one tiny grouped aggregate (#domains rows on the driver —
    domain catalogs are small by nature), thresholds close over the batch
    filter; the corpus itself streams with zero shuffle. Output adds
    ``mix_k`` (the domain's threshold) for value-checking.
    """
    from .aggregates import grouped_agg_fast

    base = 16 ** digits
    totals = grouped_agg_fast(
        ds.select_columns([domain_col, weight_col]),
        keys=[domain_col],
        specs=[("total", weight_col, "sum")],
    ).take_all()
    tot = {r[domain_col]: int(r["total"]) for r in totals}
    if budgets is None:
        floor = min(tot.values()) if tot else 0
        budgets = {d: floor for d in tot}
    thr = {
        d: min(base, budgets[d] * base // tot[d]) if tot.get(d) else base
        for d in budgets
        if d in tot
    }

    def fn(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            list(t.schema) + [pa.field("mix_k", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        doms = t.column(domain_col).to_pylist()
        keys = _row_keys(t, key_cols, sep)
        ks = [thr.get(d, -1) for d in doms]
        keep = [
            s is not None
            and (k >= base
                 or (k >= 0
                     and int(hashlib.md5(s.encode()).hexdigest()[:digits], 16) < k))
            for k, s in zip(ks, keys)
        ]
        kept = t.filter(pa.array(keep))
        kept_ks = [k for k, f in zip(ks, keep) if f]
        return kept.append_column("mix_k", pa.array(kept_ks, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def leakage_safe_split(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    splits: dict[str, float],
    digits: int = 4,
    out_col: str = "split",
    rep_col: str = "group_rep",
) -> ray.data.Dataset:
    """Duplicate-group-aware train/val/test split: every row in a
    ``group_col`` group (e.g. an exact-dup fingerprint cluster, a near-dup
    component id) lands in the SAME split, assigned by the md5 of the
    group's minimum ``id_col`` — the standard guard against train/test
    contamination through duplicated documents (splitting by row hash puts
    near-copies of one document on both sides of the split).

    Scale shape: ONE group-hash exchange co-locates each group (inevitable
    for group-consistent assignment); within a partition the per-group min
    and the split label are one vectorized pass — no per-group Python, no
    driver state. Output adds ``rep_col`` (the group's representative id)
    and ``out_col``; the same md5 hash-range scheme as :func:`hash_split`,
    so the assignment is cluster-size-invariant and SQL-replayable
    (``MIN(id) OVER (PARTITION BY group)``).
    """
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        bounds.append((name, _int_threshold(acc, digits)))

    from .util import coarse_partitioned

    def per_part(block: pa.Table) -> pa.Table:
        import numpy as np

        out_schema = pa.schema(
            list(block.schema)
            + [pa.field(rep_col, block.schema.field(id_col).type),
               pa.field(out_col, pa.string())]
        )
        if block.num_rows == 0:
            return out_schema.empty_table()
        g = block.column(group_col)
        enc = (g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g) \
            .dictionary_encode()
        # NULL group values form ONE group of their own (SQL PARTITION BY
        # groups NULLs together) — a null dictionary index would otherwise
        # become INT64_MIN and blow up the scatter-min
        codes = pc.fill_null(enc.indices, len(enc.dictionary)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        n_groups = int(codes.max()) + 1
        reps = np.full(n_groups, ids.max())
        np.minimum.at(reps, codes, ids)
        # one md5 per GROUP, not per row
        labels = []
        for r in reps:
            h = int(hashlib.md5(str(r).encode()).hexdigest()[:digits], 16)
            for name, b in bounds:
                if h < b:
                    labels.append(name)
                    break
            else:
                labels.append("rest")
        lab_arr = np.asarray(labels, dtype=object)
        return block.append_column(
            rep_col, pa.array(reps[codes], block.schema.field(id_col).type)
        ).append_column(out_col, pa.array(lab_arr[codes].tolist(), pa.string()))

    return coarse_partitioned(ds, group_col, per_part)
