"""Property-based tests (hypothesis) over the pure kernels — an upgrade over
the reference, which has no randomized testing anywhere (SURVEY.md §5)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from audio_feature_extraction_ray.functions import codecs
from audio_feature_extraction_ray.functions.imagefx import phash64, resize_area
from audio_feature_extraction_ray.functions.textfx import (
    char_shingle_hashes,
    est_jaccard,
    make_minhash_params,
    minhash_signature,
    ws_tokens,
)
from audio_feature_extraction_ray.stages.window import _bfill, _ffill, _shift

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=40, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1),
       fmt=st.sampled_from(["raw", "ppm", "png"]))
def test_lossless_roundtrip_property(h, w, seed, fmt):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    assert np.array_equal(codecs.decode_image(codecs.encode_image(px, fmt)), px)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
def test_lossy_psnr_property(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    out = codecs.decode_image(codecs.encode_image(px, "jpgl"))
    assert out.shape == px.shape
    assert codecs.psnr_db(px, out) >= 40.0


@settings(max_examples=30, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
def test_phash_and_resize_total(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    ph = phash64(px)
    assert -(2**63) <= ph < 2**63
    r = resize_area(px[:, :, 0].astype(np.float64), 32, 32)
    assert r.shape == (32, 32) and np.isfinite(r).all()


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), st.floats(-1e6, 1e6)), min_size=1, max_size=50),
       k=st.integers(1, 5))
def test_shift_and_fill_match_pandas(vals, k):
    x = np.array([np.nan if v is None else v for v in vals], dtype=np.float64)
    s = pd.Series(x)
    np.testing.assert_allclose(_shift(x, k), s.shift(k).to_numpy(), equal_nan=True)
    np.testing.assert_allclose(_shift(x, -k), s.shift(-k).to_numpy(), equal_nan=True)
    np.testing.assert_allclose(_ffill(x.copy()), s.ffill().to_numpy(), equal_nan=True)
    np.testing.assert_allclose(_bfill(x.copy()), s.bfill().to_numpy(), equal_nan=True)


@settings(max_examples=50, deadline=None)
@given(text=st.text(max_size=200))
def test_text_kernels_total(text):
    assert ws_tokens(text) == text.split()
    sh = char_shingle_hashes(text, 5)
    assert (sh < np.uint64(1_000_000_007)).all()
    a, b = make_minhash_params(16, 1)
    sig = minhash_signature(sh, a, b)
    assert sig.shape == (16,)
    assert est_jaccard(sig, sig) == 1.0


@settings(max_examples=30, deadline=None)
@given(a=st.text(max_size=120), b=st.text(max_size=120))
def test_minhash_estimates_bounded_and_symmetric(a, b):
    pa_, pb_ = make_minhash_params(32, 7)
    sa = minhash_signature(char_shingle_hashes(a, 4), pa_, pb_)
    sb = minhash_signature(char_shingle_hashes(b, 4), pa_, pb_)
    j1, j2 = est_jaccard(sa, sb), est_jaccard(sb, sa)
    assert 0.0 <= j1 <= 1.0 and j1 == j2
    if a == b:
        assert j1 == 1.0


def test_round_half_away_matches_duckdb_on_random_values():
    """Bulk check of the SQL rounding parity helper against DuckDB itself."""
    import duckdb

    from audio_feature_extraction_ray.pipelines.queries import _round_half_away

    rng = np.random.default_rng(123)
    xs = np.concatenate([
        rng.uniform(-1e6, 1e6, 4000),
        rng.uniform(-1, 1, 4000),
        np.round(rng.uniform(-1000, 1000, 2000), 4),  # grid values incl. .5 ties
    ])
    con = duckdb.connect()
    for digits in (2, 4, 6):
        ours = _round_half_away(xs, digits)
        df = pd.DataFrame({"x": xs})
        con.register("t", df)
        theirs = con.sql(f"SELECT round(x, {digits}) r FROM t").df()["r"].to_numpy()
        mism = np.flatnonzero(ours != theirs)
        assert len(mism) == 0, (digits, xs[mism[:3]], ours[mism[:3]], theirs[mism[:3]])


@settings(max_examples=60, deadline=None)
@given(tok=st.lists(st.integers(0, 400), min_size=1, max_size=200),
       budget=st.integers(1, 300))
def test_greedy_pack_fold_matches_serial(tok, budget):
    from audio_feature_extraction_ray.stages.text import greedy_pack_fold

    tok = np.asarray(tok, dtype=np.int64)
    pack_of, pos, fill = greedy_pack_fold(tok, budget)
    # row-at-a-time reference fold
    seq, cur, p = 0, 0, 0
    for i, t in enumerate(tok):
        if i > 0 and cur + t > budget:
            seq, cur, p = seq + 1, 0, 0
        cur += t
        assert pack_of[i] == seq
        assert pos[i] == p
        assert fill[i] == cur
        p += 1
    # invariants: fills within a pack are non-decreasing, packs contiguous
    assert pack_of[0] == 0
    assert np.all(np.diff(pack_of) >= 0) and np.all(np.diff(pack_of) <= 1)
    closed = fill[np.concatenate((np.diff(pack_of) == 1, [True]))]
    multi = np.bincount(pack_of)[pack_of[np.concatenate((np.diff(pack_of) == 1, [True]))]] > 1
    assert np.all(closed[multi] <= budget)  # only singleton packs may overflow


@settings(max_examples=80, deadline=None)
@given(k=st.integers(0, 65536),
       h=st.integers(0, 65535))
def test_hex_threshold_string_compare_matches_integer(k, h):
    """The SQL oracles compare md5 hex prefixes as STRINGS against
    lpad(to_hex(k)); pin that this equals the integer comparison the
    Python side uses, for every threshold including the keep-all edge."""
    hs = format(h, "04x")
    want = h < k
    got = k >= 65536 or hs < format(k, "04x")
    assert got == want


@settings(max_examples=80, deadline=None)
@given(rate=st.floats(0.0, 2.0, allow_nan=False),
       h=st.integers(0, 65535))
def test_int_threshold_matches_hex_string_compare(rate, h):
    """_int_threshold's integer compare must agree with the SQL oracles'
    hex-string compare for every sub-1.0 rate, and be match-all at >= 1.0
    (where the string form '10000' would lose the lexicographic compare)."""
    from audio_feature_extraction_ray.stages.sampling import _int_threshold

    thr = _int_threshold(rate, 4)
    if rate >= 1.0:
        assert thr == 65536 and h < thr
    else:
        k = max(0, min(65536, int(rate * 65536)))
        assert (h < thr) == (format(h, "04x") < format(k, "04x"))


# ---------------------------------------------------------- null-safe key encoding

_key_strategies = st.sampled_from(["int", "float", "str", "ts", "bool"])


@settings(max_examples=60, deadline=None)
@given(kind=_key_strategies, data=st.data())
def test_null_filled_key_grouping_invariants(kind, data):
    """The surrogate pair (is-null flag, sentinel-filled key) must induce
    EXACTLY the SQL GROUP BY partition of the original nullable key: two
    rows share a (flag, filled) pair iff they share a key value (null==null
    as one group), and the filled array never contains a null."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from audio_feature_extraction_ray.stages.util import null_filled_key

    base = {
        "int": st.integers(-5, 5),
        "float": st.sampled_from([0.0, 1.5, -2.25, 1e18]),
        "str": st.sampled_from(["", "a", "b", "0", "None"]),
        "ts": st.integers(0, 10),
        "bool": st.booleans(),
    }[kind]
    vals = data.draw(st.lists(st.one_of(st.none(), base), min_size=1, max_size=30))
    typ = {"int": pa.int64(), "float": pa.float64(), "str": pa.string(),
           "ts": pa.timestamp("us"), "bool": pa.bool_()}[kind]
    arr = pa.array(vals, typ)
    filled = null_filled_key(arr, "k")
    assert filled.null_count == 0
    flags = pc.is_null(arr).to_pylist()
    pairs = list(zip(flags, filled.to_pylist()))
    orig = [None if v is None else v for v in arr.to_pylist()]
    for i in range(len(vals)):
        for j in range(len(vals)):
            same_orig = (orig[i] is None and orig[j] is None) or \
                (orig[i] is not None and orig[j] is not None and orig[i] == orig[j])
            assert (pairs[i] == pairs[j]) == same_orig, (
                f"rows {i},{j}: orig {orig[i]!r}/{orig[j]!r} "
                f"pairs {pairs[i]!r}/{pairs[j]!r}")
