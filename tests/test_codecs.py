"""Codec roundtrip + PSNR gate tests (BASELINE.md: PSNR >= 40 dB for lossy)."""

import numpy as np
import pytest

from audio_feature_extraction_ray.functions import codecs
from audio_feature_extraction_ray.functions.imagefx import phash64, phash_embedding, resize_area

SHAPES = [(1, 1), (3, 5), (8, 8), (37, 61), (64, 128)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("fmt", ["raw", "ppm", "png"])
def test_lossless_roundtrip(shape, fmt):
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    out = codecs.decode_image(codecs.encode_image(px, fmt))
    assert np.array_equal(out, px)


@pytest.mark.parametrize("shape", SHAPES)
def test_lossy_psnr_gate(shape):
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    out = codecs.decode_image(codecs.encode_image(px, "jpgl"))
    assert codecs.psnr_db(px, out) >= 40.0


def test_corrupt_inputs_raise_decode_error():
    good = codecs.encode_image(np.zeros((4, 4, 3), np.uint8), "png")
    for bad in [b"", b"xx", b"BOGUS123", good[: len(good) // 2], b"RAW1" + b"\x00" * 5]:
        with pytest.raises(codecs.DecodeError):
            codecs.decode_image(bad)


def test_phash_and_embedding_shape():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    h = phash64(px)
    assert isinstance(h, int) and -(2**63) <= h < 2**63
    e = phash_embedding(px)
    assert e.shape == (64,) and e.dtype == np.float32
    assert abs(np.linalg.norm(e) - 1.0) < 1e-5


def test_resize_area_degenerate():
    g = np.ones((1, 1), dtype=np.float64) * 7.0
    out = resize_area(g, 32, 32)
    assert out.shape == (32, 32) and np.allclose(out, 7.0)
