"""Pure-NumPy image codecs: ``raw``, ``ppm``, ``png`` (lossless) and ``jpgl`` (lossy).

The reference decodes media with a pydub→soundfile→librosa fallback chain and
reuses decoder state per process (04_feature_extraction_experiment/
feature_extractor.py:62-131). Here the analog is a dependency-free codec set
(PIL/cv2 are not available in this environment): three lossless formats and a
deterministic DCT-quantization lossy format (``jpgl``) whose reconstruction
error is small enough to satisfy the PSNR ≥ 40 dB parity gate (BASELINE.md).

All functions are deterministic and operate on ``uint8`` HxWx3 arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "ppm", "png", "jpgl")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class DecodeError(ValueError):
    """Raised on malformed input; stages convert this to a status!='ok' row."""


# ---------------------------------------------------------------- raw

def _encode_raw(px: np.ndarray) -> bytes:
    h, w, c = px.shape
    return b"RAW1" + struct.pack("<III", h, w, c) + px.tobytes()


def _decode_raw(data: bytes) -> np.ndarray:
    if len(data) < 16:
        raise DecodeError("raw: truncated header")
    h, w, c = struct.unpack("<III", data[4:16])
    # The module contract is "HxWx3 uint8 or DecodeError": a header-consistent
    # payload with c != 3 (or a zero dimension) must fail HERE as a
    # DecodeError, not later as an IndexError inside a feature kernel.
    if c != 3 or h == 0 or w == 0:
        raise DecodeError("raw: unsupported dimensions")
    need = h * w * c
    body = data[16:]
    if len(body) != need:
        raise DecodeError("raw: payload size mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


# ---------------------------------------------------------------- ppm (P6)

def _encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _decode_ppm(data: bytes) -> np.ndarray:
    # Our encoder emits exactly three header lines; accept that shape only.
    try:
        nl1 = data.index(b"\n")
        nl2 = data.index(b"\n", nl1 + 1)
        nl3 = data.index(b"\n", nl2 + 1)
        w, h = (int(t) for t in data[nl1 + 1 : nl2].split())
        maxval = int(data[nl2 + 1 : nl3])
    except (ValueError, IndexError) as e:
        raise DecodeError(f"ppm: bad header: {e}") from e
    if maxval != 255 or w <= 0 or h <= 0:
        raise DecodeError("ppm: unsupported header values")
    body = data[nl3 + 1 :]
    if len(body) != w * h * 3:
        raise DecodeError("ppm: payload size mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- png (RGB8, filter 0)

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def _encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def _decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise DecodeError("png: bad signature")
    pos, w, h, idat = len(_PNG_SIG), None, None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise DecodeError("png: truncated chunk")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise DecodeError("png: only 8-bit RGB supported")
            if w == 0 or h == 0:
                raise DecodeError("png: zero dimension")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise DecodeError("png: missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise DecodeError(f"png: inflate failed: {e}") from e
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise DecodeError("png: scanline size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if np.any(arr[:, 0] != 0):
        raise DecodeError("png: unsupported scanline filter")
    return arr[:, 1:].reshape(h, w, 3).copy()


# ---------------------------------------------------------------- jpgl (deterministic DCT-lossy)

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_matrix(8)
# Quantization step grows with spatial frequency; calibrated so reconstruction
# PSNR stays well above the 40 dB gate while remaining genuinely lossy.
_QSTEP = 1.0 + 0.5 * (np.arange(8)[:, None] + np.arange(8)[None, :])


def _blockify(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    blocks = ch.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return blocks, hh, ww


def _encode_jpgl(px: np.ndarray) -> bytes:
    h, w, c = px.shape
    coeffs = []
    for ci in range(c):
        blocks, _, _ = _blockify(px[:, :, ci].astype(np.float64) - 128.0)
        dct = _D8 @ blocks @ _D8.T  # broadcast matmul over the block grid
        q = np.round(dct / _QSTEP).astype(np.int16)
        coeffs.append(q)
    payload = zlib.compress(np.stack(coeffs).tobytes(), 6)
    return b"JPGL" + struct.pack("<III", h, w, c) + payload


def _decode_jpgl(data: bytes) -> np.ndarray:
    if len(data) < 16:
        raise DecodeError("jpgl: truncated header")
    h, w, c = struct.unpack("<III", data[4:16])
    if h == 0 or w == 0 or c != 3:
        raise DecodeError("jpgl: bad dimensions")
    try:
        raw = zlib.decompress(data[16:])
    except zlib.error as e:
        raise DecodeError(f"jpgl: inflate failed: {e}") from e
    hh, ww = h + (-h) % 8, w + (-w) % 8
    nb = (hh // 8) * (ww // 8)
    if len(raw) != c * nb * 64 * 2:
        raise DecodeError("jpgl: coefficient size mismatch")
    q = np.frombuffer(raw, dtype=np.int16).reshape(c, hh // 8, ww // 8, 8, 8)
    out = np.empty((h, w, c), dtype=np.uint8)
    for ci in range(c):
        dct = q[ci].astype(np.float64) * _QSTEP
        blocks = _D8.T @ dct @ _D8  # inverse: transpose basis, broadcast matmul
        ch = blocks.transpose(0, 2, 1, 3).reshape(hh, ww)[:h, :w]
        out[:, :, ci] = np.clip(np.round(ch + 128.0), 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------- dispatch

_ENCODERS = {"raw": _encode_raw, "ppm": _encode_ppm, "png": _encode_png, "jpgl": _encode_jpgl}


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    """Encode an HxWx3 uint8 array into ``fmt`` bytes."""
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_image expects HxWx3 uint8")
    try:
        enc = _ENCODERS[fmt]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}") from None
    return enc(np.ascontiguousarray(px))


def decode_image(data: bytes) -> np.ndarray:
    """Decode bytes (format sniffed from magic) into an HxWx3 uint8 array.

    Raises :class:`DecodeError` on any malformed input; distributed stages
    catch it and emit ``status != 'ok'`` rows instead of failing the task
    (reference sentinel behavior, 04/feature_extractor.py:25-40).
    """
    if not data or len(data) < 4:
        raise DecodeError("empty or too-short payload")
    magic = bytes(data[:4])
    if magic == b"RAW1":
        return _decode_raw(data)
    if magic.startswith(b"P6"):
        return _decode_ppm(data)
    if bytes(data[:8]) == _PNG_SIG:
        return _decode_png(data)
    if magic == b"JPGL":
        return _decode_jpgl(data)
    raise DecodeError(f"unknown magic {magic!r}")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images (dB; inf if equal)."""
    if a.shape != b.shape:
        return float("nan")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))
