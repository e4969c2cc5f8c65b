"""Image kernels: stdlib PNG codec, real baseline JPEG codec, PSNR,
phash.

Pillow is not installed in this environment (SURVEY.md §7 phase 0), so
the engine ships its own codecs: a pure zlib/struct PNG writer+reader
(8-bit RGB) and a pure-NumPy baseline JFIF JPEG encoder+decoder
(kernels/jpeg.py — real DCT + quantization + Annex-K Huffman entropy
coding, not a simulation). ``fmt='jpeg'`` rows therefore carry true
JPEG bytes and the BASELINE.json "PSNR>=40dB for lossy" invariant is
measured against actual codec loss. The synthetic corpus is noise-
heavy (JPEG's worst case), so the encode quality defaults to 98 —
near-lossless quantization that keeps noise content above the gate.

phash is a deterministic 8x8 average hash of the decoded pixels (no
DCT), used as the near-duplicate key in the image dedup operator.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "encode_png", "decode_png", "encode_image", "decode_image",
    "psnr", "average_phash", "JPEG_QUALITY",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# noise-heavy synthetic corpus: q98 keeps PSNR ~44 dB on pure noise
# (structured content lands in the 50s), comfortably over the 40 dB gate
JPEG_QUALITY = 98


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """8-bit RGB (h, w, 3) uint8 -> PNG bytes (filter type 0 rows)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend filter byte 0 to each scanline
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Handles filters 0-2 (what we and
    most encoders of untextured data emit); raises on others.

    Same malformed-stream contract as ``decode_jpeg``: every parse
    failure (truncated chunk headers, missing/short IHDR, corrupt
    zlib stream, payload/dimension mismatch) raises ``ValueError`` —
    never struct.error/zlib.error/TypeError — so ``decode_stats``
    lands corrupt rows as ``ok=false`` instead of killing the task."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h = 8, None, None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(payload) < 13:
                raise ValueError("truncated IHDR")
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload[:13])
            if depth != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced")
            if w == 0 or h == 0:
                raise ValueError("IHDR declares zero dimension")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise ValueError("PNG payload size does not match dimensions")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    out = np.empty((h, w * 3), dtype=np.uint8)
    for y in range(h):
        line = rows[y, 1:].astype(np.int16)
        f = filters[y]
        if f == 0:
            out[y] = line.astype(np.uint8)
        elif f == 1:  # Sub: in-place cumulative defilter
            acc = line.copy()
            for i in range(3, w * 3):
                acc[i] = (acc[i] + acc[i - 3]) & 0xFF
            out[y] = acc.astype(np.uint8)
        elif f == 2:  # Up
            prev = out[y - 1].astype(np.int16) if y else 0
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter {f}")
    return out.reshape(h, w, 3)


def encode_image(pixels: np.ndarray, fmt: str,
                 quality: int = JPEG_QUALITY) -> bytes:
    """fmt='png' -> lossless PNG; fmt='jpeg' -> real baseline JFIF
    (4:4:4, quality-scaled Annex-K quantization)."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels, quality)
    raise NotImplementedError(f"unsupported format {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on the container format; both decoders are self-made
    (kernels/image.py PNG, kernels/jpeg.py baseline JFIF)."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    raise NotImplementedError(f"unsupported format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def average_phash(pixels: np.ndarray) -> int:
    """8x8 average hash -> int64. Grayscale by mean channel, block-mean
    downsample to 8x8, bit i set iff block > global mean."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    # keep it in signed int64 range for parquet
    if val >= 1 << 63:
        val -= 1 << 64
    return val
