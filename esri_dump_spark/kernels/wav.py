"""Pure-stdlib PCM WAV codec (RIFF 'WAVE', 16-bit integer samples).

The audio leg of the multimodal surface: audio travels as an opaque
binary column and decodes executor-side, exactly like the JPEG/PNG
images and the MJPEG-AVI videos. WAV shares AVI's RIFF container
grammar (fmt / data chunks instead of hdrl / movi), so this module is
the audio sibling of ``kernels/avi.py``.

Malformed-stream contract (shared with decode_jpeg / decode_png /
parse_avi): every parse failure raises ``ValueError`` — never
struct.error / IndexError — so ``audio_stats`` lands corrupt rows as
ok=false instead of killing the task. Fuzz-enforced in
tests/test_audio.py.
"""

from __future__ import annotations

import struct

import numpy as np

from .avi import _chunk, _walk   # shared RIFF container grammar

__all__ = ["encode_wav", "parse_wav", "WavInfo"]


class WavInfo:
    """Parsed WAV: sample rate, channel count and the int16 samples
    (shape (n_frames, channels))."""

    __slots__ = ("rate", "channels", "samples")

    def __init__(self, rate: int, channels: int, samples: np.ndarray):
        self.rate = rate
        self.channels = channels
        self.samples = samples

    @property
    def n_frames(self) -> int:
        return self.samples.shape[0]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples (n,) mono or (n, ch) -> canonical PCM WAV bytes."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_wav takes int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0:
        raise ValueError("samples must be (n,) or (n, channels), n > 0")
    if rate <= 0 or rate > 0xFFFFFFFF:
        raise ValueError("bad sample rate")
    n, ch = s.shape
    if ch < 1 or ch > 0xFFFF:
        raise ValueError("bad channel count")
    data = np.ascontiguousarray(s, dtype="<i2").tobytes()
    block = ch * 2
    if rate * block > 0xFFFFFFFF or len(data) + 44 > 0xFFFFFFFF:
        # all RIFF sizes (incl. the fmt byte-rate field) are uint32 —
        # fail with the documented error type, not struct.error
        raise ValueError("WAV fields exceed 32-bit RIFF limits")
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(data: bytes) -> WavInfo:
    """PCM WAV bytes -> WavInfo. Accepts 16-bit integer PCM
    (format tag 1); other encodings raise ``NotImplementedError``
    (a legitimate codec boundary, handled as an invalid ROW by the
    operator), malformed streams raise ``ValueError``."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("WAV payload is not bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = 8 + riff_size
    if end > len(data):
        raise ValueError("truncated RIFF payload")
    fmt = None
    payload = None
    for tag, body, size in _walk(data, 12, end):
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", data[body:body + 16])
        elif tag == b"data":
            payload = data[body:body + size]
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, _, _, bits = fmt
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit integer PCM supported (tag={tag}, bits={bits})")
    if ch < 1 or rate <= 0:
        raise ValueError("invalid WAV channel count or rate")
    frame = ch * 2
    usable = len(payload) - (len(payload) % frame)
    if usable == 0:
        raise ValueError("WAV data chunk holds no complete frame")
    samples = np.frombuffer(payload[:usable], dtype="<i2") \
        .reshape(-1, ch).astype(np.int16)
    return WavInfo(rate, ch, samples)
