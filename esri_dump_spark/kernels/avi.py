"""Pure-stdlib MJPEG-in-AVI (RIFF) container codec.

The container has no video codec libraries, but MJPEG needs none: an
AVI 'movi' list of ``00dc`` chunks whose payloads are plain baseline
JPEG streams, decodable by the existing pure-NumPy codec
(``kernels/jpeg.py``). This module writes and parses that container —
real RIFF structure (hdrl/avih/strl/strh/strf, movi, idx1), not a
framing simulation — so the video column in the multimodal surface
carries genuinely playable bytes (ffplay/mpv open them).

Reference seed: the ESRI ImageServer raster handling
(`reference/src/index.ts:26,67`) treats rasters as fetch-and-decode
payloads; this extends the same opaque-binary-column posture to video.

Malformed-stream contract (same as ``decode_jpeg``/``decode_png``):
every parse failure raises ``ValueError`` — never struct.error /
IndexError / KeyError — so ``frame_sample`` lands corrupt rows as
ok=false instead of killing the task. Enforced by a hypothesis fuzz
test (tests/test_video.py).
"""

from __future__ import annotations

import struct

__all__ = ["encode_avi_mjpeg", "parse_avi", "AviInfo"]


class AviInfo:
    """Parsed AVI: dims, timing and the raw JPEG payload per frame."""

    __slots__ = ("width", "height", "fps", "frames")

    def __init__(self, width: int, height: int, fps: float,
                 frames: list[bytes]):
        self.width = width
        self.height = height
        self.fps = fps
        self.frames = frames

    @property
    def n_frames(self) -> int:
        return len(self.frames)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + LE size + payload, padded to even length
    (the pad byte is not counted in the size — RIFF rule)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG frame byte strings -> a standards-shaped MJPEG AVI.

    Writes the canonical single-stream layout: RIFF('AVI ') [
    LIST hdrl [avih, LIST strl [strh 'vids'/'MJPG', strf
    BITMAPINFOHEADER]], LIST movi [00dc ...], idx1 ]. Frame bytes are
    embedded verbatim (no transcode) — parse_avi returns them
    bit-identical.
    """
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("AVI dims must fit the 16-bit rcFrame fields")
    usec_per_frame = round(1_000_000 / fps)
    max_size = max(len(f) for f in frames)
    if max_size * fps > 0xFFFFFFFF or len(frames) > 0xFFFFFFFF:
        # all RIFF sizes are uint32 — fail with the documented error
        # type instead of struct.error deep in a pack call
        raise ValueError("AVI fields exceed 32-bit RIFF limits")
    # the TOTAL riff payload is a uint32 too: many moderate frames can
    # sum past 4 GiB even when every per-field check above passes.
    # Per-frame cost = chunk header (8) + payload + odd-byte pad;
    # the headers/index add 8+4 (RIFF+'AVI ') + hdrl (~132) + movi
    # list overhead (12) + idx1 (8 + 16/frame) — bound generously.
    total = sum(len(f) + 8 + (len(f) & 1) + 16 for f in frames) + 1024
    if total > 0xFFFFFFFF:
        raise ValueError("AVI fields exceed 32-bit RIFF limits: total "
                         "RIFF payload would pass 4 GiB")

    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_size * fps,          # dwMaxBytesPerSec (upper bound)
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(frames),             # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_size,                # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0)              # dwReserved[4]

    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIi4H",
        0,                       # dwFlags
        0, 0,                    # wPriority, wLanguage
        0,                       # dwInitialFrames
        1, fps,                  # dwScale / dwRate = frame period
        0,                       # dwStart
        len(frames),             # dwLength (in frames)
        max_size,                # dwSuggestedBufferSize
        0,                       # dwQuality (driver default)
        0,                       # dwSampleSize (0: one sample = one frame)
        0, 0, width, height))    # rcFrame

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                      # biSize
        width, height,
        1, 24,                   # biPlanes, biBitCount
        b"MJPG",                 # biCompression
        width * height * 3,      # biSizeImage (nominal)
        0, 0, 0, 0)              # pels/clr fields

    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_items = []
    idx_entries = []
    offset = 4                   # idx1 offsets are relative to 'movi'
    for f in frames:
        movi_items.append(_chunk(b"00dc", f))
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10,
                                       offset, len(f)))
        offset += len(movi_items[-1])
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for each chunk in
    [pos, end); raises ValueError on any truncation."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("RIFF chunk overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size % 2)   # skip the even-pad byte


def parse_avi(data: bytes) -> AviInfo:
    """AVI bytes -> AviInfo (dims, fps, per-frame JPEG payloads).

    Accepts the MJPEG single-video-stream family: frame chunks are the
    ``..dc``/``..db`` members of the movi list (a nested ``rec `` LIST
    is drained too — some muxers group frames). The idx1 index is not
    required (streaming-written files may lack it); frame ORDER is the
    movi order, which RIFF defines as presentation order.
    """
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("AVI payload is not bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    if 8 + riff_size > len(data):
        raise ValueError("truncated RIFF payload")

    width = height = None
    fps = 0.0
    usec = 0
    frames: list[bytes] = []

    def drain_movi(pos: int, stop: int, depth: int = 0) -> None:
        # real muxers nest 'rec ' LISTs at most one level; a crafted
        # stream of nested 12-byte LIST headers must hit ValueError,
        # not RecursionError (which would escape the ok=false contract)
        if depth > 8:
            raise ValueError("movi 'rec ' lists nested too deeply")
        for cc, body, size in _walk(data, pos, stop):
            if cc[2:4] in (b"dc", b"db"):
                frames.append(data[body:body + size])
            elif cc == b"LIST" and data[body:body + 4] == b"rec ":
                drain_movi(body + 4, body + size, depth + 1)

    for cc, body, size in _walk(data, 12, end):
        if cc != b"LIST":
            continue
        kind = data[body:body + 4]
        if kind == b"hdrl":
            for c2, b2, s2 in _walk(data, body + 4, body + size):
                if c2 == b"avih":
                    if s2 < 40:
                        raise ValueError("short avih header")
                    vals = struct.unpack("<10I", data[b2:b2 + 40])
                    usec = vals[0]
                    width, height = vals[8], vals[9]
        elif kind == b"movi":
            drain_movi(body + 4, body + size)

    if width is None:
        raise ValueError("AVI has no avih header")
    if not frames:
        raise ValueError("AVI has no frame chunks")
    if usec > 0:
        fps = 1_000_000 / usec
    return AviInfo(width, height, fps, frames)
