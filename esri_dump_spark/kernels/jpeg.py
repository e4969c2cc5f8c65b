"""Pure-NumPy baseline JPEG (JFIF) codec — real entropy-coded DCT
compression, not a simulation.

The container has no Pillow/libjpeg (SURVEY.md §7 phase 0), so the
engine ships its own ITU-T T.81 baseline sequential implementation:

  encoder: RGB -> JFIF YCbCr -> 8x8 forward DCT (orthonormal matrix
           form) -> quality-scaled Annex-K quantization -> zigzag ->
           DC-differential + AC run-length Huffman coding with the
           Annex-K standard tables -> SOI/APP0/DQT/SOF0/DHT/SOS/EOI
           marker stream with byte stuffing. 4:4:4 (no chroma
           subsampling) for maximum fidelity on the noise-heavy
           synthetic corpus.
  decoder: full baseline parser — multi-table DQT/DHT, SOF0 with
           arbitrary per-component sampling factors (4:4:4 / 4:2:2 /
           4:2:0), optional DRI/RSTn restart intervals, LUT-driven
           Huffman decode (16-bit lookahead), dequantize, inverse
           zigzag, IDCT, chroma upsample, YCbCr -> RGB, crop to the
           SOF dimensions.

All constants (zigzag order, quantization matrices, Huffman BITS/
HUFFVAL) are the public Annex-K tables of the JPEG standard; the
quality scaling is the standard IJG mapping. Verified by round-trip
PSNR tests and by decoder parsing of its own marker streams
(tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "DEFAULT_QUALITY"]

DEFAULT_QUALITY = 95

# ----------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex-K Huffman specifications: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: D = C @ X @ C.T, X = C.T @ D @ C
_k = np.arange(8)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) \
    * np.sqrt(2.0 / 8)
_DCT_C[0] /= np.sqrt(2.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Standard IJG quality scaling of the Annex-K matrices."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.float64), qc.astype(np.float64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-lookahead LUT: lookahead -> (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16) - 1
    ln = np.zeros(1 << 16, dtype=np.int8)
    for symbol, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = symbol
        ln[lo:hi] = length
    return sym, ln


# ------------------------------------------------------------ bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:       # byte stuffing
                self.out.append(0x00)
        # drop drained high bits — without this the Python bignum grows
        # by every bit ever written and encoding turns O(total_bits^2)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """Reads the de-stuffed entropy segment with 16-bit lookahead
    (virtually 1-padded past the end, per the spec)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0        # bit position

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte:byte + 4]
        acc = int.from_bytes(chunk.ljust(4, b"\xff"), "big")
        return (acc >> (16 - (self.pos & 7))) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _receive_extend(v: int, ssss: int) -> int:
    """JPEG EXTEND: map ssss magnitude bits to a signed value."""
    if ssss == 0:
        return 0
    if v < (1 << (ssss - 1)):
        return v - (1 << ssss) + 1
    return v


def _ssss(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ------------------------------------------------------------- encoder

def _fdct_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> quantized zigzag coeffs
    (n_blocks_y, n_blocks_x, 64) int32."""
    H, W = plane.shape
    b = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _DCT_C, b, _DCT_C)
    q = np.round(coef / qtab).astype(np.int32)
    return q.reshape(H // 8, W // 8, 64)[:, :, ZIGZAG]


def _encode_block(zz: np.ndarray, prev_dc: int, w: _BitWriter,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _ssss(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)

    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]     # ZRL
            w.write(code, ln)
            run -= 16
        s = _ssss(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]         # EOB
        w.write(code, ln)
    return dc


def encode_jpeg(pixels: np.ndarray, quality: int = DEFAULT_QUALITY,
                subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsampling``: '444' (no chroma subsampling — maximum fidelity,
    the default for the noise-heavy synthetic corpus) or '420' (2x2
    chroma downsample — the standard photographic trade, roughly
    halving the entropy bytes)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3, "RGB only"
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    cs = 2 if subsampling == "420" else 1     # chroma 1/cs resolution
    ql, qc = _quality_tables(quality)

    # JFIF YCbCr
    f = px.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
        + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
        - 0.081312 * f[:, :, 2] + 128.0

    # pad luma to the MCU grid (8*cs), chroma to 8 after downsample
    H = (h + 8 * cs - 1) // (8 * cs) * (8 * cs)
    W = (w + 8 * cs - 1) // (8 * cs) * (8 * cs)
    ypad = np.pad(y, ((0, H - h), (0, W - w)), mode="edge")
    planes = [_fdct_blocks(ypad - 128.0, ql)]
    for p in (cb, cr):
        pad = np.pad(p, ((0, H - h), (0, W - w)), mode="edge")
        if cs == 2:
            pad = pad.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        planes.append(_fdct_blocks(pad - 128.0, qc))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    prev = [0, 0, 0]
    tables = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    samp = [(cs, cs), (1, 1), (1, 1)]         # (h_i, v_i) per component
    for my in range(H // (8 * cs)):
        for mx in range(W // (8 * cs)):
            for ci in range(3):
                sh, sv = samp[ci]
                for vy in range(sv):
                    for vx in range(sh):
                        blk = planes[ci][my * sv + vy, mx * sh + vx]
                        prev[ci] = _encode_block(blk, prev[ci], bw,
                                                 *tables[ci])
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc: int, th: int, bits: list, vals: list) -> bytes:
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    ysamp = (cs << 4) | cs
    out = bytearray()
    out += b"\xff\xd8"                                    # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00"
               + struct.pack(">HHBB", 1, 1, 0, 0))        # APP0
    zl = ql.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    zc = qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xFFDB, b"\x00" + zl)                      # DQT 0
    out += seg(0xFFDB, b"\x01" + zc)                      # DQT 1
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, ysamp, 0, 2, 0x11, 1, 3, 0x11, 1]))  # SOF0
    out += seg(0xFFC4, dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += seg(0xFFC4, dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    out += seg(0xFFC4, dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
    out += seg(0xFFC4, dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    out += seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11])
               + bytes([0, 63, 0]))                       # SOS
    out += entropy
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder

def _destuff(data: bytes) -> tuple[bytes, list[int]]:
    """Remove 0xFF00 stuffing; record RSTn positions as byte offsets in
    the de-stuffed stream."""
    out = bytearray()
    rst_at = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:       # RSTn
                rst_at.append(len(out))
                i += 2
                continue
            break                          # EOI / next marker
        out.append(b)
        i += 1
    return bytes(out), rst_at


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB.

    Malformed streams raise ``ValueError`` (or ``NotImplementedError``
    for valid-but-unsupported modes) — never KeyError / ZeroDivision /
    struct.error — so ``decode_stats``'s error contract
    (operators/multimodal.py) can land corrupt rows as ``ok=false``
    instead of killing the Spark task. Every field read from the
    stream is validated at parse time (segment lengths, SOF sampling
    factors in [1,4], SOS component ids declared in SOF, DQT/DHT table
    ids defined before use)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_comps = None
    entropy_start = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (dangling marker byte)")
        marker = data[pos + 1]
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
            # marker code — consume one fill byte, not a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (segment length cut off)")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if seglen < 2:
            raise ValueError("invalid segment length")
        payload = data[pos + 2:pos + seglen]
        nxt = pos + seglen
        if marker == 0xDB:                  # DQT (may hold several)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT segment")
                tab = np.frombuffer(payload[p + 1:p + 65],
                                    dtype=np.uint8).astype(np.float64)
                qtabs[tq] = tab[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:                # DHT (may hold several)
            p = 0
            while p < len(payload):
                if p + 17 > len(payload):
                    raise ValueError("truncated DHT segment")
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(payload):
                    raise ValueError("truncated DHT segment")
                vals = list(payload[p + 17:p + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline)
            if len(payload) < 6:
                raise ValueError("truncated SOF segment")
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            if h == 0 or w == 0 or nc == 0:
                raise ValueError("SOF declares zero dimension/components")
            if len(payload) < 6 + 3 * nc:
                raise ValueError("truncated SOF component list")
            comps = []
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci:9 + 3 * ci]
                hs, vs = samp >> 4, samp & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(
                        f"invalid SOF sampling factor {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG")
        elif marker == 0xDD:                # DRI
            if len(payload) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:                # SOS
            if len(payload) < 1:
                raise ValueError("truncated SOS segment")
            ns = payload[0]
            if ns == 0 or len(payload) < 1 + 2 * ns:
                raise ValueError("truncated SOS component list")
            scan_comps = []
            for ci in range(ns):
                cid, tt = payload[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append({"id": cid, "dc": tt >> 4,
                                   "ac": tt & 0xF})
            entropy_start = nxt
            break
        pos = nxt

    if comps is None or scan_comps is None or entropy_start is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    stream, _ = _destuff(data[entropy_start:])
    br = _BitReader(stream)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("non-dividing sampling grid")
        if c["tq"] not in qtabs:
            raise ValueError(
                f"component references undefined DQT {c['tq']}")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        c = by_id.get(sc["id"])
        if c is None:
            raise ValueError(
                f"SOS references undeclared component {sc['id']}")
        if (0, sc["dc"]) not in huff or (1, sc["ac"]) not in huff:
            raise ValueError("SOS references undefined DHT")
        c["dc_lut"] = huff[(0, sc["dc"])]
        c["ac_lut"] = huff[(1, sc["ac"])]
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                              dtype=np.float64)
        c["pred"] = 0
    if any("dc_lut" not in c for c in comps):
        raise ValueError("SOS does not cover every SOF component")

    def decode_huff(lut) -> int:
        sym_t, len_t = lut
        look = br.peek16()
        s = int(sym_t[look])
        if s < 0:
            raise ValueError("invalid Huffman code")
        br.skip(int(len_t[look]))
        return s

    zz = np.zeros(64, dtype=np.float64)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                # RST boundary: byte-align and reset DC predictions
                br.pos = (br.pos + 7) & ~7
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz[:] = 0.0
                        s = decode_huff(c["dc_lut"])
                        if s > 11:    # T.81: DC SSSS <= 11 for 8-bit
                            raise ValueError("invalid DC magnitude")
                        diff = _receive_extend(br.read_bits(s), s)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = decode_huff(c["ac_lut"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:   # ZRL
                                    k += 16
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _receive_extend(br.read_bits(s), s)
                            k += 1
                        block = (zz[UNZIGZAG].reshape(8, 8)
                                 * qtabs[c["tq"]])
                        spat = _DCT_C.T @ block @ _DCT_C + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = spat

    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = c["plane"]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
