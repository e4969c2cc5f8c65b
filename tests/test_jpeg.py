"""Baseline JPEG codec tests (kernels/jpeg.py): marker structure,
quality behavior, round-trip fidelity, error paths."""

from __future__ import annotations

import numpy as np
import pytest

from esri_dump_spark.kernels.jpeg import decode_jpeg, encode_jpeg
from esri_dump_spark.kernels.image import psnr


def _gradient(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)


def test_marker_structure():
    data = encode_jpeg(_gradient(16, 24), 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in data, f"missing segment {marker.hex()}"
    # SOF0 carries the true (unpadded) dimensions
    i = data.index(b"\xff\xc0")
    h = int.from_bytes(data[i + 5:i + 7], "big")
    w = int.from_bytes(data[i + 7:i + 9], "big")
    assert (h, w) == (16, 24)


def test_quality_tradeoff_monotonic():
    img = _gradient(32, 32)
    sizes, psnrs = [], []
    for q in (50, 75, 90, 98):
        b = encode_jpeg(img, q)
        sizes.append(len(b))
        psnrs.append(psnr(img, decode_jpeg(b)))
    assert sizes == sorted(sizes), sizes
    assert psnrs == sorted(psnrs), psnrs
    assert psnrs[-1] >= 45.0


def test_roundtrip_odd_dimensions_cropped():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 98))
    assert out.shape == (17, 23, 3)
    assert psnr(img, out) >= 40.0


def test_noise_content_clears_psnr_gate_at_default_quality():
    """The synthetic corpus is noise-heavy — JPEG's worst case; the
    default quality must keep even pure noise above the 40 dB gate."""
    from esri_dump_spark.kernels.image import encode_image, decode_image
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    out = decode_image(encode_image(img, "jpeg"), "jpeg")
    p = psnr(img, out)
    assert p >= 40.0, p
    assert not np.array_equal(img, out)  # genuinely lossy


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    data = bytearray(encode_jpeg(_gradient(8, 8), 90))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_420_subsampling_roundtrip():
    """4:2:0 encode exercises the decoder's MCU-interleave + chroma
    upsample path; luma fidelity stays high, bytes shrink."""
    img = _gradient(48, 40)
    b444 = encode_jpeg(img, 92, subsampling="444")
    b420 = encode_jpeg(img, 92, subsampling="420")
    assert len(b420) < len(b444)
    out = decode_jpeg(b420)
    assert out.shape == img.shape
    # chroma is halved, so compare via luma PSNR
    def luma(a):
        f = a.astype(np.float64)
        return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    assert psnr(luma(img), luma(out)) >= 40.0
    # SOF records 2x2 luma sampling
    i = b420.index(b"\xff\xc0")
    assert b420[i + 11] == 0x22


def test_420_odd_dimensions():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95, subsampling="420"))
    assert out.shape == (19, 21, 3)


def test_jpeg_roundtrip_property():
    """Hypothesis sweep: arbitrary sizes and content always decode to
    the exact input shape and clear the PSNR gate at default quality."""
    from hypothesis import given, settings, strategies as st
    from esri_dump_spark.kernels.image import JPEG_QUALITY

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2 ** 31),
           st.sampled_from(["444", "420"]))
    def check(h, w, seed, sub):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, JPEG_QUALITY, subsampling=sub))
        assert out.shape == (h, w, 3)
        if sub == "444":
            assert psnr(img, out) >= 40.0

    check()


def test_decoder_rejects_truncated_marker_streams():
    """Streams cut mid-marker (last byte 0xFF) or mid-segment must
    raise ValueError, not IndexError — regression for the dangling
    marker-byte read past end-of-buffer that the derandomized fuzz
    corpus never generated."""
    for blob in (b"\xff\xd8\xff", b"\xff\xd8\xff\xdb\x00",
                 b"\xff\xd8\xff\xc0", b"\xff\xd8" + b"\x00" * 5 + b"\xff"):
        try:
            decode_jpeg(blob)
            raise AssertionError(f"decoded garbage: {blob!r}")
        except (ValueError, NotImplementedError):
            pass


def test_decoder_rejects_garbage_without_hanging():
    """Random bytes and truncated/bit-flipped streams must raise (or
    decode) promptly — and ONLY with the ValueError family that
    decode_stats' error contract (operators/multimodal.py) catches;
    a KeyError/ZeroDivisionError would kill the Spark task."""
    from hypothesis import given, settings, strategies as st
    good = encode_jpeg(_gradient(16, 16), 90)

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def check(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            blob = data.draw(st.binary(min_size=0, max_size=200))
        elif mode == 1:
            cut = data.draw(st.integers(0, len(good)))
            blob = good[:cut]
        else:
            pos = data.draw(st.integers(2, len(good) - 1))
            bit = data.draw(st.integers(0, 7))
            b = bytearray(good)
            b[pos] ^= 1 << bit
            blob = bytes(b)
        try:
            out = decode_jpeg(blob)
            assert out.ndim == 3 and out.shape[2] == 3
        except (ValueError, NotImplementedError):
            pass

    check()


def _mutate(data: bytes, offset_from_marker: bytes, delta: int,
            value: int) -> bytes:
    b = bytearray(data)
    i = b.index(offset_from_marker)
    b[i + delta] = value
    return bytes(b)


def test_zero_sampling_factor_raises_valueerror():
    """Round-2 falsifying example: bit-flipped SOF sampling factor of
    0 reached `vmax // c['v']` as ZeroDivisionError."""
    good = encode_jpeg(_gradient(16, 16), 90)
    # SOF0 layout: FFC0 len(2) prec h(2) w(2) nc [id samp tq]*nc
    bad = _mutate(good, b"\xff\xc0", 11, 0x10)   # comp1 v=0
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    bad = _mutate(good, b"\xff\xc0", 11, 0x01)   # comp1 h=0
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    bad = _mutate(good, b"\xff\xc0", 11, 0x55)   # h=v=5 > 4
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_undeclared_sos_component_raises_valueerror():
    """Round-2 falsifying example: SOS referencing a component id not
    declared in SOF reached `by_id[...]` as KeyError."""
    good = encode_jpeg(_gradient(16, 16), 90)
    # SOS layout: FFDA len(2) ns [id tt]*ns ...
    bad = _mutate(good, b"\xff\xda", 5, 9)       # scan comp1 id -> 9
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_undefined_dqt_dht_raise_valueerror():
    good = encode_jpeg(_gradient(16, 16), 90)
    bad = _mutate(good, b"\xff\xc0", 12, 7)      # comp1 tq -> 7 (undefined)
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    bad = _mutate(good, b"\xff\xda", 6, 0x77)    # scan comp1 dc/ac -> 7/7
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_solid_color_compresses_tightly():
    img = np.full((64, 64, 3), 123, dtype=np.uint8)
    b = encode_jpeg(img, 90)
    assert len(b) < 2000  # DC-only blocks: tiny entropy segment
    out = decode_jpeg(b)
    assert psnr(img, out) >= 50.0


def test_fill_bytes_before_marker_are_consumed():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code; the scanner must treat them as padding, not as a
    marker with a bogus length."""
    from esri_dump_spark.kernels.jpeg import encode_jpeg, decode_jpeg
    rng = np.random.default_rng(5)
    px = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(px)
    # inject one fill byte before the first DQT marker (FF DB)
    i = data.index(b"\xff\xdb")
    padded = data[:i] + b"\xff" + data[i:]
    a = decode_jpeg(data)
    b = decode_jpeg(padded)
    assert np.array_equal(a, b)
