"""PCM-WAV kernel + audio_stats operator.

The audio leg of the multimodal surface: round-trip, first-principles
signal pins (a bin-aligned pure tone has rms = amp/sqrt(2), exactly
2f zero crossings per second and spectral centroid = f), the corrupt-
row contract, a hypothesis fuzz, and the map-only plan invariant."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, strategies as st

from esri_dump_spark.kernels.wav import encode_wav, parse_wav
from esri_dump_spark.sources.fixtures import (audios_pdf, audio_samples,
                                              ensure_audios_parquet)


def test_wav_roundtrip_bit_identical():
    rng = np.random.default_rng(3)
    mono = rng.integers(-30000, 30000, 5000).astype(np.int16)
    stereo = rng.integers(-30000, 30000, (4000, 2)).astype(np.int16)
    for s, ch in ((mono, 1), (stereo, 2)):
        info = parse_wav(encode_wav(s, 16000))
        assert info.rate == 16000 and info.channels == ch
        assert np.array_equal(info.samples.reshape(s.shape), s)


def test_wav_writer_validates_inputs():
    with pytest.raises(ValueError):
        encode_wav(np.zeros(5, dtype=np.float64), 8000)   # wrong dtype
    with pytest.raises(ValueError):
        encode_wav(np.zeros(0, dtype=np.int16), 8000)     # empty
    with pytest.raises(ValueError):
        encode_wav(np.zeros(5, dtype=np.int16), 0)        # bad rate


@pytest.mark.parametrize("mutate", [
    lambda w: b"",
    lambda w: w[:11],
    lambda w: b"RIFF" + w[4:8] + b"AVI " + w[12:],      # wrong form
    lambda w: w[:-5],                                    # truncated
    lambda w: None,                                      # NULL cell
    lambda w: w[:16] + b"\xff\xff\xff\xff" + w[20:],     # overrun
])
def test_wav_corrupt_raises_valueerror_only(mutate):
    w = encode_wav(np.ones(100, dtype=np.int16), 8000)
    with pytest.raises((ValueError, TypeError)):
        parse_wav(mutate(w))


def test_wav_non_pcm_raises_not_implemented():
    w = bytearray(encode_wav(np.ones(100, dtype=np.int16), 8000))
    # fmt chunk starts at offset 20; format tag is its first uint16
    w[20:22] = (3).to_bytes(2, "little")     # IEEE float tag
    with pytest.raises(NotImplementedError):
        parse_wav(bytes(w))


@given(st.data())
def test_wav_fuzz_mutations_never_escape(data):
    w = bytearray(encode_wav(np.ones(64, dtype=np.int16), 8000))
    for _ in range(data.draw(st.integers(1, 8))):
        w[data.draw(st.integers(0, len(w) - 1))] = data.draw(
            st.integers(0, 255))
    if data.draw(st.booleans()):
        w = w[:data.draw(st.integers(0, len(w)))]
    try:
        info = parse_wav(bytes(w))
        assert info.n_frames >= 1
    except (ValueError, NotImplementedError):
        pass


def test_pure_tone_first_principles_pins():
    """Bin-aligned tone: rms = amp/sqrt(2), zcr = 2f/s, centroid = f —
    checked against the operator's own math run outside Spark."""
    from esri_dump_spark.kernels.wav import parse_wav as pw
    for i in (0, 3, 6, 9):                   # the pure-tone clips
        samples, sr, f = audio_samples(i)
        assert f is not None
        info = pw(encode_wav(samples, sr))
        x = info.samples[:, 0].astype(np.float64) / 32768.0
        n = x.size
        rms = math.sqrt(float(np.mean(x * x)))
        assert abs(rms - (12000.0 / 32768.0) / math.sqrt(2)) < 1e-3
        sgn = np.sign(x)
        sgn = sgn[sgn != 0.0]
        crossings = int(np.count_nonzero(sgn[:-1] != sgn[1:]))
        assert abs(crossings / (n / sr) - 2.0 * f) <= 2.0 * sr / n
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / sr)
        centroid = float((freqs * mag).sum() / mag.sum())
        # bin-aligned tone is a single spike; the residual few-Hz
        # drift is int16 quantization noise spread across the
        # magnitude spectrum (sums linearly in |X|, not power)
        assert abs(centroid - f) < 5.0


def test_audio_stats_operator(spark):
    from esri_dump_spark.operators.multimodal import audio_stats
    pdf = audios_pdf(12)
    bad = pd.DataFrame({"audio_id": ["bad0"], "bytes": [b"nope"],
                        "sr": np.int32(0), "n_frames": np.int32(0),
                        "channels": np.int32(0), "fmt": "wav"})
    rows = audio_stats(spark.createDataFrame(
        pd.concat([pdf, bad], ignore_index=True))).collect()
    by_id = {r.audio_id: r for r in rows}
    assert len(by_id) == 13
    assert not by_id["bad0"].ok and by_id["bad0"].error
    for i in range(12):
        r = by_id[f"aud{i:012d}"]
        samples, sr, f = audio_samples(i)
        assert r.ok and r.sr == sr and r.n_frames == len(samples)
        assert abs(r.duration_s - len(samples) / sr) < 1e-12
        if f is not None:                    # pure tone: exact physics
            assert abs(r.centroid_hz - f) < 5.0
            assert abs(r.zcr_hz - 2.0 * f) <= 2.0 * sr / len(samples)
            assert abs(r.rms - (12000.0 / 32768.0) / math.sqrt(2)) < 1e-3
        else:                                # tone+noise: brighter
            assert r.centroid_hz > 100.0 and 0.0 < r.rms < 1.0


def test_audio_fingerprints_deterministic_and_aligned():
    """Byte-identical audio prefixes fingerprint byte-identically
    (hop = window), and the fingerprint is a pure function of the
    samples — computed twice it matches."""
    from esri_dump_spark.sources.fixtures import near_dup_audios_pdf
    from esri_dump_spark.kernels.wav import parse_wav
    import numpy as np
    from esri_dump_spark.operators.multimodal import (AUDIO_FP_BANDS,
                                                      AUDIO_FP_WINDOW)
    pdf = near_dup_audios_pdf(4)
    nbins = AUDIO_FP_WINDOW // 2 + 1
    edges = np.unique(np.round(np.power(
        np.linspace(1.0, nbins ** (1.0 / 2.2), AUDIO_FP_BANDS + 1),
        2.2)).astype(int))

    def fps(wav_bytes):
        x = parse_wav(wav_bytes).samples[:, 0].astype(np.float64)
        nwin = x.size // AUDIO_FP_WINDOW
        fr = x[:nwin * AUDIO_FP_WINDOW].reshape(nwin, AUDIO_FP_WINDOW)
        mag = np.abs(np.fft.rfft(fr, axis=1))
        e = np.add.reduceat(mag * mag, edges[:-1], axis=1)
        bits = (e[:, :-1] > e[:, 1:])
        w = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return (bits.astype(np.int64) * w).sum(axis=1).tolist()

    f0, f1 = fps(pdf["bytes"][0]), fps(pdf["bytes"][1])
    # pair 0 shares exactly its first 2 windows
    assert f0[:2] == f1[:2]
    assert f0[2] != f1[2]
    assert fps(pdf["bytes"][0]) == f0      # deterministic


def test_audio_near_dup_exact_ground_truth(spark):
    """Planted duplicates: pair k shares exactly 2 + (k % 3) window
    fingerprints — the operator recovers exactly those pairs with
    exactly those counts."""
    from esri_dump_spark.operators.multimodal import audio_near_dup
    from esri_dump_spark.sources.fixtures import near_dup_audios_pdf
    auds = spark.createDataFrame(near_dup_audios_pdf(20))  # 10 pairs
    got = {(r.audio_a, r.audio_b): r.n_shared_windows
           for r in audio_near_dup(auds, min_shared=3,
                                   max_df=None).collect()}
    exp = {(f"aud{2 * k:012d}", f"aud{2 * k + 1:012d}"): 2 + (k % 3)
           for k in range(10) if 2 + (k % 3) >= 3}
    assert got == exp
    assert audio_near_dup(auds, min_shared=2, max_df=None).count() == 10
    # every shared fingerprint appears in exactly 2 clips -> max_df=1
    # drops them all
    assert audio_near_dup(auds, min_shared=1, max_df=1).count() == 0


def test_audio_near_dup_bytes_never_shuffle(spark):
    from esri_dump_spark.operators.multimodal import audio_near_dup
    from esri_dump_spark.sources.fixtures import (
        ensure_near_dup_audios_parquet)
    import re
    df = audio_near_dup(spark.read.parquet(
        ensure_near_dup_audios_parquet(40)), min_shared=2)
    assert df.count() == 20
    formatted = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    sections = re.split(r"\n\(\d+\) ", "\n" + formatted)
    exchanges = [s for s in sections if s.startswith("Exchange")]
    assert exchanges
    for s in exchanges:
        assert "bytes" not in s, s


def test_audio_cluster_dedup_exact_survivors(spark):
    """Disjoint 2-cliques over (2k, 2k+1) -> min-id survivors are
    exactly the even-suffix clips, at any input layout."""
    from esri_dump_spark.operators.multimodal import audio_cluster_dedup
    from esri_dump_spark.sources.fixtures import (
        ensure_near_dup_audios_parquet)
    auds = spark.read.parquet(ensure_near_dup_audios_parquet(40))
    out = audio_cluster_dedup(auds, min_shared=2)
    got = sorted(r.audio_id for r in out.select("audio_id").collect())
    assert got == [f"aud{2 * k:012d}" for k in range(20)]
    got13 = sorted(r.audio_id for r in audio_cluster_dedup(
        auds.repartition(13), min_shared=2)
        .select("audio_id").collect())
    assert got13 == got


def test_audio_stats_plan_is_map_only(spark):
    from esri_dump_spark.operators.multimodal import audio_stats
    df = audio_stats(spark.read.parquet(ensure_audios_parquet(24)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert plan.count("MapInPandas") == 1
