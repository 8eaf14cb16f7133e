"""Audio modality: vendored WAV codec + fingerprint kernels.

Codec tests are pure Python (no Spark); the kernel tests drive the real
``mapInPandas`` decode path over the synthetic audio corpus the gate
rows use.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from solana_etl_spark.functions import wav
from solana_etl_spark.operators.audio import (
    AFP_FRAMES,
    _afp_from_samples,
    _clip_stats,
)


def test_roundtrip():
    samples = [0, 100, -200, 32767, -32768, 5]
    payload = wav.encode_pcm16(8000, samples)
    rate, out = wav.decode(payload)
    assert rate == 8000
    assert out.tolist() == samples


def test_chunk_walk_skips_unknown_chunks():
    samples = [1, -2, 3, -4]
    plain = wav.encode_pcm16(8000, samples)
    extra = wav.encode_pcm16(
        8000, samples, extra_chunks=((b"LIST", b"INFOISFTmeta\x00"),)
    )
    assert plain != extra  # byte-different payloads...
    assert wav.decode(plain)[1].tolist() == wav.decode(extra)[1].tolist()


def test_odd_sized_chunk_padding():
    # a 5-byte metadata chunk forces the word-alignment pad byte
    payload = wav.encode_pcm16(
        8000, [7, -7], extra_chunks=((b"note", b"abcde"),)
    )
    rate, out = wav.decode(payload)
    assert out.tolist() == [7, -7]


@pytest.mark.parametrize(
    "corrupt",
    [
        b"",
        b"RIFX" + b"\x00" * 40,  # bad signature
        b"RIFF" + struct.pack("<I", 4) + b"WAVX",  # not WAVE
        # declared RIFF size larger than the payload
        b"RIFF" + struct.pack("<I", 1000) + b"WAVE",
        # fmt missing
        b"RIFF"
        + struct.pack("<I", 12)
        + b"WAVE"
        + b"data"
        + struct.pack("<I", 0),
    ],
)
def test_corrupt_payloads_raise(corrupt):
    with pytest.raises(ValueError):
        wav.decode(corrupt)


def test_unsupported_formats_raise():
    samples = [1, 2, 3]
    payload = bytearray(wav.encode_pcm16(8000, samples))
    # patch channels to 2 in the fmt chunk (offset: RIFF(12) + 'fmt '(4)
    # + size(4) + tag(2) = 22)
    payload[22:24] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="unsupported format"):
        wav.decode(bytes(payload))


def test_bomb_guard():
    # declared data size far beyond the actual payload must be rejected
    # by the chunk-overrun check, not allocated
    header = wav.encode_pcm16(8000, [0])[:44]
    bad = bytearray(header)
    bad[40:44] = struct.pack("<I", 0x7FFFFFFF)
    with pytest.raises(ValueError):
        wav.decode(bytes(bad))


def test_sample_range_enforced_on_encode():
    with pytest.raises(ValueError, match="int16 range"):
        wav.encode_pcm16(8000, [40000])


def test_fingerprint_amplitude_invariance():
    rng = np.random.default_rng(7)
    x = (rng.normal(0, 3000, 2000) * np.linspace(0.2, 1.5, 2000)).astype(
        np.int64
    )
    assert _afp_from_samples(x) == _afp_from_samples(x * 2)
    assert _afp_from_samples(x) == _afp_from_samples(x * 10)


def test_fingerprint_short_clip_empty_frames():
    # shorter than AFP_FRAMES: empty frames compare as 0 vs 0 -> bit 0,
    # and the hash is still deterministic
    x = np.array([100, -300, 700, -200], dtype=np.int64)
    h = _afp_from_samples(x)
    assert h == _afp_from_samples(x)
    assert 0 <= h < (1 << (AFP_FRAMES - 1))


def test_clip_stats_exact():
    x = np.array([3, -4, 0, 5, -5], dtype=np.int64)
    rate, n, duration_us, peak, sum_sq, zc = _clip_stats(8000, x)
    assert (rate, n) == (8000, 5)
    assert duration_us == 5 * 1_000_000 // 8000
    assert peak == 5
    assert sum_sq == 9 + 16 + 0 + 25 + 25
    # strict sign products: (3,-4) (-4,0) (0,5) (5,-5) -> products
    # -12, 0, 0, -25 -> 2 crossings
    assert zc == 2


def test_decode_report_and_pairs_over_corpus(spark):
    from pyspark.sql import functions as F

    from solana_etl_spark.operators.audio import (
        audio_decode_report,
        audio_fingerprint_pairs,
        audio_fingerprints,
    )
    from solana_etl_spark.sources.synth import ensure_audio_table

    d = ensure_audio_table()
    tbl = spark.read.parquet(f"{d}/audio.parquet")
    media = tbl.select(F.col("clip_id").alias("media_id"), "payload")

    report = audio_decode_report(media).collect()
    truth = {
        r["clip_id"]: r for r in tbl.select("clip_id", "samples").collect()
    }
    assert len(report) == len(truth)
    for row in report[:50]:
        x = np.asarray(truth[row["media_id"]]["samples"], dtype=np.int64)
        assert row["n_samples"] == x.size
        assert row["peak_abs"] == (int(np.abs(x).max()) if x.size else 0)
        assert row["sum_sq"] == int((x * x).sum())

    fps = {
        r["media_id"]: r["afp"] for r in audio_fingerprints(media).collect()
    }
    # planted collisions: every 9th clip is an exact re-serve (extra LIST
    # chunk) and every 6th an amplitude-doubled copy — both must collide
    for cid in range(1, 400):
        if cid % 9 == 8 or cid % 6 == 5:
            assert fps[cid] == fps[cid - 1], cid

    pairs = audio_fingerprint_pairs(media, max_hamming=3)
    got = {(r["clip_a"], r["clip_b"]): r["hamming"] for r in pairs.collect()}
    # brute-force ground truth from the fingerprints
    ids = sorted(fps)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                expect[(a, b)] = h
    assert got == expect
    assert any(h == 0 for h in got.values())
