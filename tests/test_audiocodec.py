"""Unit + property tests for the dependency-free WAV codec
(functions/audiocodec.py) and its Spark feature operator."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_logs_parquet_converter_spark.functions.audiocodec import (
    decode_wav,
    encode_wav,
    wav_geometry,
)


def _frames(n_frames, n_ch, bits, seed=0):
    def s(t, ch):
        if bits == 8:
            return (91 * seed + 5 * t + 3 * ch) % 256
        return ((137 * seed + 31 * ch + 7 * t) % 4096) - 2048

    return [tuple(s(t, ch) for ch in range(n_ch)) for t in range(n_frames)]


@settings(max_examples=50, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    n_ch=st.integers(1, 4),
    bits=st.sampled_from([8, 16]),
    n=st.integers(0, 200),
    seed=st.integers(0, 100),
)
def test_wav_roundtrip(rate, n_ch, bits, n, seed):
    frames = _frames(n, n_ch, bits, seed)
    payload = encode_wav(rate, n_ch, bits, frames)
    assert wav_geometry(payload) == (rate, n_ch, bits, n)
    assert decode_wav(payload) == (rate, n_ch, bits, frames)


def test_extra_chunks_skipped():
    """LIST/fact metadata chunks (incl. odd-size + pad byte) must not
    desync the data chunk."""
    base = encode_wav(8000, 1, 16, _frames(5, 1, 16, 3))
    fmt_and_data = base[12:]
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(meta) + len(fmt_and_data)) + b"WAVE" + meta + fmt_and_data
    assert decode_wav(rebuilt) == decode_wav(base)


def test_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS\x00\x00")
    good = encode_wav(8000, 2, 16, _frames(10, 2, 16, 1))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-7])
    # non-PCM format tag
    bad = bytearray(good)
    bad[20] = 3  # IEEE float tag
    with pytest.raises(ValueError, match="PCM"):
        wav_geometry(bytes(bad))
    # 24-bit unsupported
    bad = bytearray(good)
    bad[34] = 24
    with pytest.raises(ValueError, match="8/16-bit"):
        wav_geometry(bytes(bad))


def test_audio_features_spark_roundtrip(spark, tmp_path):
    from aws_logs_parquet_converter_spark.operators.multimodal import (
        _audio_expected_rows,
        audio_feature_extract,
        write_audio_fixtures,
    )

    root = write_audio_fixtures(str(tmp_path))
    out = audio_feature_extract(spark.read.format("binaryFile").load(root))
    got = {r["name"]: r.asDict() for r in out.collect()}
    for row in _audio_expected_rows():
        name = row[0]
        r = got.pop(name)
        assert (
            r["sample_rate"], r["n_channels"], r["bits"], r["n_frames"],
            r["duration_us"], r["sum_ch0"], r["peak_ch0"], r["error"],
        ) == row[1:]
    assert not got
