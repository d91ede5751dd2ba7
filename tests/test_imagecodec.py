"""Unit + property tests for the dependency-free PPM/BMP codec
(functions/imagecodec.py) and its Spark decode operator."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_logs_parquet_converter_spark.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    sniff_format,
)


def _pixels(w, h, seed=0):
    return bytes((seed * 37 + 11 * k) % 256 for k in range(w * h * 3))


# ---------------------------------------------------------------------------
# Round-trip properties: decode(encode(x)) == x for every geometry
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 1000))
def test_ppm_roundtrip(w, h, seed):
    rgb = _pixels(w, h, seed)
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 1000))
def test_bmp_roundtrip(w, h, seed):
    # widths not divisible by 4 exercise the row-padding path
    rgb = _pixels(w, h, seed)
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    seed=st.integers(0, 100),
    fmt=st.sampled_from(["ppm", "bmp"]),
)
def test_dispatch_roundtrip(w, h, seed, fmt):
    rgb = _pixels(w, h, seed)
    payload = (encode_ppm if fmt == "ppm" else encode_bmp)(w, h, rgb)
    assert sniff_format(payload) == fmt
    assert decode_image(payload) == (fmt, w, h, rgb)


# ---------------------------------------------------------------------------
# Format quirks and malformed payloads
# ---------------------------------------------------------------------------


def test_ppm_header_comments_and_whitespace():
    rgb = _pixels(3, 2, 5)
    payload = b"P6 # a comment\n 3\t2 # another\n 255 " + rgb
    assert decode_ppm(payload) == (3, 2, rgb)


def test_ppm_rejects_truncation_and_bad_maxval():
    rgb = _pixels(4, 4, 1)
    good = encode_ppm(4, 4, rgb)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(good[:-5])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0\n")


def test_bmp_top_down_negative_height():
    """Negative biHeight = rows stored top-down; decoder must NOT flip."""
    import struct

    w, h = 3, 2
    rgb = _pixels(w, h, 9)
    bottom_up = encode_bmp(w, h, rgb)
    # rewrite the header to top-down and reorder+reswizzle the raster rows
    stride = (w * 3 + 3) & ~3
    raster = bottom_up[54:]
    rows = [raster[i * stride : (i + 1) * stride] for i in range(h)]
    top_down_raster = b"".join(reversed(rows))
    hdr = bytearray(bottom_up[:54])
    struct.pack_into("<i", hdr, 14 + 8, -h)
    assert decode_bmp(bytes(hdr) + top_down_raster) == (w, h, rgb)


def test_bmp_rejects_unsupported():
    rgb = _pixels(2, 2, 3)
    good = bytearray(encode_bmp(2, 2, rgb))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + bytes(good[2:]))
    bad_bpp = bytearray(good)
    bad_bpp[14 + 14] = 8  # biBitCount = 8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(good[:-3]))


def test_decode_image_unknown_magic():
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(b"\xde\xad\xbe\xef")


# ---------------------------------------------------------------------------
# Spark end-to-end: binaryFile scan -> Arrow-batched decode
# ---------------------------------------------------------------------------


def test_decode_stats_spark_roundtrip(spark, tmp_path):
    from aws_logs_parquet_converter_spark.operators.multimodal import (
        _expected_rows,
        decode_image_stats,
        write_image_fixtures,
    )

    root = write_image_fixtures(str(tmp_path))
    out = decode_image_stats(spark.read.format("binaryFile").load(root))
    got = {r["name"]: r.asDict() for r in out.collect()}
    for name, fmt, w, h, sr, sg, sb, digest, err in _expected_rows():
        row = got.pop(name)
        assert (row["fmt"], row["width"], row["height"]) == (fmt, w, h)
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == (sr, sg, sb)
        assert row["pixel_digest"] == digest
        assert row["error"] == err
    assert not got  # no surprise files
