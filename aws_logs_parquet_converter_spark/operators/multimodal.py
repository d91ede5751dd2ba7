"""Multimodal-column operators: opaque binary payloads + typed metadata.

Real pipelines carry images/audio/video as ``binary`` columns beside typed
metadata and run decode / feature-extraction / frame-sampling as Arrow-batched
Python over ``mapInPandas``. The DECODE step is real for uncompressed image
formats — ``decode_image`` dispatches to the dependency-free PPM/BMP codec in
:mod:`..functions.imagecodec`, exercised end-to-end by ``mm_decode_stats``
(encode -> files -> binaryFile scan -> Arrow-batched decode -> stats, with
malformed payloads landing as dead-letter rows). Compressed codecs (JPEG/PNG)
would slot into the same extractor but need an external library.

Elsewhere the ``documents.text`` bytes stand in for encoded media payloads.

Scale: mapInPandas streams Arrow record batches through one Python worker per
core; payload bytes never transit the driver, and the extractor is
embarrassingly parallel. Frame sampling is a generate-style explode
(one row per sampled frame) — native expressions, no Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..catalog import load_table
from . import register

FRAME_SIZE = 100  # stand-in "frame" = 100-byte window of the payload
MAX_FRAMES = 5


def decode_image(payload: bytes) -> tuple[str, int, int, bytes]:
    """Decode an encoded image payload: (format, width, height, RGB bytes).

    Real, dependency-free decode for the uncompressed formats (PPM P6 and
    24-bit BMP — :mod:`..functions.imagecodec`); compressed formats (JPEG/
    PNG) still require an external codec and raise ValueError, which the
    Spark-side extractor maps to a dead-letter row.
    """
    from ..functions.imagecodec import decode_image as _decode

    return _decode(payload)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque payload column + typed metadata struct."""
    payload = F.col(text_col).cast("binary")
    meta = F.struct(
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
    )
    return docs.withColumn("payload", payload).withColumn("media_meta", meta)


def binary_feature_extract(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Deterministic fake features (byte length + md5 digest) in place of a real
    decoder — swap `_extract` internals for codec calls in production.
    """

    schema = "doc_id bigint, byte_len int, digest string"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int32"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(_extract, schema)


@register(
    "mm_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           md5(text) AS digest
    FROM documents
    """,
    doc="Binary-column feature extraction via Arrow mapInPandas (len + digest).",
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return binary_feature_extract(with_binary_payload(docs))


@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(frame_id AS INTEGER) AS frame_id,
           CAST(frame_id * {FRAME_SIZE} AS BIGINT) AS byte_offset,
           md5(substr(text, frame_id * {FRAME_SIZE} + 1, {FRAME_SIZE})) AS frame_digest
    FROM (
      SELECT doc_id, text,
             unnest(range(0, least({MAX_FRAMES}, CAST(floor(octet_length(encode(text)) / {FRAME_SIZE}.0) AS BIGINT)))) AS frame_id
      FROM documents
    )
    """,
    doc="Frame sampling: one row per fixed-stride payload window, with digest.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.least(
        F.lit(MAX_FRAMES),
        F.floor(F.octet_length("text") / F.lit(float(FRAME_SIZE))).cast("bigint"),
    )
    # sequence(0, -1) would generate a DESCENDING range for empty payloads;
    # guard with an empty array so zero-frame docs emit zero rows.
    frame_ids = F.when(n_frames > 0, F.sequence(F.lit(0).cast("bigint"), n_frames - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    frames = docs.select("doc_id", "text", F.explode(frame_ids).alias("frame_id"))
    return frames.select(
        "doc_id",
        F.col("frame_id").cast("int").alias("frame_id"),
        (F.col("frame_id") * FRAME_SIZE).cast("bigint").alias("byte_offset"),
        F.md5(
            F.substring(F.col("text"), F.col("frame_id") * FRAME_SIZE + 1, FRAME_SIZE).cast(
                "binary"
            )
        ).alias("frame_digest"),
    )


# ---------------------------------------------------------------------------
# Vectorized scalar pandas UDF (the Arrow-batched UDF surface)
# ---------------------------------------------------------------------------


# DataType instance (not a DDL string): string return types need an active
# SparkContext to parse, which doesn't exist at import time.
@F.pandas_udf(DoubleType())
def _rational_score(value: pd.Series) -> pd.Series:
    """(v^2 + 3v) / 7 — rational arithmetic only, so the result is
    bit-identical in any IEEE-754 engine regardless of vectorization."""
    return (value * value + 3.0 * value) / 7.0


@register(
    "q_pandas_udf_score",
    oracle="""
    SELECT event_id, ((value * value + 3.0 * value) / 7.0) AS score
    FROM events WHERE value IS NOT NULL
    """,
    doc="Vectorized scalar pandas UDF (Arrow batches): per-event rational "
    "polynomial score. Demonstrates the Python-UDF escape hatch at its "
    "cheapest — still 10-100x slower than the equivalent native expression, "
    "which is the production recommendation for anything expressible in SQL.",
)
def q_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.select("event_id", _rational_score(F.col("value")).alias("score"))


THUMB_BYTES = 64  # stand-in "resize": thumbnail = first 64 payload bytes


def resize_payloads(docs_with_payload: DataFrame, max_bytes: int = THUMB_BYTES) -> DataFrame:
    """Arrow-batched payload "resize" over mapInPandas.

    Deterministic stub for the codec step (a real pipeline would decode,
    rescale pixels, re-encode): the thumbnail is the payload truncated to
    ``max_bytes``, with regenerated metadata. The Spark-side contract —
    binary in, smaller binary + typed metadata struct out, streamed per
    Arrow batch with payloads never touching the driver — is exactly the
    production shape.
    """

    schema = "doc_id bigint, thumb_len int, thumb_digest string, original_len int"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            thumbs = payloads.map(lambda b: bytes(b)[:max_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb_len": thumbs.map(len).astype("int32"),
                    "thumb_digest": thumbs.map(lambda b: hashlib.md5(b).hexdigest()),
                    "original_len": payloads.map(len).astype("int32"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(_resize, schema)


@register(
    "mm_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(least(octet_length(encode(text)), {THUMB_BYTES}) AS INTEGER) AS thumb_len,
           md5(substr(text, 1, {THUMB_BYTES})) AS thumb_digest,
           CAST(octet_length(encode(text)) AS INTEGER) AS original_len
    FROM documents
    """,
    doc="Payload resize/thumbnail via Arrow mapInPandas (decode-rescale-"
    "reencode stubbed as deterministic truncation; Spark-side plumbing real).",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_payloads(with_binary_payload(docs))


def binary_feature_extract_arrow(docs_with_payload: DataFrame) -> DataFrame:
    """mapInArrow twin of :func:`binary_feature_extract`: the batches arrive
    as ``pyarrow.RecordBatch`` (no pandas materialization), which skips the
    Arrow->pandas conversion entirely — the right variant when the Python
    step only slices/hashes bytes and never needs pandas semantics. Same
    schema contract and per-core parallelism as the mapInPandas path."""
    import pyarrow as pa

    def _extract(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("doc_id")
            payloads = batch.column("payload")
            digests = [
                hashlib.md5(p.as_py()).hexdigest() if p.is_valid else None
                for p in payloads
            ]
            lens = [len(p.as_py()) if p.is_valid else None for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(lens, pa.int32()), pa.array(digests, pa.string())],
                names=["doc_id", "byte_len", "digest"],
            )

    return docs_with_payload.select("doc_id", "payload").mapInArrow(
        _extract, schema="doc_id bigint, byte_len int, digest string"
    )


@register(
    "mm_binary_features_arrow",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
           md5(text) AS digest
    FROM documents
    """,
    doc=(
        "mapInArrow feature extraction over binary payloads — identical "
        "contract to mm_binary_features (mapInPandas) but batches stay "
        "pyarrow.RecordBatch end-to-end: no Arrow->pandas conversion tax "
        "for byte-slicing/hashing workloads. Completes the Arrow API "
        "family: pandas_udf, pandas UDAF, mapInPandas, cogrouped "
        "applyInPandas, applyInPandasWithState, UDTF, mapInArrow."
    ),
)
def mm_binary_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return binary_feature_extract_arrow(with_binary_payload(docs))


# ---------------------------------------------------------------------------
# Real image decode over the binaryFile source (PPM/BMP, dependency-free)
# ---------------------------------------------------------------------------

# Deterministic fixture corpus: pixel k of image i is (37*i + 11*k) % 256 —
# pure arithmetic, so the ORACLE can state the expected decode results as a
# VALUES table computed at import time WITHOUT running the codec, while the
# Spark side must survive the full encode -> file -> binaryFile scan ->
# Arrow-batched decode roundtrip to match it. One deliberately corrupt
# payload exercises the dead-letter branch.
N_IMAGES = 12


def _fixture_pixels(i: int, w: int, h: int) -> bytes:
    return bytes((37 * i + 11 * k) % 256 for k in range(w * h * 3))


def _fixture_specs() -> list[tuple[str, str, int, int]]:
    out = []
    for i in range(N_IMAGES):
        fmt = "bmp" if i % 2 else "ppm"
        w = 5 + (i * 3) % 9
        h = 4 + (i * 5) % 7
        out.append((f"img_{i:03d}.{fmt}", fmt, w, h))
    return out


def _expected_rows() -> list[tuple]:
    rows = []
    for i, (name, fmt, w, h) in enumerate(_fixture_specs()):
        rgb = _fixture_pixels(i, w, h)
        rows.append(
            (
                name,
                fmt,
                w,
                h,
                sum(rgb[0::3]),
                sum(rgb[1::3]),
                sum(rgb[2::3]),
                hashlib.md5(rgb).hexdigest(),
                None,
            )
        )
    rows.append(("bad_000.img", None, None, None, None, None, None, None,
                 "unsupported image payload (magic b'\\xde\\xad')"))
    return rows


def _decode_values_cte() -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, int):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    return ",\n      ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in _expected_rows()
    )


def write_image_fixtures(root: str) -> str:
    """Materialize the fixture corpus as real .ppm/.bmp files; returns root."""
    import os

    from ..functions.imagecodec import encode_bmp, encode_ppm

    for i, (name, fmt, w, h) in enumerate(_fixture_specs()):
        rgb = _fixture_pixels(i, w, h)
        payload = encode_bmp(w, h, rgb) if fmt == "bmp" else encode_ppm(w, h, rgb)
        with open(os.path.join(root, name), "wb") as fh:
            fh.write(payload)
    with open(os.path.join(root, "bad_000.img"), "wb") as fh:
        fh.write(b"\xde\xad\xbe\xef not an image")
    return root


def decode_image_stats(images: DataFrame) -> DataFrame:
    """Arrow-batched real decode over a binaryFile scan.

    Input: the binaryFile source schema (path, modificationTime, length,
    content). Output: one row per file with decoded geometry, exact per-
    channel pixel sums, and an md5 of the canonical RGB raster; payloads the
    codec rejects become dead-letter rows (error populated, data columns
    NULL) — the same queryable-bad-data contract as the log parser (O7).

    Scale: decode runs inside mapInPandas workers, one Arrow batch at a
    time; file bytes stream executor-side (binaryFile source), never through
    the driver. Per-channel sums use numpy strided views — no Python
    per-pixel loop.
    """
    import os

    import numpy as np

    schema = (
        "name string, fmt string, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, "
        "pixel_digest string, error string"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import decode_image as _dec

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                try:
                    fmt, w, h, rgb = _dec(bytes(content))
                    px = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                    rows.append(
                        (name, fmt, w, h,
                         int(px[0::3].sum()), int(px[1::3].sum()), int(px[2::3].sum()),
                         hashlib.md5(rgb).hexdigest(), None)
                    )
                except ValueError as e:
                    rows.append((name, None, None, None, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["name", "fmt", "width", "height", "sum_r", "sum_g",
                         "sum_b", "pixel_digest", "error"],
            )

    return images.select("path", "content").mapInPandas(_decode, schema)


@register(
    "mm_decode_stats",
    oracle=f"""
    SELECT * FROM (VALUES
      {_decode_values_cte()})
      AS t(name, fmt, width, height, sum_r, sum_g, sum_b, pixel_digest, error)
    """,
    doc="REAL image decode end-to-end: deterministic PPM/BMP fixtures are "
    "encoded to files, scanned with the binaryFile source, and decoded "
    "executor-side by the dependency-free codec (functions/imagecodec.py) "
    "inside Arrow-batched mapInPandas; a corrupt payload lands as a "
    "dead-letter row. The oracle states the expected geometry, exact "
    "per-channel pixel sums, and raster md5 from the pixel formula alone — "
    "the encode->scan->decode roundtrip must reproduce them byte-exactly.",
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = write_image_fixtures(tempfile.mkdtemp(prefix="spark_graft_images_"))
    images = spark.read.format("binaryFile").load(root)
    return decode_image_stats(images)


# ---------------------------------------------------------------------------
# Real audio decode over the binaryFile source (PCM WAV, dependency-free)
# ---------------------------------------------------------------------------

# Same fixture-with-arithmetic-oracle pattern as mm_decode_stats: sample t of
# channel c in clip i is a pure formula, so expected per-channel statistics
# are computable WITHOUT the codec while the Spark side must survive the
# encode -> file -> binaryFile -> decode roundtrip to match them.
N_CLIPS = 8


def _clip_spec(i: int) -> tuple[str, int, int, int, int]:
    """(name, sample_rate, n_channels, bits, n_frames)"""
    rate = (8000, 16000, 22050, 44100)[i % 4]
    n_ch = 1 + i % 2
    bits = 8 if i % 3 == 0 else 16
    n_frames = 50 + 17 * i
    return f"clip_{i:03d}.wav", rate, n_ch, bits, n_frames


def _clip_sample(i: int, ch: int, t: int, bits: int) -> int:
    if bits == 8:
        return (91 * i + 5 * t + 3 * ch) % 256  # unsigned
    return ((137 * i + 31 * ch + 7 * t) % 4096) - 2048  # signed


def _audio_expected_rows() -> list[tuple]:
    rows = []
    for i in range(N_CLIPS):
        name, rate, n_ch, bits, n_frames = _clip_spec(i)
        ch0 = [_clip_sample(i, 0, t, bits) for t in range(n_frames)]
        rows.append(
            (
                name,
                rate,
                n_ch,
                bits,
                n_frames,
                # duration in exact microseconds (integer arithmetic only)
                n_frames * 1_000_000 // rate,
                sum(ch0),
                max(abs(s) for s in ch0),
            )
            + (None,)
        )
    rows.append(("bad_000.wav", None, None, None, None, None, None, None,
                 "WAV: not a RIFF/WAVE file"))
    return rows


def write_audio_fixtures(root: str) -> str:
    import os

    from ..functions.audiocodec import encode_wav

    for i in range(N_CLIPS):
        name, rate, n_ch, bits, n_frames = _clip_spec(i)
        frames = [
            tuple(_clip_sample(i, ch, t, bits) for ch in range(n_ch))
            for t in range(n_frames)
        ]
        with open(os.path.join(root, name), "wb") as fh:
            fh.write(encode_wav(rate, n_ch, bits, frames))
    with open(os.path.join(root, "bad_000.wav"), "wb") as fh:
        fh.write(b"OggS\x00 not a wav")
    return root


def audio_feature_extract(audio: DataFrame) -> DataFrame:
    """Arrow-batched PCM decode + per-clip features over a binaryFile scan.

    Geometry comes from the chunk walker (header-only); samples are decoded
    straight into numpy views (no per-sample Python objects), so the per-
    clip cost is a memcpy + vectorized reductions — the same shape a C
    codec wrapper would have. Undecodable payloads dead-letter.
    """
    import os

    import numpy as np

    schema = (
        "name string, sample_rate int, n_channels int, bits int, "
        "n_frames bigint, duration_us bigint, sum_ch0 bigint, "
        "peak_ch0 bigint, error string"
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audiocodec import _chunks, wav_geometry

        out_cols = ["name", "sample_rate", "n_channels", "bits", "n_frames",
                    "duration_us", "sum_ch0", "peak_ch0", "error"]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                try:
                    payload = bytes(content)
                    rate, n_ch, bits, n_frames = wav_geometry(payload)
                    raw = next(p for cc, p in _chunks(payload) if cc == b"data")
                    dt = np.uint8 if bits == 8 else np.dtype("<i2")
                    samples = np.frombuffer(raw, dtype=dt)[: n_frames * n_ch]
                    ch0 = samples.reshape(n_frames, n_ch)[:, 0].astype(np.int64)
                    rows.append(
                        (name, rate, n_ch, bits, n_frames,
                         n_frames * 1_000_000 // rate,
                         int(ch0.sum()), int(np.abs(ch0).max()), None)
                    )
                except (ValueError, StopIteration) as e:
                    rows.append((name, None, None, None, None, None, None,
                                 None, str(e) or "WAV: missing data chunk"))
            yield pd.DataFrame(rows, columns=out_cols)

    return audio.select("path", "content").mapInPandas(_extract, schema)


def _audio_values_cte() -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, int):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    return ",\n      ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in _audio_expected_rows()
    )


@register(
    "mm_audio_features",
    oracle=f"""
    SELECT * FROM (VALUES
      {_audio_values_cte()})
      AS t(name, sample_rate, n_channels, bits, n_frames, duration_us,
           sum_ch0, peak_ch0, error)
    """,
    doc="REAL audio decode end-to-end: deterministic PCM WAV fixtures "
    "(mixed rates/channels/8- and 16-bit) encoded to files, scanned with "
    "the binaryFile source, decoded executor-side by the dependency-free "
    "RIFF codec (functions/audiocodec.py) into numpy views inside Arrow-"
    "batched mapInPandas; geometry, exact duration_us, channel-0 sum and "
    "peak must match the sample formula; a corrupt payload dead-letters.",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = write_audio_fixtures(tempfile.mkdtemp(prefix="spark_graft_audio_"))
    return audio_feature_extract(spark.read.format("binaryFile").load(root))


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection over REAL decoded images
# ---------------------------------------------------------------------------

# Average-hash (aHash) near-dup: decode -> 8x8 block-average grayscale grid ->
# 64 threshold bits carried as FOUR 16-bit band ints (no 64-bit sign
# gymnastics; the bands double as the LSH blocking keys) -> band-bucket
# candidate join -> Hamming confirm. Same fixture-with-arithmetic-oracle
# pattern as mm_decode_stats: rasters are pure formulas, so the expected
# pair set is computable WITHOUT the codec, while the Spark side must
# survive encode -> file -> binaryFile -> Arrow decode -> hash to match it.
AH_GRID = 8
AH_MAX_HAMMING = 6
ND_SIZE = 32  # 32x32 px -> 4x4-px blocks
N_ND_BASES = 6


def _nd_base_pixels(i: int) -> bytearray:
    w = h = ND_SIZE
    out = bytearray(w * h * 3)
    k = 0
    for y in range(h):
        for x in range(w):
            for c in range(3):
                out[k] = (7 * x * x + 13 * y + 37 * i + 89 * c + (x * y) % 31) % 256
                k += 1
    return out


def _nd_specs() -> list[tuple[str, str, bytes]]:
    """(filename, format, rgb): bases + light variants (near-dups of their
    base, a few pixels nudged) + one heavy variant (bottom half inverted —
    must NOT pair)."""
    specs: list[tuple[str, str, bytes]] = []
    for i in range(N_ND_BASES):
        specs.append((f"nd_{i}_base.ppm", "ppm", bytes(_nd_base_pixels(i))))
    for i in range(3):  # light variants, cross-format (bmp vs ppm base)
        rgb = _nd_base_pixels(i)
        for k in range(0, 3 * 2 * ND_SIZE):  # first two pixel rows, +2 clamp
            rgb[k] = min(255, rgb[k] + 2)
        specs.append((f"nd_{i}_light.bmp", "bmp", bytes(rgb)))
    rgb = _nd_base_pixels(3)
    half = len(rgb) // 2
    for k in range(half, len(rgb)):  # heavy: invert bottom half
        rgb[k] = 255 - rgb[k]
    specs.append(("nd_3_heavy.bmp", "bmp", bytes(rgb)))
    return specs


def _ahash_bands(rgb: bytes, w: int = ND_SIZE, h: int = ND_SIZE) -> tuple[int, ...]:
    """4 x 16-bit aHash bands from an RGB raster — EXACT integer arithmetic
    (gray = r+g+b, block sums, strict 64*block > total threshold), so both
    the formula-side oracle and the decode-side hash are bit-stable."""
    bw, bh = w // AH_GRID, h // AH_GRID
    sums = [0] * (AH_GRID * AH_GRID)
    for y in range(h):
        for x in range(w):
            k = 3 * (y * w + x)
            g = rgb[k] + rgb[k + 1] + rgb[k + 2]
            sums[(y // bh) * AH_GRID + (x // bw)] += g
    total = sum(sums)
    bits = [1 if len(sums) * s > total else 0 for s in sums]
    bands = []
    for b in range(4):
        v = 0
        for j in range(16):
            v |= bits[b * 16 + j] << j
        bands.append(v)
    return tuple(bands)


#: the WIDE hash: 16x16 grid -> 256 bits -> 4 x 64-bit bands. Same
#: pigeonhole guarantee (Hamming <= max_hamming/ (bands-1)... strictly:
#: any pair with Hamming <= 3 shares a band; probabilistic beyond), but
#: the bucket space per band is 2^64, so the fixed-width random-collision
#: term (~n^2/2^17 at 16-bit bands — measured super-linear,
#: tools/scale_growth_multimodal.py) vanishes for any reachable corpus.
AH_WIDE_GRID = 16
AH_WIDE_MAX_HAMMING = 12


def _ahash_bands_wide(rgb: bytes, w: int = ND_SIZE, h: int = ND_SIZE) -> tuple[int, ...]:
    """4 x 64-bit aHash bands (16x16 grid) — same exact integer arithmetic
    as :func:`_ahash_bands`; band values are two's-complement signed so
    they round-trip a Spark BIGINT column bit-exactly."""
    grid = AH_WIDE_GRID
    bw, bh = w // grid, h // grid
    sums = [0] * (grid * grid)
    for y in range(h):
        for x in range(w):
            k = 3 * (y * w + x)
            g = rgb[k] + rgb[k + 1] + rgb[k + 2]
            sums[(y // bh) * grid + (x // bw)] += g
    total = sum(sums)
    bits = [1 if len(sums) * s > total else 0 for s in sums]
    bands = []
    for b in range(4):
        v = 0
        for j in range(64):
            v |= bits[b * 64 + j] << j
        if v >= 1 << 63:
            v -= 1 << 64
        bands.append(v)
    return tuple(bands)


def _expected_pairs_from(
    hashes: dict[str, tuple[int, ...]], max_hamming: int
) -> list[tuple[str, str, int]]:
    names = sorted(hashes)
    pairs = []
    for ia, a in enumerate(names):
        for b in names[ia + 1 :]:
            ha, hb = hashes[a], hashes[b]
            if not any(x == y for x, y in zip(ha, hb)):
                continue  # no shared band bucket -> never a candidate
            ham = sum(bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(ha, hb))
            if ham <= max_hamming:
                pairs.append((a, b, ham))
    return pairs


def _nd_expected_pairs() -> list[tuple[str, str, int]]:
    return _expected_pairs_from(
        {name: _ahash_bands(rgb) for name, _, rgb in _nd_specs()}, AH_MAX_HAMMING
    )


def _nd_expected_pairs_wide() -> list[tuple[str, str, int]]:
    return _expected_pairs_from(
        {name: _ahash_bands_wide(rgb) for name, _, rgb in _nd_specs()},
        AH_WIDE_MAX_HAMMING,
    )


def write_neardup_image_fixtures(root: str) -> str:
    import os

    from ..functions.imagecodec import encode_bmp, encode_ppm

    for name, fmt, rgb in _nd_specs():
        payload = (
            encode_bmp(ND_SIZE, ND_SIZE, rgb)
            if fmt == "bmp"
            else encode_ppm(ND_SIZE, ND_SIZE, rgb)
        )
        with open(os.path.join(root, name), "wb") as fh:
            fh.write(payload)
    return root


def image_ahash(images: DataFrame) -> DataFrame:
    """(name, b0..b3): average-hash bands from a binaryFile scan, decoded
    and hashed inside Arrow-batched mapInPandas (numpy block pooling — no
    per-pixel Python loop). Undecodable payloads are dropped here (the
    dead-letter contract lives in decode_image_stats; a near-dup miner
    only consumes decodable members)."""
    import os

    import numpy as np

    schema = "name string, b0 int, b1 int, b2 int, b3 int"

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import decode_image as _dec

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    _, w, h, rgb = _dec(bytes(content))
                except ValueError:
                    continue
                if w % AH_GRID or h % AH_GRID:
                    continue  # hash contract: grid-divisible geometry
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                gray = a.reshape(h, w, 3).sum(axis=2)
                bw, bh = w // AH_GRID, h // AH_GRID
                blocks = gray.reshape(AH_GRID, bh, AH_GRID, bw).sum(axis=(1, 3))
                flat = blocks.ravel()
                bits = (flat.size * flat > flat.sum()).astype(np.int64)
                bands = [
                    int((bits[b * 16 : (b + 1) * 16] << np.arange(16)).sum())
                    for b in range(4)
                ]
                rows.append([os.path.basename(path), *bands])
            yield pd.DataFrame(rows, columns=["name", "b0", "b1", "b2", "b3"])

    return images.select("path", "content").mapInPandas(_hash, schema)


def image_ahash_wide(images: DataFrame) -> DataFrame:
    """(name, b0..b3 BIGINT): the 256-bit wide average-hash (16x16 grid ->
    4 x 64-bit bands) from a binaryFile scan — the fixed-width-collision
    fix measured in tools/scale_growth_multimodal.py: a 64-bit band's
    bucket space is 2^64, so random bucket collisions vanish and banded
    candidate volume tracks TRUE near-dups only (hot buckets — identical
    content — remain, handled by max_bucket_size). Same Arrow-batched
    numpy pooling as image_ahash; bands pack two's-complement signed to
    round-trip BIGINT bit-exactly."""
    import os

    import numpy as np

    grid = AH_WIDE_GRID
    schema = "name string, b0 bigint, b1 bigint, b2 bigint, b3 bigint"

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import decode_image as _dec

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    _, w, h, rgb = _dec(bytes(content))
                except ValueError:
                    continue
                if w % grid or h % grid:
                    continue  # hash contract: grid-divisible geometry
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                gray = a.reshape(h, w, 3).sum(axis=2)
                bw, bh = w // grid, h // grid
                blocks = gray.reshape(grid, bh, grid, bw).sum(axis=(1, 3))
                flat = blocks.ravel()
                bits = (flat.size * flat > flat.sum()).astype(np.uint8)
                bands = [
                    int.from_bytes(
                        np.packbits(
                            bits[b * 64 : (b + 1) * 64], bitorder="little"
                        ).tobytes(),
                        "little",
                        signed=True,
                    )
                    for b in range(4)
                ]
                rows.append([os.path.basename(path), *bands])
            yield pd.DataFrame(rows, columns=["name", "b0", "b1", "b2", "b3"])

    return images.select("path", "content").mapInPandas(_hash, schema)


def band_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = AH_MAX_HAMMING,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded near-dup join over aHash bands: candidates = pairs sharing ANY
    16-bit band bucket (the same OR-amplified equi-join shape as
    dedup_simhash — pigeonhole guarantees Hamming <= 3 pairs always share
    one of 4 bands; beyond that recall is probabilistic), then an exact
    Hamming confirm via bit_count(xor) on the band ints. Shuffle carries
    (name, band) pairs only; rasters never leave the hash stage.

    ``max_bucket_size`` is the 100-TB knob: a 16-bit band bucket is FIXED
    width (64-bit hash / 4 bands), so bucket occupancy grows with the
    corpus and candidate pairs grow ~n^2/2^17 — measured quadratic at the
    10x/100x decades (tools/scale_growth_multimodal.py; the same
    saturation class as fixed RP-LSH bits, which could widen — this hash
    cannot). Real corpora are worse: near-constant content (black frames,
    silence, test cards) piles into a handful of HOT buckets. The cap
    excludes buckets larger than ``max_bucket_size`` from candidate
    generation via one tiny aggregate + broadcast anti-join (the
    dedup_levenshtein_capped pattern) — measured to restore linear
    candidate growth; the documented recall trade is pairs living ONLY in
    a hot bucket (near-constant content is better handled by an exact
    dedup on the raw hash first)."""
    bands = hashes.select(
        "name",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band_id", "band_val"),
    )
    if max_bucket_size is not None:
        hot = (
            bands.groupBy("band_id", "band_val")
            .count()
            .where(F.col("count") > max_bucket_size)
            .select("band_id", "band_val")
        )
        bands = bands.join(F.broadcast(hot), ["band_id", "band_val"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("img_a"), F.col("b.name").alias("img_b"))
        .distinct()
    )
    ha = hashes.select(F.col("name").alias("img_a"), *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)])
    hb = hashes.select(F.col("name").alias("img_b"), *[F.col(f"b{i}").alias(f"bb{i}") for i in range(4)])
    ham = sum(F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"bb{i}"))) for i in range(4))
    return (
        cand.join(ha, "img_a")
        .join(hb, "img_b")
        .select("img_a", "img_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def _nd_values_cte() -> str:
    rows = _nd_expected_pairs()
    return ",\n      ".join(
        f"('{a}', '{b}', {h})" for a, b, h in rows
    )


@register(
    "mm_image_near_dup",
    oracle=f"""
    SELECT * FROM (VALUES
      {_nd_values_cte()})
      AS t(img_a, img_b, hamming)
    """,
    doc="Perceptual near-dup detection over REAL decoded images: formula-"
    "generated PPM/BMP fixtures (3 light variants that must pair with "
    "their bases cross-format, 1 heavy variant that must not) are "
    "encoded to files, binaryFile-scanned, aHash-ed in Arrow-batched "
    "mapInPandas, band-bucket joined, Hamming-confirmed. The oracle "
    "states the expected pair set from the pixel formulas alone.",
)
def mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = write_neardup_image_fixtures(tempfile.mkdtemp(prefix="spark_graft_nd_"))
    return band_near_dup_pairs(image_ahash(spark.read.format("binaryFile").load(root)))


def _nd_wide_values_cte() -> str:
    return ",\n      ".join(
        f"('{a}', '{b}', {h})" for a, b, h in _nd_expected_pairs_wide()
    )


@register(
    "mm_image_near_dup_wide",
    oracle=f"""
    SELECT * FROM (VALUES
      {_nd_wide_values_cte()})
      AS t(img_a, img_b, hamming)
    """,
    doc="The 256-bit WIDE perceptual near-dup path (16x16 aHash -> "
    "4 x 64-bit bands): same decode -> Arrow hash -> band-bucket join -> "
    "Hamming confirm over the same fixtures, but each band's bucket "
    "space is 2^64 — the structural fix for the 16-bit bands' "
    "n^2/2^17 random-collision term measured super-linear at the "
    "10x/100x decades (tools/scale_growth_multimodal.py; SCALE.md). "
    "The oracle states the expected pair set from the pixel formulas "
    "alone: the three planted light variants pair with their bases "
    "cross-format at Hamming 1-3, the heavy variant pairs with nothing.",
)
def mm_image_near_dup_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = write_neardup_image_fixtures(tempfile.mkdtemp(prefix="spark_graft_ndw_"))
    return band_near_dup_pairs(
        image_ahash_wide(spark.read.format("binaryFile").load(root)),
        max_hamming=AH_WIDE_MAX_HAMMING,
    )


# ---------------------------------------------------------------------------
# Energy-delta fingerprint near-dup over REAL decoded audio
# ---------------------------------------------------------------------------

# Acoustic fingerprint in the Shazam/Chromaprint family, reduced to its
# deterministic core: 65 fixed windows of channel-0 |sample| energy ->
# 64 sign-of-delta bits (robust to gain-preserving perturbations, flipped
# by structural edits) -> the SAME 4x16-bit band join + Hamming confirm as
# the image path (band_near_dup_pairs is modality-agnostic).
AU_WINDOWS = 65
AU_WIN_FRAMES = 32
AU_ND_FRAMES = AU_WINDOWS * AU_WIN_FRAMES
AU_ND_RATE = 16000
N_AU_BASES = 5


def _au_base_samples(i: int) -> list[int]:
    # structure (not just amplitude) varies with i: per-clip quadratic
    # chirp rate and modulation period, so base ENVELOPES differ and the
    # delta-sign fingerprints of distinct bases are far apart
    q = 30 + 7 * i
    m = 61 + 6 * i
    return [
        (((t * t) // q + 13 * ((t + 11 * i) % m) + 29 * i * (t // 128)) % 4096) - 2048
        for t in range(AU_ND_FRAMES)
    ]


def _au_specs() -> list[tuple[str, list[int]]]:
    specs = [(f"au_{i}_base.wav", _au_base_samples(i)) for i in range(N_AU_BASES)]
    for i in range(2):  # light variants: sparse perturbation (variant 1
        # stronger, to land at a small NONZERO Hamming the confirm stage
        # must tolerate)
        s = _au_base_samples(i)
        if i == 0:  # sparse sample-level nudge: fingerprint-invariant
            for t in range(0, AU_ND_FRAMES, 97):
                s[t] = max(-2048, min(2047, s[t] + 5))
        else:  # boost two whole windows: flips a few delta-sign bits,
            # which the Hamming-confirm stage must TOLERATE (<= max)
            for w in (10, 40):
                for t in range(w * AU_WIN_FRAMES, (w + 1) * AU_WIN_FRAMES):
                    s[t] = max(-2048, min(2047, int(s[t] * 8) // 5))
        specs.append((f"au_{i}_light.wav", s))
    s = _au_base_samples(2)  # heavy: reverse the second half
    half = len(s) // 2
    s[half:] = s[half:][::-1]
    specs.append(("au_2_heavy.wav", s))
    return specs


def _au_fingerprint_bands(samples: list[int]) -> tuple[int, ...]:
    energies = [
        sum(abs(x) for x in samples[w * AU_WIN_FRAMES : (w + 1) * AU_WIN_FRAMES])
        for w in range(AU_WINDOWS)
    ]
    bits = [1 if energies[j + 1] > energies[j] else 0 for j in range(AU_WINDOWS - 1)]
    bands = []
    for b in range(4):
        v = 0
        for j in range(16):
            v |= bits[b * 16 + j] << j
        bands.append(v)
    return tuple(bands)


def _au_expected_pairs() -> list[tuple[str, str, int]]:
    prints = {name: _au_fingerprint_bands(s) for name, s in _au_specs()}
    names = sorted(prints)
    pairs = []
    for ia, a in enumerate(names):
        for b in names[ia + 1 :]:
            ha, hb = prints[a], prints[b]
            if not any(x == y for x, y in zip(ha, hb)):
                continue
            ham = sum(bin(x ^ y).count("1") for x, y in zip(ha, hb))
            if ham <= AH_MAX_HAMMING:
                pairs.append((a, b, ham))
    return pairs


def write_neardup_audio_fixtures(root: str) -> str:
    import os

    from ..functions.audiocodec import encode_wav

    for name, samples in _au_specs():
        frames = [(x,) for x in samples]
        with open(os.path.join(root, name), "wb") as fh:
            fh.write(encode_wav(AU_ND_RATE, 1, 16, frames))
    return root


def audio_fingerprint(audio: DataFrame) -> DataFrame:
    """(name, b0..b3): energy-delta fingerprint bands from a binaryFile
    scan, decoded and fingerprinted inside Arrow-batched mapInPandas
    (numpy window pooling). Undecodable or wrong-geometry clips drop."""
    import os

    import numpy as np

    schema = "name string, b0 int, b1 int, b2 int, b3 int"

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audiocodec import decode_wav

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rate, n_ch, bits, frames = decode_wav(bytes(content))
                except ValueError:
                    continue
                if n_ch != 1 or len(frames) != AU_ND_FRAMES:
                    continue
                a = np.asarray([f[0] for f in frames], dtype=np.int64)
                e = np.abs(a).reshape(AU_WINDOWS, AU_WIN_FRAMES).sum(axis=1)
                bts = (e[1:] > e[:-1]).astype(np.int64)
                bands = [
                    int((bts[b * 16 : (b + 1) * 16] << np.arange(16)).sum())
                    for b in range(4)
                ]
                rows.append([os.path.basename(path), *bands])
            yield pd.DataFrame(rows, columns=["name", "b0", "b1", "b2", "b3"])

    return audio.select("path", "content").mapInPandas(_fp, schema)


def _au_values_cte() -> str:
    return ",\n      ".join(f"('{a}', '{b}', {h})" for a, b, h in _au_expected_pairs())


@register(
    "mm_audio_near_dup",
    oracle=f"""
    SELECT * FROM (VALUES
      {_au_values_cte()})
      AS t(img_a, img_b, hamming)
    """,
    doc="Acoustic near-dup detection over REAL decoded audio: formula-"
    "generated PCM WAV fixtures (2 light variants that must pair with "
    "their bases, 1 half-reversed heavy variant that must not) are "
    "encoded to files, binaryFile-scanned, energy-delta fingerprinted in "
    "Arrow-batched mapInPandas, then fed through the SAME band-bucket + "
    "Hamming machinery as the image path. Oracle = expected pair set "
    "from the sample formulas alone.",
)
def mm_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = write_neardup_audio_fixtures(tempfile.mkdtemp(prefix="spark_graft_au_"))
    return band_near_dup_pairs(audio_fingerprint(spark.read.format("binaryFile").load(root)))


# ---------------------------------------------------------------------------
# Image embedding -> cosine retrieval (multimodal x similarity bridge)
# ---------------------------------------------------------------------------


def _embed_blocks(rgb: bytes, w: int = ND_SIZE, h: int = ND_SIZE) -> list[float]:
    """64-dim embedding: 8x8 grid of block-summed grayscale (r+g+b) —
    exact integers carried as doubles, so Python and the numpy path
    produce bit-identical vectors."""
    bw, bh = w // AH_GRID, h // AH_GRID
    sums = [0] * (AH_GRID * AH_GRID)
    for y in range(h):
        for x in range(w):
            k = 3 * (y * w + x)
            sums[(y // bh) * AH_GRID + (x // bw)] += rgb[k] + rgb[k + 1] + rgb[k + 2]
    return [float(s) for s in sums]


def _image_embed_expected_topk(k: int = 3) -> list[tuple[str, str, int]]:
    import math

    vecs = {name: _embed_blocks(rgb) for name, _, rgb in _nd_specs()}

    def cos(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    rows = []
    for q in sorted(vecs):
        scored = sorted(
            ((cos(vecs[q], vecs[n]), n) for n in vecs if n != q),
            key=lambda t: (-t[0], t[1]),
        )
        rows += [(q, n, i + 1) for i, (_, n) in enumerate(scored[:k])]
    return rows


def image_embeddings(images: DataFrame) -> DataFrame:
    """(vec_id, embedding): decoded rasters embedded as 8x8 block-sum
    grayscale vectors inside Arrow-batched mapInPandas — the bridge from
    binary media columns into EVERY similarity operator in this engine
    (brute-force / IVF / RP-LSH / PQ all consume (id, array) frames)."""
    import os

    import numpy as np

    schema = "vec_id string, embedding array<double>"

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import decode_image as _dec

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    _, w, h, rgb = _dec(bytes(content))
                except ValueError:
                    continue
                if w % AH_GRID or h % AH_GRID:
                    continue
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                gray = a.reshape(h, w, 3).sum(axis=2)
                blocks = gray.reshape(
                    AH_GRID, h // AH_GRID, AH_GRID, w // AH_GRID
                ).sum(axis=(1, 3))
                rows.append(
                    [os.path.basename(path), blocks.ravel().astype(np.float64).tolist()]
                )
            yield pd.DataFrame(rows, columns=["vec_id", "embedding"])

    return images.select("path", "content").mapInPandas(_embed, schema)


@register(
    "mm_image_embed_topk",
    oracle="""
    SELECT * FROM (VALUES
      """
    + ",\n      ".join(
        f"('{q}', '{n}', {r})" for q, n, r in _image_embed_expected_topk()
    )
    + """)
      AS t(query_id, neighbor_id, rn)
    """,
    doc="Multimodal retrieval end-to-end: the near-dup image fixtures are "
    "decoded and embedded (8x8 block-grayscale vectors) executor-side, "
    "then ranked by the SAME brute_force_topk used for text embeddings — "
    "binary media columns feed the similarity stack with no special "
    "casing. Oracle = expected cosine ranks from the pixel formulas.",
)
def mm_image_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .similarity import brute_force_topk

    root = write_neardup_image_fixtures(tempfile.mkdtemp(prefix="spark_graft_emb_"))
    em = image_embeddings(spark.read.format("binaryFile").load(root))
    return brute_force_topk(em, em, k=3)


def _media_survivors_expected() -> list[str]:
    dropped = {b for _, b, _ in _nd_expected_pairs()}
    return sorted(n for n, _, _ in _nd_specs() if n not in dropped)


@register(
    "pipeline_media_curation",
    oracle="""
    SELECT * FROM (VALUES
      """
    + ",\n      ".join(f"('{n}')" for n in _media_survivors_expected())
    + """)
      AS t(name)
    """,
    doc="Composed media curation: binaryFile scan -> real decode -> aHash "
    "-> band-bucket near-dup pairs -> survivor election (drop the "
    "lexicographically later member of each pair) — the image-corpus "
    "dedup pipeline end-to-end under one oracle. Light variants are "
    "eliminated; the heavy edit and all bases survive.",
)
def pipeline_media_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    root = write_neardup_image_fixtures(tempfile.mkdtemp(prefix="spark_graft_cur_"))
    hashes = image_ahash(spark.read.format("binaryFile").load(root))
    pairs = band_near_dup_pairs(hashes)
    # survivor election: the dup-pair graph here is pairwise (a < b with a
    # the earlier name); drop every b — same rule as dedup survivorship
    drop = pairs.select(F.col("img_b").alias("name")).distinct()
    return hashes.select("name").join(drop, "name", "left_anti")


# ---------------------------------------------------------------------------
# Audio embedding -> cosine retrieval (the audio side of the bridge)
# ---------------------------------------------------------------------------


def _au_embed(samples: list[int]) -> list[float]:
    """65-dim embedding: per-window |sample| energies as doubles (exact
    integer sums, same accumulation order as the numpy path)."""
    return [
        float(sum(abs(x) for x in samples[w * AU_WIN_FRAMES : (w + 1) * AU_WIN_FRAMES]))
        for w in range(AU_WINDOWS)
    ]


def _audio_embed_expected_topk(k: int = 3) -> list[tuple[str, str, int]]:
    import math

    vecs = {name: _au_embed(s) for name, s in _au_specs()}

    def cos(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    rows = []
    for q in sorted(vecs):
        scored = sorted(
            ((cos(vecs[q], vecs[n]), n) for n in vecs if n != q),
            key=lambda t: (-t[0], t[1]),
        )
        rows += [(q, n, i + 1) for i, (_, n) in enumerate(scored[:k])]
    return rows


def audio_embeddings(audio: DataFrame) -> DataFrame:
    """(vec_id, embedding): decoded clips embedded as window-energy
    vectors inside Arrow-batched mapInPandas."""
    import os

    import numpy as np

    schema = "vec_id string, embedding array<double>"

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audiocodec import decode_wav

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rate, n_ch, bits, frames = decode_wav(bytes(content))
                except ValueError:
                    continue
                if n_ch != 1 or len(frames) != AU_ND_FRAMES:
                    continue
                a = np.asarray([f[0] for f in frames], dtype=np.int64)
                e = np.abs(a).reshape(AU_WINDOWS, AU_WIN_FRAMES).sum(axis=1)
                rows.append([os.path.basename(path), e.astype(np.float64).tolist()])
            yield pd.DataFrame(rows, columns=["vec_id", "embedding"])

    return audio.select("path", "content").mapInPandas(_embed, schema)


@register(
    "mm_audio_embed_topk",
    oracle="""
    SELECT * FROM (VALUES
      """
    + ",\n      ".join(
        f"('{q}', '{n}', {r})" for q, n, r in _audio_embed_expected_topk()
    )
    + """)
      AS t(query_id, neighbor_id, rn)
    """,
    doc="Audio retrieval end-to-end: decoded PCM clips embedded as "
    "window-energy vectors executor-side, ranked by the same "
    "brute_force_topk as text and image embeddings. Oracle = expected "
    "cosine ranks from the sample formulas.",
)
def mm_audio_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .similarity import brute_force_topk

    root = write_neardup_audio_fixtures(tempfile.mkdtemp(prefix="spark_graft_aemb_"))
    em = audio_embeddings(spark.read.format("binaryFile").load(root))
    return brute_force_topk(em, em, k=3)
