"""Dependency-free audio codec for uncompressed WAV (RIFF/PCM).

Completes the multimodal AUDIO path the same way :mod:`.imagecodec` completes
the image path: WAV is a public, byte-exact container spec —

* RIFF header: ``RIFF <size> WAVE``;
* ``fmt `` chunk: PCM format tag (1), channel count, sample rate, bits per
  sample (8 or 16 supported — the uncompressed common cases);
* ``data`` chunk: interleaved little-endian frames (unsigned 8-bit or
  signed 16-bit);
* any other chunks (``LIST``, ``fact``, ...) are metadata and skipped by
  chunk framing — the decoder walks ``<fourcc><size><payload>`` like a
  conformant reader.

Decoders return ``(sample_rate, n_channels, bits, frames)`` with ``frames``
a list of per-channel sample tuples decoded to plain ints; the Spark-side
operator (operators/multimodal.py) computes per-channel statistics executor-
side from numpy views, never materializing per-sample Python objects in the
hot path — this module's pure-Python decode is only the reference used for
small payloads and tests; the operator decodes straight into numpy.
"""

from __future__ import annotations

import struct

__all__ = ["decode_wav", "encode_wav", "wav_geometry"]


def _chunks(data: bytes):
    """Walk RIFF sub-chunks: yields (fourcc, payload). Chunk sizes are padded
    to even offsets per the RIFF spec."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: not a RIFF/WAVE file")
    i = 12
    n = len(data)
    while i + 8 <= n:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        payload = data[i + 8 : i + 8 + size]
        if len(payload) < size:
            raise ValueError(f"WAV: chunk {fourcc!r} truncated")
        yield fourcc, payload
        i += 8 + size + (size & 1)


def wav_geometry(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, bits_per_sample, n_frames) without decoding
    samples — a metadata-only sniff, like the parquet footer reads."""
    fmt = None
    data_len = None
    for fourcc, payload in _chunks(data):
        if fourcc == b"fmt ":
            tag, n_ch, rate, _bps, _align, bits = struct.unpack_from("<HHIIHH", payload, 0)
            if tag != 1:
                raise ValueError(f"WAV: only PCM supported (format tag {tag})")
            if bits not in (8, 16):
                raise ValueError(f"WAV: only 8/16-bit PCM supported (got {bits})")
            if n_ch < 1:
                raise ValueError("WAV: zero channels")
            fmt = (rate, n_ch, bits)
        elif fourcc == b"data":
            data_len = len(payload)
    if fmt is None or data_len is None:
        raise ValueError("WAV: missing fmt/data chunk")
    rate, n_ch, bits = fmt
    n_frames = data_len // (n_ch * bits // 8)
    return rate, n_ch, bits, n_frames


def decode_wav(data: bytes) -> tuple[int, int, int, list[tuple[int, ...]]]:
    """Decode PCM WAV to (sample_rate, n_channels, bits, frames).

    8-bit samples are unsigned (0..255), 16-bit signed little-endian — the
    raw stored values, no normalization (feature extraction decides scale).
    """
    rate = n_ch = bits = None
    raw = None
    for fourcc, payload in _chunks(data):
        if fourcc == b"fmt ":
            rate, n_ch, bits, _ = wav_geometry(data)
        elif fourcc == b"data":
            raw = payload
    if rate is None or raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    width = bits // 8
    frame_bytes = n_ch * width
    n_frames = len(raw) // frame_bytes
    raw = raw[: n_frames * frame_bytes]
    if bits == 8:
        flat = list(raw)
    else:
        flat = list(struct.unpack(f"<{n_frames * n_ch}h", raw))
    return rate, n_ch, bits, [
        tuple(flat[f * n_ch : (f + 1) * n_ch]) for f in range(n_frames)
    ]


def encode_wav(sample_rate: int, n_channels: int, bits: int, frames) -> bytes:
    """Exact inverse of :func:`decode_wav` (canonical 44-byte header)."""
    if bits not in (8, 16):
        raise ValueError("encode_wav: bits must be 8 or 16")
    width = bits // 8
    flat = [s for frame in frames for s in frame]
    if bits == 8:
        raw = bytes(flat)
    else:
        raw = struct.pack(f"<{len(flat)}h", *flat)
    byte_rate = sample_rate * n_channels * width
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * width, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
