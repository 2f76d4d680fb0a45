"""Pure-Python media codec tests (operators/codecs.py): format layouts
pinned against hand-built byte fixtures, not just encode→decode symmetry,
so a matched encoder/decoder bug cannot cancel out."""

from __future__ import annotations

import struct

import pytest

from hybrid_nutrition_data_pipeline_batch_streaming_spark.operators.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
)
from hybrid_nutrition_data_pipeline_batch_streaming_spark.operators.multimodal import (
    decode_image,
)


def test_bmp_round_trip_exact():
    w, h = 5, 3  # width 5 → 15-byte rows → 1 padding byte per row
    rgb = bytes(range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_bmp_layout_pinned_by_hand():
    # 1×2 image, top row red, bottom row blue. File stores rows BOTTOM-UP
    # in BGR with 4-byte padding: bottom row (blue → BGR FF 00 00) first.
    payload = encode_bmp(1, 2, b"\xff\x00\x00" + b"\x00\x00\xff")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    assert data_offset == 54
    assert payload[54:57] == b"\xff\x00\x00"   # blue pixel, BGR
    assert payload[57:58] == b"\x00"           # row padding to 4 bytes
    assert payload[58:61] == b"\x00\x00\xff"   # red pixel, BGR
    # And a hand-built TOP-DOWN file (negative height) decodes too.
    td = bytearray(payload)
    struct.pack_into("<i", td, 22, -2)
    td[54:58], td[58:62] = payload[58:62], payload[54:58]
    assert decode_bmp(bytes(td)) == (1, 2, b"\xff\x00\x00" + b"\x00\x00\xff")


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(60))
    p = bytearray(encode_bmp(1, 1, b"\x01\x02\x03"))
    struct.pack_into("<H", p, 28, 8)  # 8bpp
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bytes(p))


def test_ppm_round_trip_and_comments():
    w, h = 4, 2
    rgb = bytes((7 * i) % 256 for i in range(w * h * 3))
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
    commented = b"P6\n# a comment\n 4\t2 # inline\n255\n" + rgb
    assert decode_ppm(commented) == (w, h, rgb)


def test_wav_round_trip_and_chunk_walk():
    samples = [0, 1, -1, 32767, -32768, 1000, -1000, 42]
    payload = encode_wav_pcm16(samples, sample_rate=8000)
    assert decode_wav_pcm16(payload) == (8000, 1, samples)
    # Insert a LIST chunk before data: decoder must walk past it.
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav_pcm16(spliced) == (8000, 1, samples)


def test_wav_rejects_non_pcm16():
    payload = bytearray(encode_wav_pcm16([1, 2, 3]))
    struct.pack_into("<H", payload, 20, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav_pcm16(bytes(payload))


def test_decode_image_dispatch_and_narrowed_stub():
    rgb = b"\x01\x02\x03"
    assert decode_image(encode_bmp(1, 1, rgb)) == (1, 1, rgb)
    assert decode_image(encode_ppm(1, 1, rgb)) == (1, 1, rgb)
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0" + bytes(16))
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n" + bytes(16))


def test_wav_rejects_oversized_declared_chunk():
    # ADVICE r4: a data chunk whose declared size exceeds the remaining
    # payload must raise the documented ValueError, not struct.error.
    payload = bytearray(encode_wav_pcm16([1, 2, 3, 4]))
    data_pos = payload.index(b"data")
    struct.pack_into("<I", payload, data_pos + 4, 10_000)
    with pytest.raises(ValueError, match="truncated WAV data chunk"):
        decode_wav_pcm16(bytes(payload))
    # Same contract for a truncated fmt chunk.
    p2 = bytearray(encode_wav_pcm16([1]))
    fmt_pos = p2.index(b"fmt ")
    struct.pack_into("<I", p2, fmt_pos + 4, 4_096)
    with pytest.raises(ValueError, match="truncated WAV fmt chunk"):
        decode_wav_pcm16(bytes(p2))
    # A consistent-but-short fmt chunk (declared == present < 16 bytes).
    p3 = bytearray(encode_wav_pcm16([1]))
    short = p3[:fmt_pos + 4] + struct.pack("<I", 8) + p3[fmt_pos + 8:fmt_pos + 16]
    short += p3[p3.index(b"data"):]
    short[4:8] = struct.pack("<I", len(short) - 8)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav_pcm16(bytes(short))


def test_bmp_rejects_nonpositive_dimensions():
    # ADVICE r4: width <= 0 or height == 0 must be ValueError, not garbage.
    p = bytearray(encode_bmp(2, 2, bytes(12)))
    struct.pack_into("<i", p, 18, 0)  # width = 0
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        decode_bmp(bytes(p))
    p = bytearray(encode_bmp(2, 2, bytes(12)))
    struct.pack_into("<i", p, 18, -3)  # negative width
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        decode_bmp(bytes(p))
    p = bytearray(encode_bmp(2, 2, bytes(12)))
    struct.pack_into("<i", p, 22, 0)  # height = 0
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        decode_bmp(bytes(p))
