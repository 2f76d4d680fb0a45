"""Pure-Python media codecs for the multimodal decode boundary (X4).

The container ships no media libraries, but UNCOMPRESSED formats need
none: BMP (24-bit BITMAPINFOHEADER), binary PPM (P6), and WAV PCM-16 are
fully specified byte layouts a few dozen lines of struct-parsing decode
exactly. These are real codecs — the BMP decoder handles the format's
bottom-up row order and 4-byte row padding, the PPM parser handles
comments and token whitespace, the WAV parser walks RIFF chunks — so the
``mm_decode_bmp`` / ``mm_decode_wav`` queries verify genuinely decoded
pixels/samples end-to-end through the mapInPandas boundary, not byte
statistics. Compressed formats (JPEG/PNG/FLAC/...) remain the documented
integration point for PIL/libvips/ffmpeg.

Reference parity: the reference pipeline treats media as opaque payloads
and never decodes (its enrichment is text-only); this boundary is the
engine's extension for multimodal training-data curation.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed, BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes (len == width*height*3) as a
    standard 24-bit BMP: 14-byte file header + 40-byte BITMAPINFOHEADER,
    bottom-up rows, BGR channel order, rows padded to 4-byte multiples."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # RGB → BGR per pixel
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    pixel_data = b"".join(rows)
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0,
    )
    return file_header + info_header + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP → (width, height, top-down RGB
    bytes). Handles bottom-up AND top-down (negative height) files and
    per-row padding. Raises ValueError on non-BMP or unsupported depth."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit uncompressed"
        )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height_raw}")
    row_stride = (width * 3 + 3) & ~3
    if len(payload) < data_offset + row_stride * height:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        start = data_offset + src_row * row_stride
        bgr = payload[start : start + width * 3]
        row = bytearray(len(bgr))
        row[0::3] = bgr[2::3]  # BGR → RGB
        row[1::3] = bgr[1::3]
        row[2::3] = bgr[0::3]
        out[y * width * 3 : (y + 1) * width * 3] = row
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# PPM — binary P6
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes as binary PPM (P6, maxval 255)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode binary PPM (P6) → (width, height, RGB bytes). Handles `#`
    comments and arbitrary whitespace between header tokens per the netpbm
    spec; exactly ONE whitespace byte separates maxval from pixel data."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    rgb = payload[pos : pos + need]
    if len(rgb) != need:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


# ---------------------------------------------------------------------------
# WAV — RIFF, PCM signed 16-bit little-endian, mono or interleaved
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: list[int], sample_rate: int = 16_000,
                     channels: int = 1) -> bytes:
    """Encode int16 samples as a canonical RIFF/WAVE PCM-16 file."""
    data = struct.pack("<%dh" % len(samples), *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        block_align, 16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_size = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_chunk


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode RIFF/WAVE PCM-16 → (sample_rate, channels, samples). Walks
    the chunk list (skipping LIST/fact/etc.), so files with extra chunks
    decode correctly. Raises ValueError on non-PCM or non-16-bit audio."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = None
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        body = payload[pos : pos + size]
        if cid in (b"fmt ", b"data") and len(body) < size:
            raise ValueError(
                f"truncated WAV {cid.decode('ascii').strip()} chunk: "
                f"declared {size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"WAV fmt chunk too short ({len(body)} bytes)")
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={audio_fmt}, bits={bits}); "
                    "only PCM-16 — wire ffmpeg/soundfile for compressed audio"
                )
        elif cid == b"data":
            n = size // 2
            samples = list(struct.unpack_from("<%dh" % n, body, 0))
        pos += size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, channels, samples
