"""Multimodal columns: opaque binary payloads + typed metadata (north-star
X4; SURVEY.md §2.11).

Design for 100 TB of mixed media:
- the payload is an opaque ``binary`` column (never parsed by Catalyst, so
  it's pass-through in shuffles and prunable — a query that doesn't touch
  ``payload`` never reads those parquet pages);
- typed metadata (modality, byte size, content hash) travels in ordinary
  columns so filtering/routing is JVM-side;
- decode / feature-extract runs in ``mapInPandas`` over Arrow batches —
  the only sane boundary for media codecs — partitioned upstream so each
  task decodes a bounded byte volume.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_features`` computes a deterministic byte-level feature
vector with the exact schema/batching a real decoder would use, and
``decode_image`` raises NotImplementedError to mark the integration point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a multimodal row: binary payload + typed metadata.

    Uses the UTF-8 bytes of the text as the stand-in payload; a real corpus
    reads media bytes from object storage with exactly this schema.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("text").alias("modality"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload → (width, height, top-down RGB bytes).

    Uncompressed formats decode for real, in pure Python (operators/
    codecs.py): 24-bit BMP (bottom-up rows, 4-byte padding, BGR order)
    and binary PPM (P6). Compressed formats (JPEG/PNG/WebP/...) remain
    the integration point for PIL/libvips — the NotImplementedError is
    now narrowed to exactly those."""
    from .codecs import decode_bmp, decode_ppm

    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    magic = {
        b"\xff\xd8": "JPEG", b"\x89P": "PNG", b"GI": "GIF", b"RI": "WebP/RIFF",
    }.get(bytes(payload[:2]), "unknown")
    raise NotImplementedError(
        f"compressed image format ({magic}) requires an image library; "
        "wire PIL/libvips here — BMP/PPM decode natively"
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched fake 'decode': per-payload deterministic byte statistics
    with the schema, batching and partition behavior of a real feature
    extractor (FEATURE_DIM floats per row).

    Swap the body for codec calls without touching the plan: the
    mapInPandas boundary, output schema and upstream partitioning all stay.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                b = bytes(buf)
                n = max(len(b), 1)
                # Deterministic byte-moment features (stride-sampled so cost
                # is bounded per row regardless of payload size).
                sample = b[:: max(n // 64, 1)][:64]
                s = [float(x) for x in sample] or [0.0]
                mean = sum(s) / len(s)
                feats.append(
                    [
                        float(len(b)),
                        mean,
                        min(s),
                        max(s),
                        float(len(set(sample))),
                        float(b[0]) if b else 0.0,
                        float(b[-1]) if b else 0.0,
                        # multiply, not **2: bit-identical to the SQL oracle's
                        # (x-mean)*(x-mean) without leaning on pow() rounding
                        sum((x - mean) * (x - mean) for x in s) / len(s),
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling (video-style 1 → N row expansion)
# ---------------------------------------------------------------------------

FRAME_BYTES = 100   # stand-in frame size
FRAME_STRIDE = 3    # keep every 3rd frame
MAX_FRAMES = 8      # per-payload output cap
FRAME_MS = 40       # fake 25 fps timestamping

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Video-style frame sampling plumbing (X4): each payload expands to ≤
    MAX_FRAMES rows — every FRAME_STRIDE-th FRAME_BYTES-sized slice, stamped
    with a frame index and a fake capture timestamp. This is the 1→N
    mapInPandas expansion a real video pipeline runs (demux → keyframe
    sample), with a deterministic byte-slicer standing in for the codec:
    swap the slicing for an ffmpeg/pyav call and the plan, schema, batching
    and output cap all stay. Emits the frame HASH, not the bytes — at 100 TB
    the sampled frames land in object storage and only references flow on.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "ts_ms", "frame_len", "frame_hash")}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                n_frames = len(b) // FRAME_BYTES
                kept = range(0, n_frames, FRAME_STRIDE)
                for rank, idx in enumerate(kept):
                    if rank >= MAX_FRAMES:
                        break
                    frame = b[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(idx * FRAME_MS)
                    out["frame_len"].append(len(frame))
                    out["frame_hash"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (image-style fixed-grid downsampling)
# ---------------------------------------------------------------------------

RESIZE_GRID = 16  # stand-in "thumbnail" side: payload → 16 sampled bytes

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("thumb", ArrayType(DoubleType())),
        StructField("thumb_hash", StringType()),
    ]
)


def resize_payloads(df: DataFrame) -> DataFrame:
    """Image-resize plumbing (X4): each payload downsamples to a fixed
    RESIZE_GRID-point grid by nearest-neighbor sampling at evenly spaced
    byte offsets (offset k·n/G for k in 0..G-1) — the access pattern, fixed
    output shape, and bounded per-row cost of a real thumbnailer, with byte
    sampling standing in for pixel interpolation. Swap the body for a
    PIL/libvips resize and the mapInPandas boundary, schema and batching
    stay. Emits the grid as doubles (model-input-shaped) plus a hash of the
    sampled bytes for downstream exact dedup of thumbnails."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs, hashes = [], []
            for buf in pdf["payload"]:
                b = bytes(buf)
                n = len(b)
                if n == 0:
                    sampled = bytes(RESIZE_GRID)
                else:
                    sampled = bytes(b[(k * n) // RESIZE_GRID] for k in range(RESIZE_GRID))
                thumbs.append([float(x) for x in sampled])
                hashes.append(hashlib.md5(sampled).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "thumb": thumbs,
                    "thumb_hash": hashes,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
