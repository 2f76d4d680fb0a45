"""Multimodal column queries (SURVEY.md §2.11 X4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.multimodal import attach_payload, decode_features
from .registry import query


@query(
    "mm_metadata",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (X4): the JVM-side half of
    the multimodal row — filter/route on metadata without touching bytes."""
    cat = Catalog(spark, sf_dir)
    return attach_payload(cat.documents).select(
        "doc_id", "modality", "n_bytes", "content_hash"
    )


@query("mm_decode_features")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extraction plumbing (X4): binary payload →
    fixed-width feature vector via mapInPandas. The decode body is the
    documented stub (operators/multimodal.py) — plan shape, schema and
    batching are the real thing. Python-side output → rows-only check."""
    cat = Catalog(spark, sf_dir)
    return decode_features(attach_payload(cat.documents))
