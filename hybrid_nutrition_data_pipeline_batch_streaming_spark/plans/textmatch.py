"""Approximate string matching + higher-order array depth (F1/F5 family
extensions).

``fuzzy_match_names`` is the edit-distance flavor of the dedup suite: where
MinHash/SimHash block on content sketches, entity-style matching blocks on
cheap prefixes and verifies with Levenshtein — the standard shape for
vocabulary/entity reconciliation. ``higher_order_funcs`` rounds out the
lambda-function surface (exists / forall / filter / sort / distinct) that
§2.8 F5 opened with transform/aggregate/zip_with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from .registry import query


@query(
    "fuzzy_match_names",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM n a JOIN n b
      ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching over the part-name vocabulary: dedupe to
    distinct names first (the vocabulary is tiny relative to the fact
    table — the right granularity for entity matching), equi-join on a
    first-character block so candidate pairs stay bounded, then verify
    with exact Levenshtein ≤ 3. Never an unblocked n² over rows: the
    distinct() collapses 20k rows to 64 names before any pairing. At
    100 TB the block key graduates to (length bucket, prefix/phonetic
    code) with the identical plan shape."""
    cat = Catalog(spark, sf_dir)
    names = cat.part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
            & (F.col("name_a") < F.col("name_b")),
        )
        .where(dist <= 3)
        .select("name_a", "name_b", dist.alias("dist"))
    )


@query(
    "higher_order_funcs",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS ts
        FROM documents
    )
    SELECT doc_id,
           len(list_filter(ts, t -> length(t) > 6)) AS long_tokens,
           list_bool_or(list_transform(ts, t -> t = 'the')) AS has_the,
           list_bool_and(list_transform(ts, t -> length(t) > 1))
               AS all_multichar,
           array_to_string(list_sort(ts)[1:3], ',') AS first3_sorted,
           len(list_distinct(ts)) AS distinct_tokens
    FROM toks
    """,
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda surface beyond transform/aggregate/zip_with
    (F5): exists / forall / filter / sort_array / array_distinct, all
    evaluated inside one codegen'd projection — the token array never
    leaves the row, no explode, no shuffle. Sorting is binary-collation
    in both engines, so the joined first-3 sample is hash-stable."""
    cat = Catalog(spark, sf_dir)
    ts = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    toks = cat.documents.select("doc_id", ts.alias("ts"))
    return toks.select(
        "doc_id",
        F.size(F.filter("ts", lambda t: F.length(t) > 6)).alias("long_tokens"),
        F.exists("ts", lambda t: t == F.lit("the")).alias("has_the"),
        F.forall("ts", lambda t: F.length(t) > 1).alias("all_multichar"),
        F.array_join(F.slice(F.sort_array("ts"), 1, 3), ",").alias("first3_sorted"),
        F.size(F.array_distinct("ts")).alias("distinct_tokens"),
    )
