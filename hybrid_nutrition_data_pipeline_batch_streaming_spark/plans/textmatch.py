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
from ..session import checkpoint_truncate
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


_ER_PAIRS = """
    WITH n AS (SELECT DISTINCT p_name FROM part),
    pairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM n a JOIN n b
          ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    )
"""


@query(
    "er_golden_records",
    oracle=f"""
    {_ER_PAIRS},
    ids AS (
        SELECT p_name, MIN(p_partkey) AS id FROM part GROUP BY p_name
    ),
    und AS (
        SELECT ia.id AS src, ib.id AS dst
        FROM pairs JOIN ids ia ON ia.p_name = pairs.name_a
                   JOIN ids ib ON ib.p_name = pairs.name_b
        UNION ALL
        SELECT ib.id AS src, ia.id AS dst
        FROM pairs JOIN ids ia ON ia.p_name = pairs.name_a
                   JOIN ids ib ON ib.p_name = pairs.name_b
    ),
    comp AS (
        WITH RECURSIVE walk(node, reach) AS (
            SELECT id, id FROM ids
            UNION
            SELECT w.node, u.dst FROM walk w JOIN und u ON u.src = w.reach
        )
        SELECT node, MIN(reach) AS rep FROM walk GROUP BY node
    ),
    ranked AS (
        SELECT c.rep, p.p_partkey, p.p_name, p.p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY c.rep
                   ORDER BY p.p_retailprice DESC, p.p_partkey ASC) AS rk,
               COUNT(*) OVER (PARTITION BY c.rep) AS n_records,
               COUNT(DISTINCT p.p_name) OVER (PARTITION BY c.rep) AS n_names
        FROM part p JOIN ids i ON i.p_name = p.p_name
                    JOIN comp c ON c.node = i.id
    )
    SELECT rep AS cluster_rep,
           CAST(n_records AS BIGINT)  AS n_records,
           CAST(n_names AS BIGINT)    AS n_names,
           p_partkey                  AS golden_partkey,
           p_name                     AS golden_name,
           p_retailprice              AS golden_price
    FROM ranked WHERE rk = 1
    """,
)
def er_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (master-data management): block + fuzzy
    match the name vocabulary (``fuzzy_match_names``'s edge set), close the
    match graph into entity clusters (min-label connected components — the
    same ``operators``-backed propagation the dedup suite uses, here over
    STRING nodes), then elect one golden record per entity by survivorship
    rule (highest retail price, stable key tiebreak). This is the
    vocabulary-granularity pattern: matching runs on distinct names (tiny),
    and only the final attachment join touches the record table — at 100 TB
    the record side is one broadcast-ish equi-join on name, never pairwise.
    String match keys map to dense NUMERIC node ids (min record key per
    name) before label propagation — the CC operator's O(1) convergence
    test requires numeric labels and rejects strings loudly. The
    survivorship window and the cluster-size counts share one cluster-rep
    exchange."""
    from .graph import connected_components

    cat = Catalog(spark, sf_dir)
    # Persisted: the name→id vocabulary feeds both pair-endpoint joins, the
    # CC node seed AND the record attachment — uncached, the part scan +
    # name aggregate ran three more times. Name-cardinality cache.
    # r12: eager cut (was a lazy persist) — both pair-endpoint joins, the
    # CC seed and the record attachment raced to fill it (2.23 → 1.52 s).
    ids = checkpoint_truncate(
        cat.part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    )
    pairs = (
        fuzzy_match_names(spark, sf_dir)
        .join(ids.select(F.col("p_name").alias("name_a"), F.col("id").alias("doc_a")), "name_a")
        .join(ids.select(F.col("p_name").alias("name_b"), F.col("id").alias("doc_b")), "name_b")
        .select("doc_a", "doc_b")
    )
    labels = connected_components(
        ids.select(F.col("id").alias("doc_id")), pairs
    ).select(F.col("doc_id").alias("id"), "cluster_rep")
    from pyspark.sql.window import Window as _W

    attached = cat.part.join(ids, "p_name").join(labels, "id")
    w_rank = _W.partitionBy("cluster_rep").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    w_all = _W.partitionBy("cluster_rep")
    return (
        attached.withColumn("rk", F.row_number().over(w_rank))
        .withColumn("n_records", F.count("*").over(w_all))
        .withColumn(
            "n_names", F.size(F.collect_set("p_name").over(w_all)).cast("long")
        )
        .where(F.col("rk") == 1)
        .select(
            "cluster_rep",
            F.col("n_records").cast("long").alias("n_records"),
            "n_names",
            F.col("p_partkey").alias("golden_partkey"),
            F.col("p_name").alias("golden_name"),
            F.col("p_retailprice").alias("golden_price"),
        )
    )
