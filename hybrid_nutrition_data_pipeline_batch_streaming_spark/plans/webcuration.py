"""Web-corpus curation: URL parsing, canonicalization dedup, per-domain
quotas, multi-snapshot novelty, and encoding-corruption scoring.

These are the standard pre-LLM web-pipeline stages (CCNet / RefinedWeb /
Dolma style) that operate on the *provenance* of a document rather than its
prose: parse the URL, canonicalize it, cap how much any one domain may
contribute, measure how much of each crawl snapshot is genuinely new, and
drop pages whose bytes were mis-decoded. The fixture corpus has no URL
column, so each query *constructs* one deterministically from
(doc_id, source, lang) with the same SQL expression on both engines — the
parsing/normalization logic under test is identical to what runs on a real
crawl, and stays 100 % JVM-side (``parse_url`` + regex, no Python).

Scale: every query here is map-only plus at most one keyed shuffle on a
domain/content-key column with bounded cardinality — the exact shape that
survives a 100 TB crawl (domains and snapshot keys are small relative to
pages; no all-pairs stage anywhere).

Reference parity: the reference pipeline keys its items by a synthetic
``item_id`` and enriches rows one service at a time
(`producer/produce_items.py:31-49`); this module is the engine-side
generalization of that provenance handling to web-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from .registry import query


def _url_sql(cast: str) -> str:
    """The deterministic URL expression, identical in Spark SQL and DuckDB.

    Variants are keyed off doc_id so canonicalization has real work to do:
    a casing variant (WWW.), a port variant (:8080), a trailing-slash +
    tracking-params variant, and a plain ?id= variant. Page numbers repeat
    every 50 ids so distinct URLs collapse onto shared canonical targets.
    """
    return f"""
        'https://' || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
        || source || '.example.com'
        || CASE WHEN doc_id % 3 = 0 THEN ':8080' ELSE '' END
        || '/' || lang || '/page-' || CAST(doc_id % 50 AS {cast})
        || CASE WHEN doc_id % 2 = 0
                THEN '/?utm_source=feed&ref=' || CAST(doc_id % 5 AS {cast})
                ELSE '?id=' || CAST(doc_id AS {cast}) END
    """


# ---------------------------------------------------------------------------
# URL parsing functions (F-surface: parse_url)
# ---------------------------------------------------------------------------

@query(
    "url_parse_funcs",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_url_sql('VARCHAR')} AS url FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/:]+)', 1)      AS host,
           regexp_extract(url, '^https://[^/?]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)                AS query_str,
           NULLIF(regexp_extract(url, '[?&]ref=([^&]*)', 1), '') AS ref_param,
           regexp_extract(url, '^([a-z]+)://', 1)            AS protocol
    FROM u
    """,
)
def url_parse_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction via Spark's native ``parse_url`` — HOST
    (case-preserving, port-stripped), PATH (leading slash kept), full QUERY,
    a single query parameter (NULL when absent), and PROTOCOL. Map-only,
    whole-stage-codegen, zero shuffle — linear at crawl scale."""
    cat = Catalog(spark, sf_dir)
    u = cat.documents.select("doc_id", F.expr(_url_sql("STRING")).alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_str"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + first-seen-wins dedup
# ---------------------------------------------------------------------------

_CANON_DUCK = """
    lower(regexp_replace(regexp_extract(url, '^https://([^/:]+)', 1),
                         '^WWW\\.', ''))
    || rtrim(regexp_extract(url, '^https://[^/?]+(/[^?]*)', 1), '/')
"""


@query(
    "url_canonical_dedup",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_url_sql('VARCHAR')} AS url FROM documents)
    SELECT {_CANON_DUCK} AS canonical_url,
           MIN(doc_id)   AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_variants
    FROM u
    GROUP BY 1
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (the CCNet "same page, many URLs" rule):
    lowercase the host, strip the ``www.`` prefix and the port, drop the
    query string entirely, trim the trailing slash — then keep the
    first-seen document per canonical URL. One hash-aggregate shuffle on the
    canonical key; casing/port/tracking variants collapse map-side, so the
    shuffle carries one row per *canonical* URL, not per page."""
    cat = Catalog(spark, sf_dir)
    u = cat.documents.select("doc_id", F.expr(_url_sql("STRING")).alias("url"))
    canon = F.concat(
        F.regexp_replace(
            F.lower(F.parse_url("url", F.lit("HOST"))), "^www\\.", ""
        ),
        F.expr("TRIM(TRAILING '/' FROM parse_url(url, 'PATH'))"),
    )
    return (
        u.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_variants"),
        )
    )


# ---------------------------------------------------------------------------
# Per-domain contribution caps
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 10


@query(
    "url_domain_caps",
    oracle=f"""
    WITH u AS (
        SELECT doc_id, n_chars, {_url_sql('VARCHAR')} AS url FROM documents
    ), ranked AS (
        SELECT lower(regexp_replace(regexp_extract(url, '^https://([^/:]+)', 1),
                                    '^WWW\\.', '')) AS domain,
               n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lower(regexp_replace(
                       regexp_extract(url, '^https://([^/:]+)', 1), '^WWW\\.', ''))
                   ORDER BY n_chars DESC, doc_id ASC
               ) AS rk
        FROM u
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT)                               AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk >  {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM ranked
    GROUP BY domain
    """,
)
def url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution quota (RefinedWeb's anti-SEO-farm rule): rank
    each domain's pages by a quality proxy (n_chars DESC, doc_id tiebreak)
    and admit at most {cap} pages per domain. The window partitions by domain
    and the audit aggregate groups by the same key, so Spark reuses the one
    exchange — a single shuffle keyed on domain regardless of corpus size;
    skewed mega-domains are exactly what the cap truncates.""".replace(
        "{cap}", str(_DOMAIN_CAP)
    )
    cat = Catalog(spark, sf_dir)
    u = cat.documents.select(
        "doc_id", "n_chars", F.expr(_url_sql("STRING")).alias("url")
    )
    domain = F.regexp_replace(
        F.lower(F.parse_url("url", F.lit("HOST"))), "^www\\.", ""
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    kept = F.col("rk") <= _DOMAIN_CAP
    return (
        u.select("doc_id", "n_chars", domain.alias("domain"))
        .withColumn("rk", F.row_number().over(w))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-snapshot novelty (CommonCrawl-style first-seen-wins)
# ---------------------------------------------------------------------------

@query(
    "dedup_snapshots",
    oracle="""
    WITH keyed AS (
        SELECT CAST(substr(source, 4) AS INT) AS snap_no,
               md5(substr(text, 1, 10))       AS content_key
        FROM documents
    ), firsts AS (
        SELECT content_key, MIN(snap_no) AS first_snap
        FROM keyed GROUP BY content_key
    )
    SELECT k.snap_no,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(COUNT(DISTINCT k.content_key) AS BIGINT) AS n_keys,
           CAST(COUNT(DISTINCT CASE WHEN f.first_snap = k.snap_no
                                    THEN k.content_key END) AS BIGINT) AS n_new_keys
    FROM keyed k JOIN firsts f USING (content_key)
    GROUP BY k.snap_no
    """,
)
def dedup_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot novelty audit (the CommonCrawl dedup bookkeeping):
    treat each source as a crawl snapshot ordered by its numeric suffix, key
    every page by a content fingerprint, and report per snapshot how many
    distinct keys appear and how many are globally NEW (first seen in that
    snapshot). First-seen-wins is a min() over the content key — the window
    variant of exact dedup that lets incremental crawls skip re-ingesting
    pages already held. Two shuffles, both on content_key (the min-agg and
    the join back); at 100 TB the firsts side is the store's key manifest."""
    cat = Catalog(spark, sf_dir)
    keyed = cat.documents.select(
        F.substring("source", 4, 10).cast("int").alias("snap_no"),
        F.md5(F.substring("text", 1, 10)).alias("content_key"),
    )
    firsts = keyed.groupBy("content_key").agg(F.min("snap_no").alias("first_snap"))
    return (
        keyed.join(firsts, "content_key")
        .groupBy("snap_no")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("content_key").alias("n_keys"),
            F.countDistinct(
                F.when(F.col("first_snap") == F.col("snap_no"), F.col("content_key"))
            ).alias("n_new_keys"),
        )
    )


# ---------------------------------------------------------------------------
# Encoding-corruption (mojibake) scoring
# ---------------------------------------------------------------------------

# U+FFFD is the replacement character a lossy decode leaves behind; ESC is a
# representative control char. Injected deterministically (the fixture prose
# is clean) so the detector has real positives at every SF.
_BAD = "�"


def _inject_sql(cast: str) -> str:
    return f"""
        text || CASE doc_id % 6
            WHEN 0 THEN ' x' || repeat('{_BAD[0]}', CAST(1 + doc_id % 3 AS INT))
            WHEN 1 THEN ' y{_BAD[1]}z{_BAD[1]}'
            ELSE ''
        END
    """


@query(
    "mojibake_score",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_inject_sql('VARCHAR')} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[{_BAD}]')) AS INT) AS n_bad,
           CAST(CAST(len(regexp_extract_all(text, '[{_BAD}]')) AS BIGINT)
                * 1000000 // length(text) AS BIGINT) AS bad_ppm,
           len(regexp_extract_all(text, '[{_BAD}]')) = 0 AS keep
    FROM raw
    """,
)
def mojibake_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-corruption filter (ftfy-class gate): count replacement /
    control characters per document, score the corruption in integer ppm of
    the character length, and keep only clean pages. The fixture text is
    clean, so corruption is injected deterministically by doc_id — the
    detection regex is the real thing. Map-only, zero shuffle; the char
    class extends to the full C0/C1 + noncharacter ranges in production."""
    cat = Catalog(spark, sf_dir)
    raw = cat.documents.select(
        "doc_id", F.expr(_inject_sql("STRING")).alias("text")
    )
    n_bad = F.regexp_count("text", F.lit(f"[{_BAD}]"))
    return raw.select(
        "doc_id",
        n_bad.cast("int").alias("n_bad"),
        F.expr(
            f"CAST(regexp_count(text, '[{_BAD}]') AS BIGINT) * 1000000"
            " DIV length(text)"
        ).alias("bad_ppm"),
        (n_bad == 0).alias("keep"),
    )
