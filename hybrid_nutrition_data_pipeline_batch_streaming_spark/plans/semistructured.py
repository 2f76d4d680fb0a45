"""Semi-structured JSON handling + scalar function library.

SURVEY.md §2.2 (P2–P5), §2.8 (F1–F7), §2.9 (T8). This is the reference's
transform op (`dagster_project/pipeline.py:43-78` — json.loads, take [0],
flatten, cast-with-default) rebuilt as narrow, codegen-friendly column
expressions: `from_json` + struct access instead of per-record Python, so the
whole path stays inside whole-stage codegen and scales linearly with input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from .registry import query

# events.props is a JSON object string like '{"k": 87}' (FIXTURES.md).
PROPS_SCHEMA = "k BIGINT"


def _mangled_data(cat: Catalog) -> DataFrame:
    """Synthesize the raw layer's dirty `data` column from events.props.

    Mirrors the failure modes of `items_raw.data` the reference defends
    against (`pipeline.py:27-32`, `consume_items.py:99-100`): NULL, the
    processed marker '[]', and malformed JSON — deterministically derived
    from event_id so the DuckDB oracle can reproduce the exact same rows.
    """
    e = F.col("event_id") % 7
    return cat.events.withColumn(
        "data",
        F.when(e == 0, F.lit(None).cast("string"))
        .when(e == 1, F.lit("[]"))
        .when(e == 2, F.substring(F.col("props"), 1, 3))
        .otherwise(F.col("props")),
    )


_MANGLED_SQL = """
        SELECT event_id, props,
               CASE event_id % 7
                   WHEN 0 THEN NULL
                   WHEN 1 THEN '[]'
                   WHEN 2 THEN substr(props, 1, 3)
                   ELSE props
               END AS data
        FROM events
"""


@query(
    "filter_nonempty",
    oracle=f"""
    WITH raw AS ({_MANGLED_SQL})
    SELECT event_id, data
    FROM raw
    WHERE data IS NOT NULL AND data <> '[]' AND json_valid(data)
    """,
)
def filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop null / processed-marker / unparseable raw rows (P2/P3 —
    `pipeline.py:27-32`, `consume_items.py:99-100`). Parse-validity via
    `from_json` returning NULL in PERMISSIVE mode, not a Python loop."""
    cat = Catalog(spark, sf_dir)
    raw = _mangled_data(cat)
    # get_json_object(x, '$') is NULL iff x is not valid JSON — the exact
    # twin of DuckDB's json_valid() (from_json PERMISSIVE instead yields a
    # null-fielded struct for malformed input, not NULL).
    return raw.where(
        F.col("data").isNotNull()
        & (F.col("data") != "[]")
        & F.get_json_object(F.col("data"), "$").isNotNull()
    ).select("event_id", "data")


@query(
    "filter_corrupt",
    oracle=f"""
    WITH raw AS ({_MANGLED_SQL})
    SELECT CASE
               WHEN data IS NULL THEN 'missing'
               WHEN data = '[]' THEN 'processed'
               WHEN NOT json_valid(data) THEN 'corrupt'
               ELSE 'ok'
           END AS record_class,
           COUNT(*) AS cnt
    FROM raw
    GROUP BY 1
    """,
)
def filter_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine classification of corrupt records (T8) — the streaming
    skip-and-continue path (`consume_items.py:109-111`, `pipeline.py:76-77`)
    as an auditable PERMISSIVE-parse split instead of silent drops."""
    cat = Catalog(spark, sf_dir)
    raw = _mangled_data(cat)
    cls = (
        F.when(F.col("data").isNull(), F.lit("missing"))
        .when(F.col("data") == "[]", F.lit("processed"))
        .when(F.get_json_object(F.col("data"), "$").isNull(), F.lit("corrupt"))
        .otherwise(F.lit("ok"))
    )
    return raw.groupBy(cls.alias("record_class")).agg(F.count("*").alias("cnt"))


@query(
    "json_flatten",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field promotion to typed columns (F4/U3/P4) — the reference's
    dynamic flatten (`pipeline.py:50-57`) via `from_json` + struct access,
    a single codegen'd projection."""
    cat = Catalog(spark, sf_dir)
    return cat.events.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k"),
    )


@query(
    "variant_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
           json_extract_string(props, '$.tag') AS tag,
           (json_extract_string(props, '$.tag') IS NOT NULL) AS has_tag
    FROM events
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type (the lakehouse
    answer to the reference's JSON-in-a-string raw layer, §1.1): parse
    once with `parse_json`, then typed `try_variant_get` extractions —
    missing paths and type mismatches yield NULL, the reference's
    defensive `.get` semantics. VARIANT's binary encoding makes repeated
    path access cheaper than re-parsing the string per expression, the
    right storage shape for a 100 TB raw layer; the VARIANT column itself
    stays internal (extractions project to ordinary types), so the plan
    ends schema-stable."""
    cat = Catalog(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    tag = F.try_variant_get(v, "$.tag", "string")
    return cat.events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.k", "double").alias("k_dbl"),
        tag.alias("tag"),
        tag.isNotNull().alias("has_tag"),
    )


@query(
    "cast_defaults",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS k_val,
           COALESCE(json_extract_string(props, '$.tag'), '') AS tag
    FROM events
    """,
)
def cast_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast-with-default per column (P5/F7): the reference's
    `float(rec.get(k, 0))` / `str(rec.get(k, ""))` (`pipeline.py:113-129`)
    as `coalesce(try_cast(...), default)`."""
    cat = Catalog(spark, sf_dir)
    return cat.events.select(
        "event_id",
        F.coalesce(
            F.get_json_object(F.col("props"), "$.k").try_cast("double"), F.lit(0.0)
        ).alias("k_val"),
        F.coalesce(F.get_json_object(F.col("props"), "$.tag"), F.lit("")).alias("tag"),
    )


# ---------------------------------------------------------------------------
# §2.8 — scalar function families
# ---------------------------------------------------------------------------


@query(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                       AS brand_u,
           lower(p_type)                        AS type_l,
           trim(p_name)                         AS name_trim,
           p_brand || ':' || p_type             AS brand_type,
           substr(p_name, 1, 5)                 AS name5,
           CAST(length(p_name) AS INT)          AS name_len,
           replace(p_name, ' ', '_')            AS name_us,
           regexp_extract(p_name, '([a-z]+)', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
           regexp_matches(p_type, '^ECO')                   AS is_economy,
           CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS INT) AS word_cnt
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (F1 — the reference's encode/strip/f-string
    surface, `produce_items.py:23,35`, `pipeline.py:60-63`) plus the regex
    subfamily (extract / global replace / match-test, patterns kept to the
    Java∩RE2 common subset) — one codegen'd projection carries the whole
    F1 correctness row; `regexp_funcs` stays registered as the standalone
    variant."""
    cat = Catalog(spark, sf_dir)
    return cat.part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.trim("p_name").alias("name_trim"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("^ECO").alias("is_economy"),
        (F.length(F.regexp_replace(F.col("p_name"), "[^ ]", "")) + 1).alias("word_cnt"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                        AS odate,
           CAST(year(o_orderdate) AS INT)                   AS oyear,
           CAST(month(o_orderdate) AS INT)                  AS omonth,
           CAST(dayofmonth(o_orderdate) AS INT)             AS oday,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS omonth_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
                                                            AS days_since_epoch,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY          AS due_ts,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)    AS month_end,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH         AS quarter_later,
           CAST(date_part('dow', o_orderdate) AS INT)           AS dow,
           CAST(date_part('quarter', o_orderdate) AS INT)       AS oquarter
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (F2 — ingestion stamps at
    `consume_items.py:103`, ts handling at `pipeline.py:114`) plus the
    date-arithmetic subfamily (interval addition, month-end, day-of-week,
    quarter); `date_arith_funcs` stays registered as the standalone
    variant."""
    cat = Catalog(spark, sf_dir)
    odate = F.col("o_orderdate").cast("date")
    return cat.orders.select(
        "o_orderkey",
        odate.alias("odate"),
        F.year("o_orderdate").alias("oyear"),
        F.month("o_orderdate").alias("omonth"),
        F.dayofmonth("o_orderdate").alias("oday"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("omonth_start"),
        F.datediff(odate, F.lit("1995-01-01").cast("date")).alias("days_since_epoch"),
        F.date_add(odate, 30).cast("timestamp_ntz").alias("due_ts"),
        F.last_day(odate).alias("month_end"),
        F.add_months(odate, 3).cast("timestamp_ntz").alias("quarter_later"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.quarter("o_orderdate").alias("oquarter"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))
                AS DOUBLE)                          AS tithe,
           round(l_discount * 100)                  AS disc_pct,
           abs(l_discount - 0.05)                   AS disc_dev,
           greatest(l_quantity, 25.0)               AS q_floor25,
           least(l_tax, l_discount)                 AS min_rate,
           CAST(floor(l_quantity) AS BIGINT)        AS q_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)    AS price_ceil,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_disc,
           TRY_CAST(l_returnflag AS DOUBLE)           AS flag_num,
           COALESCE(TRY_CAST(l_returnflag AS DOUBLE), -1.0) AS flag_num_dflt
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (F3 — float casts and default-0 arithmetic,
    `pipeline.py:115-125`; per-100g ratio `README.md:42`) plus the
    error-safe try_divide/try_cast subfamily (F7, the reference's
    try/except defaults at `pipeline.py:115-129`); `try_funcs` stays
    registered as the standalone variant."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        # Exact decimal product (no scale-down: engines disagree on decimal
        # rescale tie-breaking; double round() ties likewise) — then round()
        # demonstrated on a tie-free near-integer value.
        (F.col("l_extendedprice").cast("decimal(12,2)") * F.lit("0.1").cast("decimal(2,1)"))
        .cast("double")
        .alias("tithe"),
        F.round(F.col("l_discount") * 100).alias("disc_pct"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("q_floor25"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
        F.floor(F.col("l_quantity")).alias("q_floor"),
        F.ceil(F.col("l_extendedprice")).cast("bigint").alias("price_ceil"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        F.col("l_returnflag").try_cast("double").alias("flag_num"),
        F.coalesce(F.col("l_returnflag").try_cast("double"), F.lit(-1.0)).alias(
            "flag_num_dflt"
        ),
    )


@query(
    "regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1)            AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
           regexp_matches(p_type, '^ECO')                   AS is_economy,
           CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS INT) AS word_cnt
    FROM part
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family (F1 extension): extract / global replace /
    match-test — patterns kept to the Java∩RE2 common subset so both
    engines agree."""
    cat = Catalog(spark, sf_dir)
    return cat.part.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("^ECO").alias("is_economy"),
        (
            F.length(F.regexp_replace(F.col("p_name"), "[^ ]", "")) + 1
        ).alias("word_cnt"),
    )


@query(
    "date_arith_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY          AS due_ts,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)    AS month_end,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH         AS quarter_later,
           CAST(date_part('dow', o_orderdate) AS INT)           AS dow,
           CAST(date_part('quarter', o_orderdate) AS INT)       AS oquarter
    FROM orders
    """,
)
def date_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family (F2 extension): interval addition, month-end,
    day-of-week, quarter — the reporting-calendar toolkit."""
    cat = Catalog(spark, sf_dir)
    odate = F.col("o_orderdate").cast("date")
    return cat.orders.select(
        "o_orderkey",
        F.date_add(odate, 30).cast("timestamp_ntz").alias("due_ts"),
        F.last_day(odate).alias("month_end"),
        F.add_months(odate, 3).cast("timestamp_ntz").alias("quarter_later"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.quarter("o_orderdate").alias("oquarter"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregation): the order carrying each group's
    extreme price — one pass, no self-join back to find the extreme row."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1]                AS first_val,
           list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                       (a, b) -> a + b) AS sq_norm
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function family (F5): size, element access, and a
    fold — the JVM-side building blocks of the vector ops in §2.11. The fold
    accumulates left-to-right in both engines, so the double sum is
    bit-identical."""
    cat = Catalog(spark, sf_dir)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return cat.embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.aggregate(
            F.transform(emb_d, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_norm"),
    )


@query(
    "explode_outer_tokens",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> len(x) > 7) AS arr
        FROM documents
    )
    SELECT doc_id, u.tok
    FROM t, UNNEST(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS u(tok)
    """,
)
def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer vs explode (the flatten null-semantics corner, F5/U3):
    a row whose array is EMPTY survives outer explosion with a NULL element
    where plain explode silently drops it — the difference between "this
    document has no long tokens" being a fact in the output and the
    document vanishing from a report. The length-8 filter leaves most docs
    non-empty and a meaningful minority empty, so both branches are exercised; the
    DuckDB twin realizes OUTER via the [NULL]-substitution rewrite (the
    portable form). Map-side generator, zero shuffle."""
    cat = Catalog(spark, sf_dir)
    arr = F.filter(F.split(F.col("text"), " "), lambda x: F.length(x) > 7)
    return cat.documents.select(
        "doc_id", F.explode_outer(arr).alias("tok")
    )


@query(
    "xml_roundtrip_flatten",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
           CAST(strftime(CAST(o_orderdate AS TIMESTAMP),
                         '%Y-%m-%d') AS VARCHAR) AS order_day
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def xml_roundtrip_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest surface (Spark 4 native `from_xml` — the remaining
    semi-structured dialect next to JSON and VARIANT; the reference's raw
    layer stores whatever text the upstream API returns, SURVEY §1.3, and
    B2B feeds are still XML). Proven as a round trip: each order renders
    to an XML document string, `from_xml` parses it back against an
    explicit schema, and the oracle computes the same projection from the
    base columns directly — so the parse must reproduce values exactly
    (price re-read as decimal-exact double, day as a string field). Both
    render and parse are map-side JVM expressions; the filter prunes at
    the scan."""
    cat = Catalog(spark, sf_dir)
    xml = cat.orders.filter(F.expr("o_orderkey % 97 = 0")).select(
        "o_orderkey",
        F.expr(
            """
            concat('<order><status>', o_orderstatus, '</status>',
                   '<price>', CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                   AS STRING), '</price>',
                   '<order_day>', date_format(o_orderdate, 'yyyy-MM-dd'),
                   '</order_day></order>')
            """
        ).alias("doc"),
    )
    parsed = xml.select(
        "o_orderkey",
        F.expr(
            "from_xml(doc, 'status STRING, price DECIMAL(12,2),"
            " order_day STRING')"
        ).alias("s"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("s.status").alias("status"),
        F.col("s.price").cast("double").alias("price"),
        F.col("s.order_day").alias("order_day"),
    )
