"""Batch relational core: scans, filters, joins, aggregations, sorts, set ops.

Implements SURVEY.md §2.1–§2.4, §2.6–§2.7. The reference delegates all of
this to Cassandra/ClickHouse/Superset-SQL (SURVEY.md §2.3 intro;
`dagster_project/pipeline.py:19-24` is its only scan, `README.md:38-45` its
only aggregations); here each is a first-class Catalyst plan.

Scale notes baked into each query:
- filters/projections are plain DataFrame ops → pushed into the parquet scan
  (PushedFilters / ReadSchema) by Catalyst, nothing to hand-tune;
- dimension joins use an explicit ``broadcast()`` hint (region/nation/
  supplier/part stay < MBs at any SF, so no shuffle of the fact side);
- fact-fact joins shuffle on the join key and rely on AQE for skew;
- aggregate sums feeding the oracle hash use exact decimal (functions.parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..functions.parity import MONEY, QTY, RATE, dsum
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: the "dashboard" query — scan ⋈ ⋈, filter, group, agg, top-N.
# Mirrors the reference's Superset analytics path end-to-end (SURVEY.md §3.3).
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT o_orderkey) AS order_cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate  >  o_orderdate
    GROUP BY c_mktsegment
    ORDER BY revenue DESC
    """,
)
def flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment (TPC-H Q3 family).

    The Spark analog of the reference's Superset bar charts over the enriched
    fact table (`README.md:38-45`): fact ⋈ fact shuffle join on o_orderkey,
    customer side broadcast-eligible, decimal-exact revenue.
    """
    cat = Catalog(spark, sf_dir)
    revenue = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(RATE)
    )
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") > F.col("o_orderdate"))
        )
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_orderkey").alias("order_cnt"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"))
    )


_ENDPOINT_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
"""


@query("sql_endpoint", oracle=_ENDPOINT_SQL)
def sql_endpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytics SQL endpoint (S9, SURVEY.md §3.3): the reference serves
    dashboards through Superset-generated SQL against ClickHouse
    (`superset/superset_config.py:1-3`); here the SAME SQL text runs through
    ``spark.sql`` over registered views — one dialect for BI tools and the
    DataFrame API. The live socket form is ``serving.start_sql_endpoint``
    (embedded Thrift JDBC/ODBC server, wire-tested in
    tests/test_contract_and_sources.py)."""
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return spark.sql(_ENDPOINT_SQL)


# ---------------------------------------------------------------------------
# §2.1 / §2.2 — scans, projections, filters
# ---------------------------------------------------------------------------


@query(
    "scan_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + pushed filter (S3/P1; reference `pipeline.py:19-39` does
    this client-side after `ALLOW FILTERING` — here both reach the scan)."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range predicates (P6, TPC-H Q6 family)."""
    cat = Catalog(spark, sf_dir)
    lo = F.lit("1998-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-12-31").cast("timestamp_ntz")
    return cat.lineitem.where(
        F.col("l_shipdate").between(lo, hi)
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


@query(
    "filter_inlist",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus LIKE 'F%'
    """,
)
def filter_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE predicates (P6)."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").like("F%")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, planner-chosen strategy (J1)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("order_cnt"), dsum(F.col("o_totalprice")).alias("total_spend"))
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS line_cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS brand_rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly broadcast the part dimension (J2): no shuffle of the fact
    side — the 100 TB-critical strategy for star-schema dims."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("line_cnt"), dsum(F.col("l_extendedprice")).alias("brand_rev"))
    )


@query(
    "join_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (J3)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(cat.orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (J4): customers with at least one open order."""
    cat = Catalog(spark, sf_dir)
    open_orders = cat.orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return cat.customer.join(
        open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "incremental_antijoin",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    """,
)
def incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (J4) re-expressing the reference's incremental
    mark-processed consumption (S6, `pipeline.py:27-32,144-150`): unprocessed
    rows = raw minus processed-keys, one declarative anti-join instead of the
    reference's racy per-row read-modify-write."""
    cat = Catalog(spark, sf_dir)
    processed = cat.orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    return cat.lineitem.join(
        processed, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@query(
    "join_range",
    oracle="""
    WITH buckets AS (
        SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS bucket_start,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) + INTERVAL 6 MONTH AS bucket_end
        FROM orders
    )
    SELECT b.bucket_start,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS bucket_rev
    FROM orders o
    JOIN buckets b
      ON o.o_orderdate >= b.bucket_start AND o.o_orderdate < b.bucket_end
    GROUP BY b.bucket_start
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join (J5): orders vs overlapping 6-month windows that
    start each quarter. The bucket side is tiny and broadcast, so the
    BNLJ never materializes a driver-side product — the scale-safe shape
    for band/interval joins."""
    cat = Catalog(spark, sf_dir)
    buckets = (
        cat.orders.select(
            F.date_trunc("quarter", F.col("o_orderdate"))
            .cast("timestamp_ntz")
            .alias("bucket_start")
        )
        .distinct()
        .withColumn("bucket_end", F.col("bucket_start") + F.expr("INTERVAL 6 MONTH"))
    )
    return (
        cat.orders.join(
            F.broadcast(buckets),
            (F.col("o_orderdate") >= F.col("bucket_start"))
            & (F.col("o_orderdate") < F.col("bucket_end")),
        )
        .groupBy("bucket_start")
        .agg(
            F.count("*").alias("order_cnt"),
            dsum(F.col("o_totalprice")).alias("bucket_rev"),
        )
    )


@query(
    "join_asof",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ), s AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'signup'
    ), latest AS (
        SELECT p.event_id, MAX(s.ts) AS s_ts
        FROM p JOIN s ON s.user_id = p.user_id AND s.ts <= p.ts
        GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, p.ts, MAX(s.value) AS asof_value
    FROM p
    JOIN latest ON latest.event_id = p.event_id
    JOIN s ON s.user_id = p.user_id AND s.ts = latest.s_ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J7), batch emulation: each purchase event picks up the
    value of the latest signup at-or-before its timestamp, per user.

    Implemented the scale-safe way — union both sides, one window pass per
    user ordered by time (``last(..., ignorenulls)``), filter back to the
    probe side. One shuffle on user_id, no self-join blowup.
    """
    cat = Catalog(spark, sf_dir)
    from pyspark.sql.window import Window

    ev = cat.events
    unioned = (
        ev.where(F.col("event_type").isin("purchase", "signup"))
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.when(F.col("event_type") == "signup", F.col("value")).alias("signup_value"),
        )
    )
    # Signups sort before purchases at equal ts (inclusive as-of), and among
    # equal-ts signups the larger value sorts last to match MAX() in the SQL.
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1)),
            F.col("signup_value").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("asof_value", F.last("signup_value", ignorenulls=True).over(w))
        .where((F.col("event_type") == "purchase") & F.col("asof_value").isNotNull())
        .select("event_id", "user_id", "ts", "asof_value")
    )


@query(
    "join_star_5way",
    oracle="""
    SELECT n_name,
           COUNT(*) AS line_cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS nation_rev
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY nation_rev DESC
    """,
)
def join_star_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema chain join (J1/J2 composed, TPC-H Q5 family): one
    fact-fact shuffle join (lineitem ⋈ orders) and a broadcast chain through
    supplier → nation → region. The region filter propagates through the
    broadcast chain, so the fact scan is the only large input — the
    prototypical 100 TB star query."""
    cat = Catalog(spark, sf_dir)
    revenue = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(RATE)
    )
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(
            F.col("r_name").isin("ASIA", "EUROPE")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("line_cnt"),
            F.sum(revenue).cast("double").alias("nation_rev"),
        )
        .orderBy(F.desc("nation_rev"))
    )


# ---------------------------------------------------------------------------
# §2.4 — aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_macros",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 100 AS qty_per_100_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_macros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate (A1) + per-100 normalization (A2) — the Spark
    analog of the reference's "macros per 100 g" dashboard charts
    (`README.md:38-45`), shaped like TPC-H Q1. Partial (map-side) aggregation
    is automatic (A7)."""
    cat = Catalog(spark, sf_dir)
    qty_d = F.col("l_quantity").cast(QTY)
    price_d = F.col("l_extendedprice").cast(MONEY)
    disc_price = price_d * (F.lit(1) - F.col("l_discount").cast(RATE))
    return (
        cat.lineitem.where(
            F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_d).cast("double").alias("sum_qty"),
            F.sum(price_d).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(qty_d).cast("double") / F.count("l_quantity")).alias("avg_qty"),
            (
                F.sum(qty_d).cast("double") / F.sum(price_d).cast("double") * 100
            ).alias("qty_per_100_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "topk_sodium",
    oracle="""
    SELECT p_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_name
    ORDER BY total_rev DESC, p_name
    LIMIT 10
    """,
)
def topk_sodium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N by aggregate, descending (A3/O2) — the "sodium by item" chart
    (`README.md:43`). Spark plans TakeOrderedAndProject: only k rows cross
    the final exchange, never the full sorted set."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_name")
        .agg(dsum(F.col("l_extendedprice")).alias("total_rev"))
        .orderBy(F.desc("total_rev"), F.asc("p_name"))
        .limit(10)
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS nation_cnt,
           COUNT(*) AS customer_cnt
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (A5) — the distributed form of the
    producer's in-memory dedup set (`produce_items.py:48,58-59`)."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("nation_cnt"),
        F.count("*").alias("customer_cnt"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS line_cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-level aggregation (A6) — dashboard tab totals."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(QTY)).cast("double").alias("sum_qty"),
        F.count("*").alias("line_cnt"),
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS discounted_rev,
           COUNT(CASE WHEN l_quantity < 10 THEN 1 END) AS small_qty_cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (A8)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.sum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice").cast(MONEY)).otherwise(
                F.lit(0).cast(MONEY)
            )
        )
        .cast("double")
        .alias("discounted_rev"),
        F.count(F.when(F.col("l_quantity") < 10, F.lit(1))).alias("small_qty_cnt"),
    )


# ---------------------------------------------------------------------------
# §2.6 — sorts / top-K
# ---------------------------------------------------------------------------


@query(
    "sort_multikey",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
    FROM lineitem
    ORDER BY l_returnflag ASC, l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort + limit (O1) — the clustering order the
    reference delegates to MergeTree ``ORDER BY`` (`pipeline.py:105-107`).
    The (l_orderkey, l_linenumber) suffix makes the top-100 deterministic."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
        .orderBy(
            F.asc("l_returnflag"),
            F.desc("l_shipdate"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations
# ---------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — the hybrid batch/stream union of the reference
    architecture (`README.md:7-19`) in miniature."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(cat.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-06-30'
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      AND o_orderstatus LIKE 'F%'
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full P6 predicate family in one scan — date/value range (BETWEEN),
    IN-list, and LIKE prefix — all pushed into the parquet reader
    (PushedFilters shows every conjunct; a prefix LIKE compiles to
    StringStartsWith). Single map-only pass at any scale."""
    cat = Catalog(spark, sf_dir)
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-06-30").cast("timestamp_ntz")
    return cat.orders.where(
        F.col("o_orderdate").between(lo, hi)
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        & F.col("o_orderstatus").like("F%")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")


@query(
    "agg_rollup_cube",
    oracle="""
    SELECT 'rollup' AS mode, l_returnflag AS dim1, l_linestatus AS dim2,
           COUNT(*) AS grp_cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS mode, o_orderstatus AS dim1, o_orderpriority AS dim2,
           COUNT(*) AS grp_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE multi-level aggregation (A6) in one result: rollup
    over lineitem (hierarchy totals) tag-unioned with cube over orders (all
    2² grouping sets). Each branch is a single-pass grouping-sets expansion
    with map-side partials; the union is plan-level concatenation, not a
    shuffle."""
    cat = Catalog(spark, sf_dir)
    rollup_side = (
        cat.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("grp_cnt"),
            F.sum(F.col("l_quantity").cast(QTY)).cast("double").alias("total"),
        )
        .select(
            F.lit("rollup").alias("mode"),
            F.col("l_returnflag").alias("dim1"),
            F.col("l_linestatus").alias("dim2"),
            "grp_cnt",
            "total",
        )
    )
    cube_side = (
        cat.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("grp_cnt"),
            F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias("total"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.col("o_orderstatus").alias("dim1"),
            F.col("o_orderpriority").alias("dim2"),
            "grp_cnt",
            "total",
        )
    )
    return rollup_side.unionByName(cube_side)


@query(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, CAST(nationkey AS BIGINT) AS key FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'union_all' AS op, CAST(nationkey AS BIGINT) AS key FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, CAST(nationkey AS BIGINT) AS key FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, CAST(orderkey AS BIGINT) AS key FROM (
        SELECT o_orderkey AS orderkey FROM orders
        EXCEPT
        SELECT l_orderkey AS orderkey FROM lineitem)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four set operations (§2.7) tag-unioned into one result: UNION
    (distinct), UNION ALL (bag), INTERSECT, EXCEPT. Each distinct-flavored op
    is one hash-aggregate/join shuffle on the key; UNION ALL is shuffle-free
    concatenation. The per-op queries (set_union etc.) remain registered
    individually — this composite carries the driver correctness row."""
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.select(F.col("c_nationkey").cast("bigint").alias("key"))
    supp = cat.supplier.select(F.col("s_nationkey").cast("bigint").alias("key"))
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "key")  # noqa: E731
    return (
        tag(cust.union(supp).distinct(), "union")
        .unionByName(tag(cust.union(supp), "union_all"))
        .unionByName(tag(cust.intersect(supp), "intersect"))
        .unionByName(
            tag(
                cat.orders.select(F.col("o_orderkey").cast("bigint").alias("key"))
                .subtract(
                    cat.lineitem.select(F.col("l_orderkey").cast("bigint").alias("key"))
                ),
                "except",
            )
        )
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        cat.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_except",
    oracle="""
    SELECT o_orderkey AS orderkey FROM orders
    EXCEPT
    SELECT l_orderkey AS orderkey FROM lineitem
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT: orders with no line items (non-empty at every SF)."""
    cat = Catalog(spark, sf_dir)
    # subtract == EXCEPT DISTINCT (exceptAll would only remove one occurrence
    # per matching right row, which is EXCEPT ALL semantics).
    return cat.orders.select(F.col("o_orderkey").alias("orderkey")).subtract(
        cat.lineitem.select(F.col("l_orderkey").alias("orderkey"))
    )


@query(
    "set_except_all",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem
    EXCEPT ALL
    SELECT o_orderkey AS orderkey FROM orders
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, §2.7's bag form): lineitem order
    keys with per-key multiplicity reduced by the orders side — a key with
    5 line items and 1 order row survives 4 times, which DISTINCT except
    erases entirely. Spark plans the multiset form as an aggregate of
    signed counts (sum_v1 - sum_v2 per key), not a join-per-duplicate —
    one shuffle either way."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.select(F.col("l_orderkey").alias("orderkey")).exceptAll(
        cat.orders.select(F.col("o_orderkey").alias("orderkey"))
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem
    INTERSECT ALL
    SELECT o_orderkey AS orderkey FROM orders
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection): each order key appears
    min(count_lineitem, count_orders) times — the bag semantics audits use
    to reconcile row multiplicities across tables (DISTINCT intersect
    can't see a dropped duplicate)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.select(F.col("l_orderkey").alias("orderkey")).intersectAll(
        cat.orders.select(F.col("o_orderkey").alias("orderkey"))
    )


# ---------------------------------------------------------------------------
# Nearest as-of join (backward + forward, pick the closer match)
# ---------------------------------------------------------------------------

#: Nearest-match tolerance: clicks farther than this from the purchase (in
#: either direction) don't match.
ASOF_NEAREST_TOL_US = 86_400_000_000  # 1 day


@query(
    "join_asof_nearest",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
               event_type,
               CASE WHEN event_type = 'click'
                    THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS click_us
        FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
        SELECT user_id, event_id, t_us, event_type,
               last_value(click_us IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_us,
               first_value(click_us IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_us
        FROM ev
    ), p AS (
        SELECT CASE
                 WHEN prev_us IS NOT NULL
                      AND t_us - prev_us <= {ASOF_NEAREST_TOL_US}
                      AND (next_us IS NULL
                           OR next_us - t_us > {ASOF_NEAREST_TOL_US}
                           OR t_us - prev_us <= next_us - t_us)
                     THEN 'prev'
                 WHEN next_us IS NOT NULL
                      AND next_us - t_us <= {ASOF_NEAREST_TOL_US}
                     THEN 'next'
                 ELSE 'none'
               END AS direction,
               CASE
                 WHEN prev_us IS NOT NULL
                      AND t_us - prev_us <= {ASOF_NEAREST_TOL_US}
                      AND (next_us IS NULL
                           OR next_us - t_us > {ASOF_NEAREST_TOL_US}
                           OR t_us - prev_us <= next_us - t_us)
                     THEN t_us - prev_us
                 WHEN next_us IS NOT NULL
                      AND next_us - t_us <= {ASOF_NEAREST_TOL_US}
                     THEN next_us - t_us
                 ELSE 0
               END AS dist_us
        FROM w WHERE event_type = 'purchase'
    )
    SELECT direction,
           CAST(COUNT(*) AS BIGINT)     AS n_purchases,
           CAST(SUM(dist_us) AS BIGINT) AS total_dist_us,
           CAST(MAX(dist_us) AS BIGINT) AS max_dist_us
    FROM p GROUP BY direction
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join (the sensor-fusion variant of J7): each
    purchase matches the closest click in EITHER direction within a 1-day
    tolerance — backward-only as-of misattributes events that land just
    before their cause. Ties break backward (the causal default). Reported
    as the match census per direction with exact µs distances.

    Implemented the same scale-safe way as ``join_asof``: union both
    event kinds, ONE per-user window pass carrying the last click at-or-
    before and the first click at-or-after every row (both IGNORE NULLS
    frames share the same sort), then a map-side nearest pick — never the
    naive |purchases| × |clicks| range join, whose candidate set explodes
    with activity. One user-keyed exchange total; the census fold is
    3 rows."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_type",
        F.when(
            F.col("event_type") == "click",
            F.unix_micros(F.col("ts").cast("timestamp")),
        ).alias("click_us"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    scored = ev.select(
        "event_type",
        "t_us",
        F.last("click_us", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prev_us"),
        F.first("click_us", ignorenulls=True)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("next_us"),
    ).where(F.col("event_type") == "purchase")
    tol = ASOF_NEAREST_TOL_US
    prev_ok = F.col("prev_us").isNotNull() & (
        F.col("t_us") - F.col("prev_us") <= tol
    )
    next_ok = F.col("next_us").isNotNull() & (
        F.col("next_us") - F.col("t_us") <= tol
    )
    prev_wins = prev_ok & (
        ~next_ok
        | (F.col("t_us") - F.col("prev_us") <= F.col("next_us") - F.col("t_us"))
    )
    direction = (
        F.when(prev_wins, "prev").when(next_ok, "next").otherwise("none")
    )
    dist = (
        F.when(prev_wins, F.col("t_us") - F.col("prev_us"))
        .when(next_ok, F.col("next_us") - F.col("t_us"))
        .otherwise(F.lit(0))
    )
    return (
        scored.select(direction.alias("direction"), dist.alias("dist_us"))
        .groupBy("direction")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("dist_us").cast("long").alias("total_dist_us"),
            F.max("dist_us").cast("long").alias("max_dist_us"),
        )
    )
