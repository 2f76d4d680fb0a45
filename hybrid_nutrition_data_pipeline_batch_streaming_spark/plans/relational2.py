"""Second relational batch: cube, subqueries, UNION ALL, percentiles,
error-safe arithmetic (SURVEY.md §2.4 A6/A8, §2.7, §2.8 F3/F7 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.parity import MONEY
from .registry import query


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (A6): all 2² grouping sets in one pass —
    the dashboard "all tab totals" aggregation."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("order_cnt"),
        F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias("total_price"),
    )


@query(
    "filter_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(c_acctbal)
                       FROM customer)
    """,
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate: customers above the mean balance. The
    subquery aggregates once and broadcasts its single row into the filter
    (no per-row recomputation)."""
    cat = Catalog(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                                  / COUNT(c_acctbal)
                           FROM customer)
        """
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — the hybrid architecture's batch+stream
    concatenation (`README.md:7-19`) is exactly unionByName at scale."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    ).unionByName(
        cat.supplier.select(
            F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
        )
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)  AS median_qty,
           quantile_cont(l_quantity, 0.9)  AS p90_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (quantile bands of the nutrition
    dashboard, W4's aggregate cousin). Spark's percentile == DuckDB's
    quantile_cont (linear interpolation), so even the interpolated doubles
    hash-match."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("median_qty"),
        F.percentile(F.col("l_quantity"), F.lit(0.9)).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): status columns per return flag — the
    dashboard cross-tab. Spark's pivot plans the same single-pass
    conditional aggregation the oracle spells out."""
    cat = Catalog(spark, sf_dir)
    from pyspark.sql.types import DecimalType

    piv = (
        cat.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(DecimalType(12, 2))))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").cast("double").alias("qty_F"),
        F.col("O").cast("double").alias("qty_O"),
    )


@query(
    "unpivot_metrics",
    oracle="""
    SELECT o_orderkey, metric, value FROM (
        SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
    )
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): melt measure columns into (metric, value)
    rows — the long-format feed for generic metric dashboards. Spark's
    unpivot/stack is a zero-shuffle generator."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").cast("double").alias("custkey")
    ).unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "o_totalprice", "totalprice").otherwise(F.col("metric")),
    )


@query(
    "try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_disc,
           TRY_CAST(l_returnflag AS DOUBLE)           AS flag_num,
           COALESCE(TRY_CAST(l_returnflag AS DOUBLE), -1.0) AS flag_num_dflt
    FROM lineitem
    """,
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic/casts (F7): the reference's try/except defaults
    (`pipeline.py:115-129`) as try_divide/try_cast — errors become NULLs,
    never job failures."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        F.col("l_returnflag").try_cast("double").alias("flag_num"),
        F.coalesce(F.col("l_returnflag").try_cast("double"), F.lit(-1.0)).alias(
            "flag_num_dflt"
        ),
    )
