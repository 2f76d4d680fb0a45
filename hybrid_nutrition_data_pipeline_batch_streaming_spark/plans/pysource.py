"""Query surface for the custom Python DataSource (sources/items_source.py).

Even a Python-implemented SOURCE stays inside the exact-parity discipline:
row content is a pure function of the row id, so the DuckDB oracle
regenerates the identical table from ``generate_series`` + the same
md5-digit arithmetic — a full value-hash check on a source that never
touches the fixture parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.items_source import ADJECTIVES, FOODS, register
from .registry import query

_N = 1000


def _word_list_sql(words: tuple[str, ...], digit_pos: int) -> str:
    values = ", ".join(f"'{w}'" for w in words)
    return (
        f"list_value({values})[strpos('0123456789abcdef', "
        f"substr(md5(CAST(i AS VARCHAR)), {digit_pos}, 1))]"
    )


@query(
    "pysource_items",
    oracle=f"""
    SELECT i AS item_id,
           {_word_list_sql(ADJECTIVES, 1)} || ' ' || {_word_list_sql(FOODS, 2)}
               AS item_name
    FROM generate_series(0, {_N - 1}) t(i)
    """,
)
def pysource_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's producer (`produce_items.py:15-66`) as a partitioned
    Spark batch source: each task generates its own id range through the
    Python DataSource API — no driver loop, no pacing sleep, horizontally
    scalable. Names are md5-indexed picks from fixed word lists, so the
    oracle reconstructs the exact table in SQL; ``sf_dir`` is unused (the
    source is generative)."""
    register(spark)
    return (
        spark.read.format("nutrition_items")
        .option("numRows", _N)
        .option("numPartitions", 4)
        .load()
    )
