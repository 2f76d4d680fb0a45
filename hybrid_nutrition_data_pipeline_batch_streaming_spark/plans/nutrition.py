"""End-to-end nutrition pipeline parity query (SURVEY.md §3.2, §5.2 item 4).

Synthesizes a reference-shaped ``items_raw`` table (FIXTURES.md B2/B3) from
the deterministic `part` table — including every dirty-input variant the
reference defends against — runs the REAL batch pipeline
(``pipeline.run_batch_pipeline``: validity filter → from_json flatten →
cast-with-defaults → LWW dedup → pandas-UDF enrichment), and exposes the
17-column enriched result. The DuckDB oracle computes the same final values
directly from `part`, so the whole pipeline (JSON round-trip, defaults,
dedup, UDF text generation) is value-checked, not just row-counted.

Dirty-input variants (keyed off p_partkey so the oracle can reproduce them):
- ``% 50 == 3``  → malformed JSON (dropped — `pipeline.py:27-30`);
- ``% 10 == 0``  → fiber_g/sugar_g missing (0-defaults — `pipeline.py:115-125`);
- ``% 5  == 0``  → two-element JSON array (only [0] used — `pipeline.py:53`);
- ``% 20 == 0``  → a duplicate item with later ingestion_ts and +10 calories
                   (last-write-wins keeps the dup — `consume_items.py:53`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..pipeline import run_batch_pipeline
from .registry import query

BASE_TS = "2024-01-15 12:00:00"


def _dec1(col_sql: str) -> str:
    """1-decimal fixed-point of a double expression (exact, portable)."""
    return f"CAST({col_sql} AS DECIMAL(10,1))"


def _item_json(cal_expr, fiber_missing):
    """Build the nutrition JSON payload string in Spark column land.

    Numbers are embedded via DECIMAL casts so the text is identical however
    the engine formats doubles.
    """
    d1 = lambda c: c.cast("decimal(10,1)").cast("string")  # noqa: E731
    base = F.concat(
        F.lit('{"name": "'),
        F.col("item_name"),
        F.lit('", "calories": '),
        d1(cal_expr),
        F.lit(', "serving_size_g": 100.0'),
        F.lit(', "fat_total_g": '),
        d1(F.col("p_size") * 1.5),
        F.lit(', "fat_saturated_g": '),
        d1(F.col("p_size") * 0.5),
        F.lit(', "protein_g": '),
        d1(F.col("p_retailprice") / 100),
        F.lit(', "sodium_mg": '),
        d1((F.col("p_partkey") % 500).cast("double")),
        F.lit(', "potassium_mg": '),
        d1((F.col("p_size") * 10).cast("double")),
        F.lit(', "cholesterol_mg": '),
        d1((F.col("p_partkey") % 100).cast("double")),
        F.lit(', "carbohydrates_total_g": '),
        d1(F.col("p_retailprice") / 40),
        F.when(
            fiber_missing, F.lit("")
        ).otherwise(
            F.concat(
                F.lit(', "fiber_g": '),
                d1(F.col("p_size") / 10.0),
                F.lit(', "sugar_g": '),
                d1(F.col("p_retailprice") / 200),
            )
        ),
        F.lit("}"),
    )
    # %5==0 → two-element array; the second element must be ignored.
    bogus = F.lit(', {"name": "bogus", "calories": 1.0}')
    return F.concat(
        F.lit("["),
        base,
        F.when(F.col("p_partkey") % 5 == 0, bogus).otherwise(F.lit("")),
        F.lit("]"),
    )


def synth_items_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped items_raw (item_name, ingestion_ts, data) from part."""
    cat = Catalog(spark, sf_dir)
    part = cat.part.select(
        F.concat(F.col("p_name"), F.lit(" #"), F.col("p_partkey")).alias("item_name"),
        "p_partkey",
        "p_size",
        "p_retailprice",
    )
    base_ts = F.lit(BASE_TS).cast("timestamp_ntz")
    ts = base_ts + F.make_interval(mins=(F.col("p_partkey") % 600).cast("int"))
    fiber_missing = F.col("p_partkey") % 10 == 0

    originals = part.select(
        "item_name",
        ts.alias("ingestion_ts"),
        F.when(F.col("p_partkey") % 50 == 3, F.lit('[{invalid json'))
        .otherwise(_item_json(F.col("p_retailprice") / 2, fiber_missing))
        .alias("data"),
    )
    # Later duplicates for %20==0 keys: +1 h, +10 calories — LWW must keep these.
    dups = part.where(F.col("p_partkey") % 20 == 0).select(
        "item_name",
        (ts + F.expr("INTERVAL 1 HOUR")).alias("ingestion_ts"),
        _item_json(
            F.col("p_retailprice") / 2 + 10, fiber_missing
        ).alias("data"),
    )
    return originals.unionByName(dups)


_ORACLE = f"""
    WITH base AS (
        SELECT p_name || ' #' || p_partkey AS item_name,
               p_partkey, p_size, p_retailprice,
               TIMESTAMP '{BASE_TS}'
                 + (p_partkey % 600) * INTERVAL 1 MINUTE
                 + CASE WHEN p_partkey % 20 = 0 THEN INTERVAL 1 HOUR
                        ELSE INTERVAL 0 HOUR END                      AS ingestion_ts,
               CASE WHEN p_partkey % 20 = 0
                    THEN CAST({_dec1("p_retailprice / 2 + 10")} AS DOUBLE)
                    ELSE CAST({_dec1("p_retailprice / 2")} AS DOUBLE)
               END                                                    AS calories
        FROM part
        WHERE p_partkey % 50 <> 3
    )
    SELECT item_name,
           ingestion_ts,
           calories,
           100.0                                               AS serving_size_g,
           CAST({_dec1("p_size * 1.5")} AS DOUBLE)             AS fat_total_g,
           CAST({_dec1("p_size * 0.5")} AS DOUBLE)             AS fat_saturated_g,
           CAST({_dec1("p_retailprice / 100")} AS DOUBLE)      AS protein_g,
           CAST(p_partkey % 500 AS DOUBLE)                     AS sodium_mg,
           CAST(p_size * 10 AS DOUBLE)                         AS potassium_mg,
           CAST(p_partkey % 100 AS DOUBLE)                     AS cholesterol_mg,
           CAST({_dec1("p_retailprice / 40")} AS DOUBLE)       AS carbohydrates_total_g,
           CASE WHEN p_partkey % 10 = 0 THEN 0.0
                ELSE CAST({_dec1("p_size / 10.0")} AS DOUBLE) END AS fiber_g,
           CASE WHEN p_partkey % 10 = 0 THEN 0.0
                ELSE CAST({_dec1("p_retailprice / 200")} AS DOUBLE) END AS sugar_g,
           'Description: ' || item_name || ' has '
               || CAST(CAST(calories AS DECIMAL(10,1)) AS VARCHAR)
               || ' kcal per serving.'                         AS openai_description,
           'Best pairings for ' || item_name || ': water.'     AS openai_best_pairings,
           'Health impact of ' || item_name || ': '
               || CASE WHEN calories > 300 THEN 'dense' ELSE 'light' END
               || '.'                                          AS openai_health_impact,
           'Preparation tips for ' || item_name || ': serve fresh.'
                                                               AS openai_preparation_tips
    FROM base
"""


@query("pipeline_nutrition_e2e", oracle=_ORACLE)
def pipeline_nutrition_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full batch ETL (§3.2) value-checked end-to-end: dirty raw JSON in,
    17-column enriched fact out — filter, flatten, defaults, LWW dedup and
    the Arrow-batched LLM-stub enrichment all on the line."""
    raw = synth_items_raw(spark, sf_dir)
    return run_batch_pipeline(raw)
