"""In-flight data-quality observation (zero-extra-scan monitoring).

``dq_checks`` (plans/relational2.py) audits a table with a dedicated lazy
plan; at 100 TB you also want the PRODUCTION pass itself to report quality
counters without a second scan. Spark's Observation API attaches named
aggregates to a plan node: they accumulate on the executors WHILE the main
action runs and cost nothing beyond the accumulator traffic — the engine's
analog of the reference's per-row try/except logging
(`dagster_project/pipeline.py:76-77`), but exact, distributed, and free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observe_nutrition_quality(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach quality counters to a nutrition-shaped frame (post-flatten):
    row count, null/zero calorie rows, negative-macro rows, and rows whose
    serving size can't normalize a per-100g metric. Returns (instrumented
    frame, observation); read ``observation.get`` AFTER the first action on
    the frame. Counters are exact (integer sums over the real pass)."""
    obs = Observation("nutrition_dq")
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col("calories").isNull() | (F.col("calories") == 0.0), 1).otherwise(0)
        ).alias("null_or_zero_calories"),
        F.sum(
            F.when(
                (F.col("protein_g") < 0)
                | (F.col("fat_total_g") < 0)
                | (F.col("carbohydrates_total_g") < 0),
                1,
            ).otherwise(0)
        ).alias("negative_macros"),
        F.sum(
            F.when(
                F.col("serving_size_g").isNull() | (F.col("serving_size_g") <= 0), 1
            ).otherwise(0)
        ).alias("bad_serving_size"),
    )
    return instrumented, obs
