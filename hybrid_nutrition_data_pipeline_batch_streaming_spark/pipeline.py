"""The batch ETL pipeline: raw items → flattened, enriched, clustered fact.

Re-expresses the reference's Dagster job (`dagster_project/pipeline.py`,
extract → transform → load, SURVEY.md §3.2) as ONE lazy DataFrame plan:

    raw → validity filter → from_json flatten → cast-with-defaults
        → last-write-wins dedup → LLM enrichment (batched pandas UDF)
        → clustered columnar write

The reference moves a Python list[dict] between ops and calls OpenAI once per
record per prompt; here the whole job is a single Catalyst plan (whole-plan
optimization, no op-boundary materialization) and enrichment is Arrow-batched.
The mark-processed mutation (`pipeline.py:144-150`) is replaced by streaming
checkpoints (streaming/ingest.py) or the incremental anti-join
(plans/relational.py::incremental_antijoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from .functions.enrichment import with_llm_columns

#: Canonical nutrition payload schema (FIXTURES.md B3; observed in the
#: ClickHouse DDL at reference `pipeline.py:90-100`). `name` is present in
#: the JSON but dropped on flatten (`pipeline.py:55-56`).
NUTRITION_FIELDS = (
    "calories",
    "serving_size_g",
    "fat_total_g",
    "fat_saturated_g",
    "protein_g",
    "sodium_mg",
    "potassium_mg",
    "cholesterol_mg",
    "carbohydrates_total_g",
    "fiber_g",
    "sugar_g",
)

NUTRITION_STRUCT = StructType(
    [StructField("name", StringType())]
    + [StructField(f, DoubleType()) for f in NUTRITION_FIELDS]
)
NUTRITION_ARRAY = ArrayType(NUTRITION_STRUCT)

#: The 17-column enriched schema (reference DDL `pipeline.py:85-108`);
#: ingestion_ts stays a true timestamp (the reference stringifies it —
#: recorded as a quirk, SURVEY.md §1.2).
ENRICHED_COLUMNS = (
    "item_name",
    "ingestion_ts",
    *NUTRITION_FIELDS,
    "openai_description",
    "openai_best_pairings",
    "openai_health_impact",
    "openai_preparation_tips",
)


def filter_valid_raw(raw: DataFrame, data_col: str = "data") -> DataFrame:
    """Drop null / processed-marker / unparseable rows (reference
    `pipeline.py:27-32`, `consume_items.py:99-100`) — P2/P3."""
    d = F.col(data_col)
    return raw.where(
        d.isNotNull() & (d != "[]") & F.from_json(d, NUTRITION_ARRAY).isNotNull()
    )


def flatten_nutrition(raw: DataFrame, data_col: str = "data") -> DataFrame:
    """JSON array → first element → typed columns with 0-defaults.

    The reference's per-record loop (`pipeline.py:50-57` json.loads +
    `[0]` + key iteration, then `pipeline.py:113-129` float(rec.get(k, 0)))
    as one codegen'd projection: from_json → element_at(1) → per-field
    coalesce(cast, 0.0). `name` is dropped (`pipeline.py:55-56`).
    """
    first = F.element_at(F.from_json(F.col(data_col), NUTRITION_ARRAY), 1)
    cols = [
        F.coalesce(first.getField(f), F.lit(0.0)).alias(f) for f in NUTRITION_FIELDS
    ]
    return raw.select("item_name", "ingestion_ts", *cols)


def dedup_last_write_wins(df: DataFrame, key: str = "item_name", ts: str = "ingestion_ts") -> DataFrame:
    """Cassandra PK upsert semantics (`consume_items.py:53,102-103`,
    SURVEY.md §1.4): keep the latest record per key."""
    w = Window.partitionBy(key).orderBy(F.desc(ts))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def run_batch_pipeline(raw: DataFrame) -> DataFrame:
    """extract → transform → load-ready, as one lazy plan (SURVEY.md §3.2)."""
    flat = flatten_nutrition(filter_valid_raw(raw))
    deduped = dedup_last_write_wins(flat)
    enriched = with_llm_columns(deduped)
    return enriched.select(*ENRICHED_COLUMNS)


def run_incremental_pipeline(
    spark,
    raw_path: str,
    out_path: str,
    checkpoint: str,
    raw_schema: str = "item_name string, ingestion_ts timestamp, data string",
):
    """The reference's scheduled job (`pipeline.py:161-163`, cron every
    10 min + mark-processed mutation), as a checkpointed incremental run:

    each invocation streams exactly the raw files that arrived since the
    last run (AvailableNow + checkpoint — no processed-flag writes back to
    the store, no race between load and mark, SURVEY.md §4.2 item 4), pushes
    the increment through the SAME batch transform, and merges it into the
    enriched table with last-write-wins semantics.

    Returns once the increment is fully processed. Run it from any
    scheduler — the checkpoint makes reruns exactly-once.
    """
    from .streaming.upsert_sink import ParquetUpsertStore

    store = ParquetUpsertStore(
        spark, out_path, key="item_name", ts_col="ingestion_ts"
    )
    stream = spark.readStream.schema(raw_schema).parquet(raw_path)

    def process(batch: DataFrame, batch_id: int) -> None:
        store.merge(run_batch_pipeline(batch))

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.read()


def write_clustered(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Columnar load clustered by (item_name, ingestion_ts) — the engine's
    analog of MergeTree ``ORDER BY`` (`pipeline.py:105-107`): repartition on
    the leading key then sortWithinPartitions, so each file is internally sorted
    and min/max row-group stats make key lookups prune (SURVEY.md §4.2)."""
    out = df.repartition(n_files or df.sparkSession.sparkContext.defaultParallelism, "item_name")
    out.sortWithinPartitions("item_name", "ingestion_ts").write.mode("overwrite").parquet(path)
