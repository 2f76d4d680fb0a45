"""UDF/UDAF/UDTF surface queries (SURVEY.md §2.10) + remaining function
families (F6 map ops, A5 approximate distinct).

These exercise every Python-boundary mechanism the engine supports — scalar
pandas UDF (U1, in plans/nutrition.py), mapInPandas row-batch enrichment
(U2), native JSON expansion (U3, json_flatten), grouped applyInPandas UDAF
(U4) and applyInPandasWithState (T7, plans/streaming_queries.py) — each in
its designated role: Python only where JVM expressions genuinely can't go.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.enrichment import enrich_from_api
from .registry import query


@query(
    "json_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',')            AS prop_keys,
           CAST(len(json_keys(props)) AS INT)                AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed JSON access (F6): the reference's dynamic key iteration
    (`pipeline.py:54-57`) without a fixed struct — parse to MapType, expose
    the key set (joined to a scalar: the driver canonicalizer cannot hash
    array columns), key count, and a value lookup."""
    cat = Catalog(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return cat.events.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        m.getItem("k").alias("k_val"),
    )


#: Matches nutrition.synth_items_raw's payload arithmetic so the oracle can
#: reproduce every emitted element from `part` alone.
_UDTF_ORACLE = """
    WITH base AS (
        SELECT p_name || ' #' || p_partkey AS item_name, p_partkey,
               CAST(CAST(p_retailprice / 2 AS DECIMAL(10,1)) AS DOUBLE) AS cal0,
               CAST(CAST(p_retailprice / 2 + 10 AS DECIMAL(10,1)) AS DOUBLE) AS cal_dup,
               CASE WHEN p_partkey % 5 = 0 THEN 2 ELSE 1 END AS n_elems
        FROM part
    )
    SELECT item_name, 0 AS elem_idx, item_name AS name, cal0 AS calories,
           n_elems
    FROM base WHERE p_partkey % 50 <> 3
    UNION ALL
    SELECT item_name, 1, 'bogus', 1.0, 2
    FROM base WHERE p_partkey % 50 <> 3 AND p_partkey % 5 = 0
    UNION ALL
    SELECT item_name, 0, item_name, cal_dup, n_elems
    FROM base WHERE p_partkey % 20 = 0
    UNION ALL
    SELECT item_name, 1, 'bogus', 1.0, 2
    FROM base WHERE p_partkey % 20 = 0
"""


@query("udtf_expand_items", oracle=_UDTF_ORACLE)
def udtf_expand_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record expansion as a REAL Python UDTF (U3 via Spark 4's table
    function API, not the from_json shortcut): one raw items_raw row →
    one output row per JSON array ELEMENT, with the reference's
    try/except row-skip (`pipeline.py:27-30`) living inside the UDTF —
    malformed JSON yields zero rows instead of killing the stage, and the
    %5==0 two-element arrays show the 1→N shape from_json+element_at
    cannot (it takes [0] only). Arrow-optimized; applied with LATERAL so
    expansion runs scan-side, partition-parallel. The oracle rebuilds
    every expected element from `part` — the UDTF's parse is
    value-checked, not just counted."""
    from pyspark.sql.functions import udtf

    from .nutrition import synth_items_raw

    @udtf(
        returnType="elem_idx int, name string, calories double, n_elems int",
        useArrow=True,
    )
    class ExpandItems:
        def eval(self, data: str):
            import json

            try:
                arr = json.loads(data)
            except Exception:
                return  # reference row-skip: malformed input drops quietly
            if not isinstance(arr, list):
                return
            for i, el in enumerate(arr):
                yield (
                    i,
                    str(el.get("name", "")),
                    float(el.get("calories", 0.0)),
                    len(arr),
                )

    spark.udtf.register("expand_items", ExpandItems)
    raw = synth_items_raw(spark, sf_dir)
    view = "items_raw_for_udtf"
    raw.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT r.item_name, t.elem_idx, t.name, t.calories, t.n_elems "
        f"FROM {view} r, LATERAL expand_items(r.data) t"
    )


@query("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (A5 at scale: the exact distinct
    set the producer keeps in memory, `produce_items.py:48`, stops fitting at
    100 TB; HLL is the engine answer). Sketch values are engine-specific →
    rows-only check; the unit test asserts the ≤5%-error contract instead."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count("*").alias("line_cnt"),
    )


@query(
    "agg_approx_distinct_bound",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked companion to ``agg_approx_distinct`` (VERDICT r7
    item 4): the HLL++ sketch VALUE is engine-specific (rows-only), but its
    ERROR CONTRACT is deterministic and hash-able — compute approx and
    exact distinct in the same pass and emit whether the approx lies within
    5σ of the configured rsd (0.02 → 10% relative tolerance; HLL++ is
    hash-based and deterministic, so the flag is stable). The oracle
    asserts TRUE per group: any sketch drifting outside its published bound
    hash-mismatches."""
    cat = Catalog(spark, sf_dir)
    # Dedup-first, then aggregate: computing countDistinct alongside a
    # non-distinct aggregate makes Catalyst plan an Expand (2× the input
    # through the shuffle — 2.5 s at sf0.1). HLL registers are duplicate-
    # insensitive, so running approx_count_distinct over the deduped
    # (flag, orderkey) pairs yields the IDENTICAL estimate with a plain
    # two-level aggregate: partial-agg dedup map-side, no Expand.
    d = cat.lineitem.select("l_returnflag", "l_orderkey").distinct()
    agg = d.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.count("*").alias("exact_orders"),
    )
    tol = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("exact_orders") * 0.10))
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (F.abs(F.col("approx_orders") - F.col("exact_orders")) <= tol).alias(
            "within_bound"
        ),
    )


@query(
    "agg_approx_percentile_bound",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked companion to ``agg_approx_percentile`` (VERDICT r7
    item 4): approx_percentile(accuracy=1000) returns an element whose RANK
    is within N/1000 of the median; with 10× slack the returned value's
    rank fraction must lie in [0.49, 0.51] — checked by a join-back rank
    count (rows < med must not exceed 0.51·N, rows ≤ med must reach
    0.49·N), NOT by exact percentile(), which buffers a whole group per
    task and OOMs at M=100 (measured r8) — the very non-scalable sort this
    sketch exists to avoid. The bound flag is deterministic and hashed;
    the sketch value stays out of the output. Oracle asserts TRUE per
    group."""
    cat = Catalog(spark, sf_dir)
    meds = cat.lineitem.groupBy("l_returnflag").agg(
        F.approx_percentile(
            F.col("l_extendedprice"), F.lit(0.5), F.lit(1000)
        ).alias("approx_med"),
    )
    ranked = (
        cat.lineitem.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(meds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("line_cnt"),
            F.count_if(F.col("l_extendedprice") < F.col("approx_med")).alias(
                "cnt_lt"
            ),
            F.count_if(F.col("l_extendedprice") <= F.col("approx_med")).alias(
                "cnt_le"
            ),
        )
    )
    return ranked.select(
        "l_returnflag",
        "line_cnt",
        (
            (F.col("cnt_le") >= F.col("line_cnt") * 0.49)
            & (F.col("cnt_lt") <= F.col("line_cnt") * 0.51)
        ).alias("within_bound"),
    )


@query(
    "enrich_rest_stub",
    oracle="""
    WITH names AS (
        SELECT p_name || ' #' || CAST(p_partkey AS VARCHAR) AS item_name FROM part
    ), hx AS (
        SELECT item_name,
               CAST(list_sum(list_transform(
                   generate_series(1, len(item_name)),
                   i -> ascii(item_name[i]))) AS BIGINT) AS h
        FROM names
    ), payload AS (
        SELECT item_name, h,
               '[{"name": "' || item_name || '", "calories": ' ||
               CAST(CAST((h % 900) / 2.0 + 50 AS DECIMAL(10,1)) AS VARCHAR) ||
               ', "serving_size_g": 100.0, "fat_total_g": ' ||
               CAST(h % 40 AS VARCHAR) || '.5, "protein_g": ' ||
               CAST(h % 30 AS VARCHAR) || '.2, "sodium_mg": ' ||
               CAST(h % 500 AS VARCHAR) || '.0, "carbohydrates_total_g": ' ||
               CAST(h % 80 AS VARCHAR) || '.1}]' AS data
        FROM hx
    )
    SELECT item_name,
           CAST(len(data) AS INT) AS payload_len,
           CAST((h % 900) / 2.0 + 50 AS DOUBLE) AS calories
    FROM payload
    """,
)
def enrich_rest_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-batched REST enrichment (S7/U2): mapInPandas with an injectable
    lookup (deterministic stub here; batched HTTP client in production) —
    the reference's one-blocking-call-per-message loop
    (`consume_items.py:66-80,108`) turned into per-partition batch I/O.

    The stub is a pure function of the item name (char-code sum → modular
    fields), so the oracle rebuilds the exact payload in SQL and the whole
    Python boundary is value-checked, not just row-counted."""
    cat = Catalog(spark, sf_dir)
    names = cat.part.select(
        F.concat(F.col("p_name"), F.lit(" #"), F.col("p_partkey")).alias("item_name")
    )
    enriched = enrich_from_api(names)
    return enriched.select(
        "item_name",
        F.length("data").alias("payload_len"),
        F.get_json_object(F.col("data"), "$[0].calories").cast("double").alias("calories"),
    )


@query("sample_bernoulli")
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling (training-data pipeline staple): each row
    kept i.i.d. with p=0.1 — scan-local, no shuffle, reproducible under the
    seed. Spark's sampler RNG is engine-specific → rows-only check; the
    unit test pins the statistical contract instead."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.sample(fraction=0.1, seed=42).select(
        "doc_id", "source", "n_chars"
    )


@query(
    "sample_bernoulli_bound",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total, TRUE AS within_bound
    FROM documents
    """,
)
def sample_bernoulli_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked companion to ``sample_bernoulli`` (VERDICT r7 item-4
    pattern): the sampler's RNG stream is engine-specific, but its
    STATISTICAL CONTRACT is deterministic under the pinned seed — the
    sample size must lie within 6σ of p·N (binomial; at the fixture sizes
    6σ ≈ 0.8·mean, and the seeded draw is exactly reproducible anyway).
    The oracle asserts the bound flag per run; a sampler regression that
    breaks the fraction contract hash-mismatches."""
    cat = Catalog(spark, sf_dir)
    p = 0.1
    total = cat.documents.agg(F.count("*").alias("n_total"))
    samp = (
        cat.documents.sample(fraction=p, seed=42)
        .agg(F.count("*").alias("n_samp"))
    )
    return total.crossJoin(samp).select(
        "n_total",
        (
            F.abs(F.col("n_samp") - F.col("n_total") * p)
            <= F.lit(6.0) * F.sqrt(F.col("n_total") * p * (1 - p)) + 1
        ).alias("within_bound"),
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ((strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1
          < CASE WHEN lang = 'en' THEN 204 ELSE 2048 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by language (per-stratum keep rates — the
    rebalancing step of corpus curation, e.g. downsample English ~5%, keep
    half of everything else).

    Expressed as a POLICY, not an enumeration: the keep rate is a column
    expression over the stratum, decided row-side against a deterministic
    md5 draw — the `sampleBy` semantics with no driver-side
    `distinct().collect()` to enumerate strata first (a data-dependent
    table scan in the query path, flagged in VERDICT r2). Unseen languages
    at any scale just take the default rate, and the md5 gate makes the
    sample a pure function of doc_id — reproducible across engines, which
    also upgrades this query from rows-only to oracle-backed. Map-only:
    the gate evaluates in the scan stage, no shuffle, no RNG state."""
    cat = Catalog(spark, sf_dir)
    # First 3 md5 hex digits of 'strat:'||doc_id = a uniform draw in
    # [0, 4096); keep when draw < rate·4096 (en: 204/4096 ≈ 5%, else 50%).
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 3
        ),
        16,
        10,
    ).cast("int")
    rate = F.when(F.col("lang") == "en", F.lit(204)).otherwise(F.lit(2048))
    return cat.documents.where(draw < rate).select("doc_id", "lang", "n_chars")


@query("agg_approx_percentile")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile / KLL-style): the scale
    path when exact interpolation (agg_percentile) would require a full
    sort — accuracy bound pinned in tests, sketch values engine-specific →
    rows-only."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.approx_percentile(F.col("l_extendedprice"), F.lit(0.5), F.lit(1000)).alias(
            "approx_median_price"
        ),
        F.count("*").alias("line_cnt"),
    )


@query(
    "grouped_udaf_median",
    oracle="""
    SELECT user_id,
           median(value) AS median_value,
           CAST(COUNT(*) AS BIGINT) AS event_cnt
    FROM events
    GROUP BY user_id
    """,
)
def grouped_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via applyInPandas (U4): per-user median —
    a rank statistic Spark has no exact distributed built-in for. The group
    is the parallelism unit; each Arrow batch holds one user's rows."""
    import pandas as pd

    cat = Catalog(spark, sf_dir)

    def median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "median_value": [float(pdf["value"].median())],
                "event_cnt": [len(pdf)],
            }
        )

    return cat.events.select("user_id", "value").groupBy("user_id").applyInPandas(
        median_fn, schema="user_id bigint, median_value double, event_cnt bigint"
    )


_DYN_UDTF_ORACLE = """
    WITH src AS (
        SELECT n_nationkey,
               n_name || ',' || CAST(n_regionkey AS VARCHAR) || ',' ||
                   lower(n_name) AS csv
        FROM nation
    )
    SELECT n_nationkey,
           string_split(csv, ',')[1] AS f1,
           string_split(csv, ',')[2] AS f2,
           string_split(csv, ',')[3] AS f3
    FROM src
"""


@query("udtf_dynamic_schema", oracle=_DYN_UDTF_ORACLE)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-output-schema Python UDTF (Spark 4's ``analyze()`` phase):
    the table function's column list is COMPUTED AT PLAN TIME from its
    constant argument — split_fixed(csv, 3) plans three string columns,
    split_fixed(csv, 5) would plan five — the polymorphic-UDTF surface
    that fixed ``returnType`` registration (``udtf_expand_items``) cannot
    express. ``analyze`` receives constant-folded argument values
    (AnalyzeArgument.value) and returns the schema; ``eval`` then runs
    Arrow-batched per partition like any UDTF. Guard rails: a
    non-constant width argument fails analysis loudly at plan time, not
    with bad rows at runtime."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFixed:
        @staticmethod
        def analyze(s: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if n.value is None:
                raise ValueError("split_fixed width must be a constant literal")
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"f{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, s, n: int):
            parts = (s or "").split(",")
            yield tuple((parts + [""] * n)[:n])

    spark.udtf.register("split_fixed", udtf(SplitFixed, useArrow=True))
    cat = Catalog(spark, sf_dir)
    cat.nation.selectExpr(
        "n_nationkey",
        "n_name || ',' || CAST(n_regionkey AS STRING) || ',' || lower(n_name) AS csv",
    ).createOrReplaceTempView("_dyn_udtf_src")
    return spark.sql(
        "SELECT r.n_nationkey, t.f1, t.f2, t.f3 "
        "FROM _dyn_udtf_src r, LATERAL split_fixed(r.csv, 3) t"
    )


@query(
    "arrow_batch_digest",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def arrow_batch_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface: per-document byte/char/token counts computed
    with vectorized ``pyarrow.compute`` kernels on zero-copy Arrow batches —
    the lowest-overhead Python boundary Spark offers (no pandas
    materialization, no object-per-row; the batch stays columnar end to
    end). This is the boundary a real tokenizer-apply or multimodal decode
    stage should prefer when pandas semantics aren't needed; the
    computation here is deliberately oracle-expressible so the MECHANISM is
    value-checked (the ``mapInPandas`` twin is ``mm_decode_stats``).

    Token count = maximal non-space runs (trim then split on ``[ ]+``),
    which equals "non-empty fields of a single-space split" — the oracle's
    formulation — for the space-delimited corpus.

    Scale shape: map-only — one fused Python stage over the scan, no
    shuffle; batch size governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cat = Catalog(spark, sf_dir)

    def digest(batches):
        for batch in batches:
            text = batch.column("text")
            trimmed = pc.utf8_trim(text, characters=" ")
            n_tok = pc.if_else(
                pc.equal(trimmed, ""),
                pa.scalar(0, pa.int32()),
                pc.list_value_length(pc.split_pattern_regex(trimmed, "[ ]+")),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(n_tok, pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars", "n_tokens"],
            )

    return cat.documents.select("doc_id", "text").mapInArrow(
        digest, "doc_id long, n_bytes long, n_chars long, n_tokens long"
    )
