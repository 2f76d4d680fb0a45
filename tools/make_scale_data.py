#!/usr/bin/env python
"""Generate scale-study fixtures: the sf0.1 tables' shape at M× the rows.

Usage:  python tools/make_scale_data.py M OUTDIR  (e.g. 10 /tmp/scale_m10)

The driver's testdata stops at sf0.1; substantiating the "same plan holds at
10× / 100×" claims needs bigger inputs (VERDICT r2 item 3). This generator
reproduces the sf0.1 tables' schemas, cardinality ratios and value
distributions at a chosen multiplier, deterministically (every value is a
pure function of the row id via xxhash64/md5 — no RNG state, identical
bytes on regeneration), and entirely JVM-side (spark.range + column
expressions, no Python in the loop) so generating M=10 takes seconds.

Only the tables the heavy-five scale queries read are produced:
  documents  (5 000·M)  — vocab word-salad text, ~5% near-dup pairs
                          (one-token edit of the previous doc), lang/source
                          distributions like the fixtures
  embeddings (2 000·M)  — 64-dim float vectors with 10 planted clusters
  orders     (150 000·M), lineitem (600 000·M) — the pagerank edge source
  part       (20 000·M) — synth_items_raw's base for the nutrition e2e
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream join shuffle "
    "plan stage task broadcast"
).split()

LANGS = ["en", "zh", "es", "de", "fr"]  # ~44% en, rest ~even (fixture shape)


def _h(*cols):
    return F.xxhash64(*cols)


def _pm(col, n):
    return F.pmod(col, F.lit(n))


def gen_documents(spark, m, out):
    n = 5000 * m
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    # ~5% near-dups: doc_id % 20 == 7 re-generates the PREVIOUS doc's token
    # stream with one token substituted — a one-edit near-duplicate pair,
    # the structure the minhash/simhash/CC operators exist to find.
    is_dup = _pm(F.col("doc_id"), 20) == 7
    seed = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    n_tok = (_pm(_h(seed, F.lit(0)), 60) + 15).cast("int")  # 15..74 tokens
    tok = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.when(is_dup & (i == 2), F.lit("dupedit")).otherwise(
            F.element_at(vocab, (_pm(_h(seed, i), len(VOCAB)) + 1).cast("int"))
        ),
    )
    lang_draw = _pm(_h(F.col("doc_id"), F.lit(1)), 100)
    lang = (
        F.when(lang_draw < 44, F.lit("en"))
        .when(lang_draw < 58, F.lit("zh"))
        .when(lang_draw < 72, F.lit("es"))
        .when(lang_draw < 86, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    (
        df.select(
            "doc_id",
            F.array_join(tok, " ").alias("text"),
            lang.alias("lang"),
            F.concat(F.lit("src"), _pm(_h(F.col("doc_id"), F.lit(2)), 18)).alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )


def gen_embeddings(spark, m, out):
    n = 2000 * m
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    label = _pm(_h(F.col("vec_id"), F.lit(3)), 10).cast("int")
    # centroid(label, d) in [-1, 1] plus per-vector noise at 0.4 amplitude:
    # 10 separable clusters, the geometry k-means/IVF training expects.
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: (
            (_pm(_h(label, d), 2001) - 1000) / 1000.0
            + ((_pm(_h(F.col("vec_id"), d), 2001) - 1000) / 1000.0) * 0.4
        ).cast("float"),
    )
    df.select("vec_id", emb.alias("embedding"), label.alias("label")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "embeddings.parquet"))


def gen_graph_tables(spark, m, out):
    # Date/price columns mirror the fixture distributions (orderdate over
    # 1995-2001, shipdate over 1992-1998, ~25% 'R' return flag) so the
    # relational scale queries (binned range join, flagship shapes) run on
    # the same files as the graph ops.
    n_ord, n_li = 150_000 * m, 600_000 * m
    n_cust, n_supp = 15_000 * m, 1_000 * m
    (
        spark.range(n_ord)
        .select(
            F.col("id").alias("o_orderkey"),
            _pm(_h(F.col("id"), F.lit(4)), n_cust).alias("o_custkey"),
            F.expr("CASE pmod(xxhash64(id, 18), 5) WHEN 0 THEN '1-URGENT'"
                   " WHEN 1 THEN '2-HIGH' WHEN 2 THEN '3-MEDIUM'"
                   " WHEN 3 THEN '4-NOT SPECIFIED' ELSE '5-LOW' END"
                   ).alias("o_orderpriority"),
            # Fixture-like proportions: TPC-H makes 'P' rare (orders still
            # partially in flight), so ~49% F / ~49% O / ~2% P — keeps the
            # status-filtered scale queries (sql_session_variables,
            # filter_exists_correlated) at fixture-shaped selectivity.
            F.expr("CASE WHEN pmod(xxhash64(id, 27), 100) < 49 THEN 'F'"
                   " WHEN pmod(xxhash64(id, 27), 100) < 98 THEN 'O'"
                   " ELSE 'P' END").alias("o_orderstatus"),
            F.expr(
                "CAST(date_add(DATE '1995-01-01',"
                " CAST(pmod(xxhash64(id, 14), 2400) AS INT)) AS TIMESTAMP_NTZ)"
            ).alias("o_orderdate"),
            ((_pm(_h(F.col("id"), F.lit(15)), 45000000) + 90000) / 100.0).alias(
                "o_totalprice"
            ),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    (
        spark.range(n_li)
        .select(
            _pm(F.col("id"), n_ord).alias("l_orderkey"),
            # row id DIV order count = a stable per-order line number
            (F.col("id") / n_ord).cast("int").alias("l_linenumber"),
            _pm(_h(F.col("id"), F.lit(5)), n_supp).alias("l_suppkey"),
            _pm(_h(F.col("id"), F.lit(19)), 20_000 * m).alias("l_partkey"),
            (_pm(_h(F.col("id"), F.lit(20)), 50) + 1).cast("double").alias(
                "l_quantity"
            ),
            ((_pm(_h(F.col("id"), F.lit(21)), 9000000) + 100000) / 100.0).alias(
                "l_extendedprice"
            ),
            (_pm(_h(F.col("id"), F.lit(22)), 11) / 100.0).alias("l_discount"),
            F.expr(
                "CAST(date_add(DATE '1992-01-01',"
                " CAST(pmod(xxhash64(id, 16), 2500) AS INT)) AS TIMESTAMP_NTZ)"
            ).alias("l_shipdate"),
            F.expr(
                "CASE WHEN pmod(xxhash64(id, 17), 4) = 0 THEN 'R'"
                " WHEN pmod(xxhash64(id, 17), 4) = 1 THEN 'A'"
                " ELSE 'N' END"
            ).alias("l_returnflag"),
            # ~50/50 received-vs-open split like the fixture — feeds the
            # FIFO lot-matching supply/demand model.
            F.expr(
                "CASE WHEN pmod(xxhash64(id, 23), 2) = 0 THEN 'F'"
                " ELSE 'O' END"
            ).alias("l_linestatus"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )


def gen_customer(spark, m, out):
    """15 000·M customers (the geo family's point table): 25 nations,
    fixture-shaped acctbal/mktsegment."""
    n = 15_000 * m
    (
        spark.range(n)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
            _pm(_h(F.col("id"), F.lit(24)), 25).cast("int").alias(
                "c_nationkey"
            ),
            ((_pm(_h(F.col("id"), F.lit(25)), 1100000) - 100000) / 100.0).alias(
                "c_acctbal"
            ),
            F.expr(
                "CASE pmod(xxhash64(id, 26), 5) WHEN 0 THEN 'AUTOMOBILE'"
                " WHEN 1 THEN 'BUILDING' WHEN 2 THEN 'FURNITURE'"
                " WHEN 3 THEN 'HOUSEHOLD' ELSE 'MACHINERY' END"
            ).alias("c_mktsegment"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "customer.parquet"))
    )


def gen_dims(spark, m, out):
    """Static nation/region dims (25/5 rows at any M) — broadcast sides."""
    (
        spark.range(25)
        .select(
            F.col("id").cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
            _pm(F.col("id"), 5).cast("int").alias("n_regionkey"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "nation.parquet"))
    )
    (
        spark.range(5)
        .select(
            F.col("id").cast("int").alias("r_regionkey"),
            F.concat(F.lit("REGION_"), F.col("id")).alias("r_name"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "region.parquet"))
    )


def gen_part(spark, m, out):
    n = 20_000 * m
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    name = F.concat_ws(
        " ",
        F.element_at(vocab, (_pm(_h(F.col("id"), F.lit(6)), len(VOCAB)) + 1).cast("int")),
        F.element_at(vocab, (_pm(_h(F.col("id"), F.lit(7)), len(VOCAB)) + 1).cast("int")),
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("p_partkey"),
            name.alias("p_name"),
            F.lit("BrandX").alias("p_brand"),
            F.lit("TYPE").alias("p_type"),
            (_pm(_h(F.col("id"), F.lit(8)), 50) + 1).cast("int").alias("p_size"),
            (900.0 + _pm(_h(F.col("id"), F.lit(9)), 110000) / 100.0).alias(
                "p_retailprice"
            ),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "part.parquet"))
    )


def gen_events(spark, m, out):
    """sf0.1-shaped events at M×: 100 k·M rows over 30 days, 1 500·M users,
    the fixture's five event types, 2-decimal money-like values, JSON props.
    ts is TIMESTAMP (µs) like the round-2+ fixture encoding."""
    n, n_users = 100_000 * m, 1_500 * m
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
    span_us = 30 * 24 * 3600 * 1_000_000
    etype = (
        F.when(_pm(_h(F.col("id"), F.lit(10)), 5) == 0, "signup")
        .when(_pm(_h(F.col("id"), F.lit(10)), 5) == 1, "click")
        .when(_pm(_h(F.col("id"), F.lit(10)), 5) == 2, "view")
        .when(_pm(_h(F.col("id"), F.lit(10)), 5) == 3, "purchase")
        .otherwise("error")
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (base_us + _pm(_h(F.col("id"), F.lit(11)), span_us)).cast("long")
            ).alias("ts"),
            _pm(_h(F.col("id"), F.lit(12)), n_users).alias("user_id"),
            etype.alias("event_type"),
            # ~0.1% planted spikes (25× value) so MAD/z-score anomaly
            # detectors have true positives to find at every scale.
            (
                (_pm(_h(F.col("id"), F.lit(13)), 100000) / 100.0)
                * F.when(_pm(_h(F.col("id"), F.lit(15)), 997) == 0, 25).otherwise(1)
            ).alias("value"),
            F.concat(
                F.lit('{"k": '), _pm(_h(F.col("id"), F.lit(14)), 100), F.lit("}")
            ).alias("props"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    # Default ON: read_events_stream prefers the ordered layout when present
    # (streaming/ingest.py _events_table_path) — without it, multi-batch
    # watermarked drains over random-mtime part files can drop late rows.
    # Opt out with SCALE_EVENTS_ORDERED=0 for batch-only scale studies.
    if os.environ.get("SCALE_EVENTS_ORDERED", "1") != "0":
        gen_events_ordered(spark, out)
    else:
        # ADVICE r8: regenerating with the ordered layout OFF into a dir
        # that already holds one would leave a STALE events_ordered.parquet
        # behind — read_events_stream silently prefers it, so streaming
        # would read old rows while batch reads the fresh events.parquet.
        stale = os.path.join(out, "events_ordered.parquet")
        if os.path.exists(stale):
            import shutil

            shutil.rmtree(stale)


def gen_events_ordered(spark, out):
    """Rewrite events.parquet as a time-bucketed, mtime-ordered layout —
    the arrival-order contract streaming scale studies need.

    Two facts the r7 stream_stream_join study established (SCALE.md):
    (a) a multi-micro-batch file-source drain only honors watermark
    semantics when files arrive roughly in event-time order (Kafka's
    per-partition contract), and (b) Spark's file source orders by
    MODIFICATION TIME, so a range-partitioned write — whose mtimes land in
    task-completion order, i.e. random — is NOT ordered even though each
    file is a clean time slice. This helper range-partitions by ts AND
    stamps strictly increasing mtimes in range order. Enable with
    SCALE_EVENTS_ORDERED=1."""
    import glob
    import time as _time

    src = os.path.join(out, "events.parquet")
    dst = os.path.join(out, "events_ordered.parquet")
    (
        spark.read.parquet(src)
        .repartitionByRange(33, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(dst)
    )
    base = _time.time() - 86_400
    for i, f in enumerate(sorted(glob.glob(os.path.join(dst, "part-*")))):
        os.utime(f, (base + i * 60, base + i * 60))


def main():
    m = int(sys.argv[1])
    out = sys.argv[2]
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName(f"make-scale-data-m{m}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        # 32 concurrent parquet writers each buffer a full row group; on the
        # 1 g default heap that OOMs at M=100 (60 M lineitem rows).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .getOrCreate()
    )
    gen_documents(spark, m, out)
    gen_embeddings(spark, m, out)
    gen_graph_tables(spark, m, out)
    gen_part(spark, m, out)
    gen_customer(spark, m, out)
    gen_dims(spark, m, out)
    gen_events(spark, m, out)
    print(f"wrote M={m} tables to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
