"""Classifier-evaluation analytics: exact rank-AUC, precision/recall
threshold sweeps, calibration (reliability) bins, and inter-annotator
agreement (Cohen's kappa) — the measurement layer a curation team runs
BEFORE trusting a model score as a corpus gate.

The reference ships rule-thresholded gates with no evaluation loop at all
(its only "validation" is runtime retries — SURVEY.md §5.1); this engine
already has the gates (`plans/curation.py::quality_classifier`, the corpus
pipeline's language/quality filters), so this module adds the missing
question: *how good is the score?* The scored unit is a document from the
``documents`` table; the classifier under test is a deterministic per-mille
stopword-token ratio (the C4/CCNet quality feature, with exactly the shape
of a real quality-model score), and the reference label is ``lang = 'en'`` — "does the cheap byte
heuristic recover the expensive language label", the standard bootstrap
question when building a language-ID gate (CCNet does exactly this
comparison between fastText and byte heuristics).

Exactness discipline: the score is quantized to per-mille (0..1000), every
metric is a closed form of exact BIGINT counts with truncating division
(ppm outputs), and AUC uses the Mann-Whitney midrank identity
``2·midrank = 2·cnt_less + tied + 1`` so ties are handled exactly without
any 0.5 fractions. Both engines truncate integer division toward zero
(verified; see NOTES.md ts_decompose).

Scale shapes (100 TB corpus, ~1e11 documents):

- Every query reduces the corpus to the **score histogram** first — one
  map-side projection + one groupBy on a domain of ≤ 1001 distinct
  per-mille scores. All ranking/threshold logic runs on that bounded
  table, so the only SinglePartition stages touch ≤ 1001 rows (the same
  bounded-domain argument as ``kth_order_statistics``).
- ``eval_pr_thresholds`` expands the histogram ×9 thresholds map-side
  (9 009 rows max) — never the corpus ×9.
- ``eval_label_kappa`` is one global aggregate of five conditional counts;
  the kappa closed form runs on a single row. At ~1e11 docs the N² term
  needs DECIMAL(38,0); the fixture-scale BIGINT form is documented as the
  swap point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from .registry import query

#: Spark-side per-mille stopword-token ratio of ``text`` (0..1000) — the
#: C4/CCNet-class quality feature: fraction of whitespace tokens that are
#: function words. Exact: token split on single spaces, integer division.
#: (kept as a string: F.expr at module import would need a live
#: SparkContext, and plans import at test-collection time.)
_SCORE_PT_EXPR = (
    "CAST(1000 * size(filter(split(text, ' '), t -> t IN ('a', 'the')))"
    "     div size(split(text, ' ')) AS BIGINT)"
)

#: DuckDB equivalent (identical split + lambda-filter semantics).
_SCORE_PT_SQL = """
    CAST(1000 * len(list_filter(string_split(text, ' '),
                                t -> t IN ('a', 'the')))
         // len(string_split(text, ' ')) AS BIGINT)
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (score_pt, label, n_chars): the map-side scoring pass."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.select(
        F.expr(_SCORE_PT_EXPR).alias("score_pt"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("label"),
        F.col("n_chars"),
    )


def _histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-score counts: the ≤ 1001-row reduction every metric runs on."""
    return (
        _scored(spark, sf_dir)
        .groupBy("score_pt")
        .agg(
            F.count("*").alias("n_g"),
            F.sum("label").alias("pos_g"),
        )
    )


@query(
    "eval_auc_rank",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE_PT_SQL} AS score_pt,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ), r AS (
        SELECT label,
               2 * rank() OVER (ORDER BY score_pt)
                 + COUNT(*) OVER (PARTITION BY score_pt) - 1 AS mr2
        FROM s
    )
    SELECT CAST(COUNT(*) AS BIGINT)    AS n_docs,
           CAST(SUM(label) AS BIGINT)  AS n_pos,
           CAST(CASE WHEN SUM(label) = 0 OR SUM(label) = COUNT(*) THEN NULL
                ELSE 1000000 * (SUM(CASE WHEN label = 1 THEN mr2 ELSE 0 END)
                                - SUM(label) * (SUM(label) + 1))
                     // (2 * SUM(label) * (COUNT(*) - SUM(label)))
                END AS BIGINT)         AS auc_ppm
    FROM r
    """,
)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the stopword-ratio score against the language label,
    via the Mann-Whitney rank identity AUC = U / (n_pos·n_neg) with exact
    midrank tie handling. The engine never ranks the corpus: it ranks the
    ≤ 1001-row per-mille score histogram (cnt_less via a running sum over
    the bounded domain), then folds ``Σ_pos 2·midrank = Σ_g pos_g ·
    (2·cnt_less_g + n_g + 1)`` in one aggregate. The oracle ranks every
    row naively — the parity check proves the histogram decomposition.
    One corpus shuffle (the histogram groupBy); the window and final fold
    touch ≤ 1001 rows."""
    hist = _histogram(spark, sf_dir)
    w = Window.orderBy("score_pt").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "cum_less", F.coalesce(F.sum("n_g").over(w), F.lit(0))
    )
    return ranked.agg(
        F.sum("n_g").cast("long").alias("n_docs"),
        F.sum("pos_g").cast("long").alias("n_pos"),
        F.expr(
            """
            CAST(CASE WHEN SUM(pos_g) = 0 OR SUM(pos_g) = SUM(n_g) THEN NULL
                 ELSE 1000000 * (SUM(pos_g * (2 * cum_less + n_g + 1))
                                 - SUM(pos_g) * (SUM(pos_g) + 1))
                      div (2 * SUM(pos_g) * (SUM(n_g) - SUM(pos_g)))
                 END AS BIGINT)
            """
        ).alias("auc_ppm"),
    )


@query(
    "eval_pr_thresholds",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE_PT_SQL} AS score_pt,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ), t AS (
        SELECT 20 * CAST(x AS BIGINT) AS threshold_pt
        FROM range(1, 10) r(x)
    ), c AS (
        SELECT threshold_pt,
               CAST(SUM(CASE WHEN score_pt >= threshold_pt AND label = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN score_pt >= threshold_pt AND label = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN score_pt < threshold_pt AND label = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN score_pt < threshold_pt AND label = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM s CROSS JOIN t GROUP BY threshold_pt
    )
    SELECT threshold_pt, tp, fp, fn, tn,
           CAST(CASE WHEN tp + fp = 0 THEN 0
                     ELSE 1000000 * tp // (tp + fp) END AS BIGINT)
               AS precision_ppm,
           CAST(CASE WHEN tp + fn = 0 THEN 0
                     ELSE 1000000 * tp // (tp + fn) END AS BIGINT)
               AS recall_ppm,
           CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                     ELSE 2000000 * tp // (2 * tp + fp + fn) END AS BIGINT)
               AS f1_ppm
    FROM c
    """,
)
def eval_pr_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 sweep over nine per-mille thresholds
    (20..180): the operating-point table a team reads before freezing a
    gate cutoff. The oracle crosses every document with every threshold
    (9× the corpus); the engine crosses the ≤ 1001-row score HISTOGRAM
    with the 9-threshold literal array (≤ 9 009 rows) and derives the
    confusion cells from conditional sums — the corpus is shuffled once,
    ever. F1 uses the single-division identity 2·tp / (2·tp + fp + fn)
    so one truncating division matches both engines."""
    hist = _histogram(spark, sf_dir)
    swept = hist.select(
        "score_pt",
        "n_g",
        "pos_g",
        F.explode(
            F.array(*[F.lit(20 * i).cast("long") for i in range(1, 10)])
        ).alias("threshold_pt"),
    )
    pred = F.col("score_pt") >= F.col("threshold_pt")
    c = swept.groupBy("threshold_pt").agg(
        F.sum(F.when(pred, F.col("pos_g")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(pred, F.col("n_g") - F.col("pos_g")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~pred, F.col("pos_g")).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~pred, F.col("n_g") - F.col("pos_g")).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return c.select(
        "threshold_pt",
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CAST(CASE WHEN tp + fp = 0 THEN 0"
            "          ELSE 1000000 * tp div (tp + fp) END AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CASE WHEN tp + fn = 0 THEN 0"
            "          ELSE 1000000 * tp div (tp + fn) END AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0"
            "          ELSE 2000000 * tp div (2 * tp + fp + fn) END"
            "     AS BIGINT)"
        ).alias("f1_ppm"),
    )


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE_PT_SQL} AS score_pt,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    )
    SELECT CAST(least(score_pt // 25, 9) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT)                  AS n_docs,
           CAST(SUM(label) AS BIGINT)                AS n_pos,
           CAST(1000 * SUM(score_pt) // COUNT(*) AS BIGINT)
               AS mean_score_ppm,
           CAST(1000000 * SUM(label) // COUNT(*) AS BIGINT)
               AS pos_rate_ppm
    FROM s GROUP BY 1
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: decile bins of the score vs the observed
    positive rate — a calibrated score has mean_score ≈ pos_rate per bin.
    Pure single-shuffle aggregate on a ≤ 10-value bin key; means are
    truncating integer divisions of exact sums (ppm)."""
    s = _scored(spark, sf_dir)
    return (
        s.select(
            F.least(F.expr("score_pt div 25"), F.lit(9))
            .cast("long")
            .alias("bin"),
            "score_pt",
            "label",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
            F.expr("CAST(1000 * SUM(score_pt) div COUNT(*) AS BIGINT)").alias(
                "mean_score_ppm"
            ),
            F.expr(
                "CAST(1000000 * SUM(label) div COUNT(*) AS BIGINT)"
            ).alias("pos_rate_ppm"),
        )
    )


@query(
    "eval_label_kappa",
    oracle=f"""
    WITH s AS (
        SELECT CASE WHEN {_SCORE_PT_SQL} >= 60 THEN 1 ELSE 0 END AS a,
               CASE WHEN n_chars BETWEEN 150 AND 400 THEN 1 ELSE 0 END AS b
        FROM documents
    ), c AS (
        SELECT CAST(COUNT(*) AS BIGINT)                    AS n,
               CAST(SUM(a) AS BIGINT)                      AS a1,
               CAST(SUM(b) AS BIGINT)                      AS b1,
               CAST(SUM(a * b) AS BIGINT)                  AS n11,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT)      AS n00
        FROM s
    )
    SELECT n, a1, b1, n11, n00,
           CAST(1000000 * (n11 + n00) // n AS BIGINT) AS po_ppm,
           CAST(1000000 * (a1 * b1 + (n - a1) * (n - b1)) // (n * n)
                AS BIGINT) AS pe_ppm,
           CAST(1000000 * (n * (n11 + n00) - (a1 * b1 + (n - a1) * (n - b1)))
                // (n * n - (a1 * b1 + (n - a1) * (n - b1)))
                AS BIGINT) AS kappa_ppm
    FROM c
    """,
)
def eval_label_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent rule annotators (the
    stopword-ratio gate at its 60‰ median vs a mid-length gate) — chance-corrected
    agreement, the number to check before averaging noisy labelers into a
    training label. One global aggregate of five conditional counts, then
    the closed form κ = (N·Σdiag − Σ rowᵢ·colᵢ) / (N² − Σ rowᵢ·colᵢ) on
    one row; truncation toward zero matches both engines even for
    negative κ. At ~1e11 docs the N² term moves to DECIMAL(38,0)."""
    cat = Catalog(spark, sf_dir)
    s = cat.documents.select(
        F.when(F.expr(_SCORE_PT_EXPR) >= 60, F.lit(1)).otherwise(F.lit(0)).alias("a"),
        F.when(F.col("n_chars").between(150, 400), F.lit(1))
        .otherwise(F.lit(0))
        .alias("b"),
    )
    c = s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("a1"),
        F.sum("b").cast("long").alias("b1"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("long")
        .alias("n00"),
    )
    return c.select(
        "n",
        "a1",
        "b1",
        "n11",
        "n00",
        F.expr("CAST(1000000 * (n11 + n00) div n AS BIGINT)").alias("po_ppm"),
        F.expr(
            "CAST(1000000 * (a1 * b1 + (n - a1) * (n - b1)) div (n * n)"
            "     AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(
            """
            CAST(1000000 * (n * (n11 + n00)
                            - (a1 * b1 + (n - a1) * (n - b1)))
                 div (n * n - (a1 * b1 + (n - a1) * (n - b1))) AS BIGINT)
            """
        ).alias("kappa_ppm"),
    )


@query(
    "eval_gains_lift",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE_PT_SQL} AS score_pt,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ), h AS (
        SELECT score_pt, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(label) AS BIGINT) AS pos_g
        FROM s GROUP BY score_pt
    ), c AS (
        SELECT score_pt, n_g, pos_g,
               COALESCE(SUM(n_g) OVER (ORDER BY score_pt DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_less,
               SUM(n_g) OVER ()   AS n,
               SUM(pos_g) OVER () AS n_pos
        FROM h
    ), d AS (
        SELECT cum_less * 10 // n AS decile, n_g, pos_g, n, n_pos FROM c
    )
    SELECT CAST(decile AS BIGINT)      AS decile,
           CAST(SUM(n_g) AS BIGINT)    AS n_docs,
           CAST(SUM(pos_g) AS BIGINT)  AS n_pos,
           CAST(SUM(SUM(pos_g)) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
           CAST(1000000 * SUM(SUM(pos_g)) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) // MAX(n_pos) AS BIGINT)
               AS gain_ppm,
           CAST((1000000 * SUM(pos_g) * MAX(n))
                // (SUM(n_g) * MAX(n_pos)) AS BIGINT) AS lift_ppm
    FROM d GROUP BY decile
    """,
)
def eval_gains_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table (the marketing-targeting companion to the ROC
    family): rank documents by score DESCENDING, cut into deciles, and
    report each decile's positive count, cumulative gain (share of all
    positives captured so far) and lift vs the base rate — "how much
    better than random is mailing the top 10%". Deciles are assigned at
    SCORE-GROUP granularity (a tied group lands wholly in the decile of
    its starting rank: decile = cum_higher·10 div n), which keeps the
    whole computation on the bounded score histogram — no per-row global
    rank, same scale shape as ``eval_auc_rank`` — and makes tie handling
    deterministic by definition rather than by sort order. Lift overflow:
    1e6·pos·n needs DECIMAL past ~3e12 doc-scale products."""
    hist = _histogram(spark, sf_dir)
    w_desc = Window.orderBy(F.desc("score_pt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    every = Window.partitionBy()
    c = hist.select(
        "score_pt",
        "n_g",
        "pos_g",
        F.coalesce(F.sum("n_g").over(w_desc), F.lit(0)).alias("cum_less"),
        F.sum("n_g").over(every).alias("n"),
        F.sum("pos_g").over(every).alias("n_pos"),
    )
    d = c.select(
        F.expr("cum_less * 10 div n").alias("decile"),
        "n_g",
        "pos_g",
        "n",
        "n_pos",
    )
    g = d.groupBy("decile").agg(
        F.sum("n_g").cast("long").alias("n_docs"),
        F.sum("pos_g").cast("long").alias("pos"),
        F.max("n").alias("n"),
        F.max("n_pos").alias("n_pos"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        "n_docs",
        F.col("pos").alias("n_pos"),
        F.sum("pos").over(w_cum).cast("long").alias("cum_pos"),
        F.expr(
            "CAST(1000000 * SUM(pos) OVER (ORDER BY decile"
            " ROWS UNBOUNDED PRECEDING) div n_pos AS BIGINT)"
        ).alias("gain_ppm"),
        F.expr(
            "CAST((1000000 * pos * n) div (n_docs * n_pos) AS BIGINT)"
        ).alias("lift_ppm"),
    )
