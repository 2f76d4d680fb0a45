"""Mathematical invariants of the session-5 operators — properties that the
DuckDB oracle equality cannot express (it would just repeat the same
computation): CUSUM telescoping, Pareto dominance completeness, interval
subadditivity, streak accounting, k-core monotonicity, sketch bounds, VAD
consistency. Each is a structural truth of the ALGORITHM, so a future
refactor that keeps oracle parity but breaks the semantics trips these."""

from __future__ import annotations

from hybrid_nutrition_data_pipeline_batch_streaming_spark import plans

SF = "/root/testdata/sf0.001"


def test_cusum_telescopes_to_zero(spark):
    """Σ_d (c_d·nd − t) over ALL days is identically zero, so the LAST
    cumulative value per type must be 0 — the defining telescoping property
    of CUSUM. (The registered query returns the argmax row; recompute the
    full series here.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog

    cat = Catalog(spark, SF)
    daily = (
        cat.events.select("event_type", F.to_date("ts").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count("*").alias("c"))
    )
    w_all = (
        Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    full = daily.withColumn("t", F.sum("c").over(w_all)).withColumn(
        "nd", F.count("*").over(w_all)
    )
    finals = (
        full.groupBy("event_type")
        .agg(F.sum(F.col("c") * F.col("nd") - F.col("t")).alias("s_final"))
        .collect()
    )
    assert finals and all(r.s_final == 0 for r in finals)


def test_pareto_frontier_is_complete_antichain(spark):
    """Skyline contract: no frontier row dominates another (antichain), and
    every non-frontier part is dominated by some frontier part."""
    rows = plans.QUERIES["pareto_frontier"](spark, SF).collect()
    front = [(r.p_partkey, r.p_retailprice, r.p_size) for r in rows]

    def dominates(a, b):
        return a[1] <= b[1] and a[2] <= b[2] and (a[1] < b[1] or a[2] < b[2])

    for a in front:
        for b in front:
            assert a == b or not dominates(a, b), (a, b)

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog

    all_parts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in Catalog(spark, SF).part.select(
            "p_partkey", "p_retailprice", "p_size"
        ).collect()
    ]
    keys = {a[0] for a in front}
    for p in all_parts:
        if p[0] in keys:
            continue
        assert any(dominates(a, p) for a in front), f"undominated {p}"


def test_interval_union_is_subadditive_and_bounded(spark):
    """Coverage ≤ Σ individual durations (overlaps only shrink it) and
    ≥ the longest single interval; islands ≤ events."""
    from pyspark.sql import functions as F

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog

    out = {r.user_id: r for r in plans.QUERIES["interval_union_length"](spark, SF).collect()}
    durs = (
        Catalog(spark, SF)
        .events.groupBy("user_id")
        .agg(
            F.sum(
                F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) * 600000")
            ).alias("sum_us"),
            F.max(
                F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) * 600000")
            ).alias("max_us"),
        )
        .collect()
    )
    for r in durs:
        o = out[r.user_id]
        assert o.covered_us <= r.sum_us
        assert o.covered_us >= r.max_us
        assert o.n_islands <= o.n_events


def test_streak_accounting_adds_up(spark):
    """Run lengths partition the active days: Σ runs == active_days and
    longest ≤ active_days, with n_runs ≥ 1 for every active user."""
    for r in plans.QUERIES["user_streaks"](spark, SF).collect():
        assert r.n_runs >= 1
        assert r.longest_streak <= r.active_days
        assert r.active_days >= r.n_runs  # every run has ≥ 1 day


def test_kcore_census_is_monotone_nonincreasing(spark):
    rows = sorted(
        plans.QUERIES["graph_kcore"](spark, SF).collect(), key=lambda r: r.round
    )
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges


def test_kmv_overlap_bounds(spark):
    r = plans.QUERIES["kmv_overlap"](spark, SF).collect()[0]
    assert 0 <= r.j_common <= r.k_used
    assert r.inter_est <= r.union_est
    # The union estimate can't be below either side's true distinct count
    # by more than sketch error — sanity-bound it against the exact overlap.
    assert r.union_est >= r.exact_overlap


def test_audio_vad_counts_are_consistent(spark):
    for r in plans.QUERIES["mm_audio_energy"](spark, SF).collect():
        assert 0 <= r.n_voiced <= r.n_frames
        assert r.n_segments <= r.n_voiced
        assert (r.n_segments == 0) == (r.n_voiced == 0)
        assert r.energy_max <= r.energy_total


def test_attribution_splits_all_purchases(spark):
    """Attributed + organic purchase counts must equal the raw purchase
    count — attribution reassigns, never drops or double-counts."""
    from pyspark.sql import functions as F

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.catalog import Catalog

    out = plans.QUERIES["attribution_last_touch"](spark, SF)
    total = out.agg(F.sum("n_purchases")).collect()[0][0]
    raw = (
        Catalog(spark, SF)
        .events.where(F.col("event_type") == "purchase")
        .count()
    )
    assert total == raw


def test_bitmap_streaks_match_gaps_and_islands(spark):
    """Two independent algorithms, one truth: the longest run of set bits in
    each user's activity bitmap must equal the gaps-and-islands streak, and
    popcount must equal its active-day total."""
    bmp = {r.user_id: r for r in plans.QUERIES["activity_bitmap"](spark, SF).collect()}
    stk = {r.user_id: r for r in plans.QUERIES["user_streaks"](spark, SF).collect()}
    assert set(bmp) == set(stk)

    def longest_run(b: int) -> int:
        n = 0
        while b:
            b &= b << 1
            n += 1
        return n

    for uid, r in bmp.items():
        assert r.active_days == stk[uid].active_days, uid
        assert longest_run(r.days_bitmap) == stk[uid].longest_streak, uid


def test_hll_estimate_within_standard_error(spark):
    """HLL with m=64 has relative standard error 1.04/√64 ≈ 13%; the raw
    estimate must land within ~3σ of the exact count on the fixture."""
    r = plans.QUERIES["sketch_hll"](spark, SF).collect()[0]
    assert r.exact_distinct > 0
    rel = abs(r.est_raw - r.exact_distinct) / r.exact_distinct
    assert rel < 0.4, (r.est_raw, r.exact_distinct)


def test_growth_accounting_identity_reconciles(spark):
    """The accounting identity the quad exists for: actives(w) =
    actives(w−1) + new(w) + resurrected(w) − churned(w) for every week
    after the first."""
    rows = plans.QUERIES["growth_accounting"](spark, SF).collect()
    byweek: dict[int, dict[str, int]] = {}
    for r in rows:
        byweek.setdefault(r.wk, {}).setdefault(r.status, 0)
        byweek[r.wk][r.status] += r.n
    weeks = sorted(byweek)

    def actives(w):
        d = byweek.get(w, {})
        return d.get("new", 0) + d.get("retained", 0) + d.get("resurrected", 0)

    for prev, cur in zip(weeks, weeks[1:]):
        if cur != prev + 1:
            continue
        d = byweek[cur]
        expect = (
            actives(prev)
            + d.get("new", 0)
            + d.get("resurrected", 0)
            - d.get("churned", 0)
        )
        assert actives(cur) == expect, (cur, d, actives(prev))
