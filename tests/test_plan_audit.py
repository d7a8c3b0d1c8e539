"""Plan-audit tests: the scale properties of headline operators, asserted
mechanically (lakehouse_ingestion_spark/plans/audit.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.plans import audit

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as em

    return em


def test_counts_on_simple_agg(spark):
    df = spark.range(0, 1000, 1, 4).groupBy((F.col("id") % 7).alias("k")).count()
    a = audit(df, execute=True)
    assert a.shuffle_exchanges == 1
    assert a.joins == {}
    assert a.codegen_spans >= 1


def test_broadcast_join_detected(spark):
    big = spark.range(0, 1000, 1, 4)
    small = spark.range(0, 10).withColumnRenamed("id", "sid")
    df = big.join(F.broadcast(small), big.id == small.sid)
    a = audit(df)
    assert a.broadcast_exchanges == 1
    assert a.joins.get("BroadcastHashJoin") == 1
    assert not a.has_nested_loop


def test_pricing_summary_pushdown(spark, entrymod):
    df = entrymod.queries()["pricing_summary"](spark, SF_DIR)
    a = audit(df)
    # the shipdate filter must reach the parquet scan
    assert any("l_shipdate" in p for p in a.pushed_filters)
    # partial+final agg: exactly one shuffle
    assert a.shuffle_exchanges == 1
    assert not a.python_in_plan


def test_dedup_latest_single_shuffle(spark, entrymod):
    df = entrymod.queries()["dedup_latest"](spark, SF_DIR)
    a = audit(df)
    assert a.shuffle_exchanges == 1  # one window partition-by, no join-back
    assert a.joins == {}


def test_enrich_all_broadcast(spark, entrymod):
    df = entrymod.queries()["enrich"](spark, SF_DIR)
    a = audit(df)
    # every dim join broadcasts: the fact side never shuffles
    assert a.joins.get("BroadcastHashJoin", 0) >= 3
    assert a.shuffle_exchanges == 0
    assert not a.has_nested_loop


def test_range_join_no_nested_loop(spark, entrymod):
    df = entrymod.queries()["range_join"](spark, SF_DIR)
    assert not audit(df).has_nested_loop


def test_multimodal_is_python_by_design(spark, entrymod):
    df = entrymod.queries()["multimodal"](spark, SF_DIR)
    assert audit(df).python_in_plan


def test_quality_filter_map_only(spark, entrymod):
    """The whole rule chain is one fused projection: no shuffle beyond
    the fixture fan-out repartition, no joins, no Python."""
    from lakehouse_ingestion_spark.operators.quality import (
        apply_quality_rules,
        default_quality_rules,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = audit(apply_quality_rules(d, default_quality_rules()))
    assert a.shuffle_exchanges == 0
    assert a.joins == {}
    assert not a.python_in_plan


def test_tfidf_broadcast_corpus_count(spark, entrymod):
    """tf + df aggregations shuffle; the global N joins via a BROADCAST
    nested loop over a 1-row frame (benign; same shape as seq_pack's
    width scalar) — never a CartesianProduct shuffle."""
    df = entrymod.queries()["tfidf"](spark, SF_DIR)
    a = audit(df)
    assert a.broadcast_exchanges >= 1
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_bm25_prunes_before_aggregation(spark, entrymod):
    """The query-vocabulary prune must sit below the explode (the
    generator emits only matching tokens), N/avgdl arrive as ONE fused
    1-row broadcast aggregate, and df is a window — no second corpus
    tokenization and no sort-merge dl join anywhere in the plan."""
    df = entrymod.queries()["bm25"](spark, SF_DIR)
    a = audit(df)
    assert a.broadcast_exchanges >= 1  # the fused (N, avgdl) scalar frame
    assert a.joins.get("CartesianProduct", 0) == 0
    assert a.joins.get("SortMergeJoin", 0) == 0  # dl rides the tf rows
    assert not a.python_in_plan
    # the filtered explode sits below the tf aggregation
    assert "term" in a.plan and "filter(" in a.plan


def test_ann_fused_single_corpus_pass(spark, entrymod):
    """ivf_topk and lsh_topk: ONE Python stage over the corpus; the only
    shuffle ranks the queries x ~k sliver (plus the final window)."""
    for name in ("ann_ivf", "ann_lsh"):
        df = entrymod.queries()[name](spark, SF_DIR)
        a = audit(df)
        assert sum(a.python_stages.values()) == 1, (name, a.summary())
        assert a.joins == {}, name


def test_embed_quant_map_only(spark, entrymod):
    """Vectorized quantization: one Arrow Python stage, no joins, no
    shuffle beyond the fixture fan-out."""
    df = entrymod.queries()["embed_quant"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    assert sum(a.python_stages.values()) == 1


def test_cluster_split_no_cartesian_no_python(spark, entrymod):
    """Leakage-safe split (round 7): the rep attach is one equi-join
    (SortMerge by default — the CC output is a stats-less checkpointed
    RDD and corpus-bounded in the worst case), the split assignment is
    a pure codegen projection, and nothing goes cartesian or drops to
    Python."""
    df = entrymod.queries()["cluster_split"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert a.joins.get("BroadcastNestedLoopJoin", 0) == 0
    assert not a.python_in_plan


def test_sticky_split_and_incr_clusters_stay_jvm_side(spark, entrymod):
    """The round-8 CC-family queries: no cartesian products, no
    row-at-a-time Python anywhere in the plans."""
    for q in ("sticky_split", "incr_clusters"):
        df = entrymod.queries()[q](spark, SF_DIR)
        a = audit(df)
        assert a.joins.get("CartesianProduct", 0) == 0, q
        assert a.joins.get("BroadcastNestedLoopJoin", 0) == 0, q
        assert not a.python_in_plan, q


def test_broadcast_gate_behavior(spark):
    """plans/hints.py: the scan estimate is file-size-accurate, the
    gate hints under the cap and withholds past it."""
    from pyspark.sql import functions as F

    from lakehouse_ingestion_spark.plans.hints import (
        broadcast_if_under,
        scan_estimate_bytes,
    )

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    small = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    sz = scan_estimate_bytes(small)
    assert 0 < sz < 1 << 20  # nation is tiny and the estimate knows it

    open_gate = lineitem.join(
        broadcast_if_under(small, sz), lineitem.l_suppkey == small.n_nationkey
    )
    a = audit(open_gate)
    assert a.joins.get("BroadcastHashJoin", 0) == 1

    # past the cap the hint is withheld: with a sub-byte cap AND a
    # zeroed session auto-threshold the join must NOT broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        closed = lineitem.join(
            broadcast_if_under(small, sz, cap_bytes=0),
            lineitem.l_suppkey == small.n_nationkey,
        )
        a2 = audit(closed)
        assert a2.joins.get("BroadcastHashJoin", 0) == 0, a2.summary()
        assert a2.joins.get("SortMergeJoin", 0) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_q8_fact_side_never_shuffles(spark, entrymod):
    """Round-8 rework: the SF-scaling sides (asia_cust, asia_orders,
    supp_nat, part projection) carry SIZE-GATED hints (plans/hints.py)
    keyed on accurate scan estimates — an unconditional hint would
    bypass the size gate and OOM instead of degrading at 100-TB scale,
    while no hint at all costs the lineitem exchange at sf10 (static
    join estimates are garbage without column stats; AQE converts only
    after the exchange ran: 9.4 vs 4.4 s measured). At bench scale the
    gate is open, so every lineitem-side join broadcasts and the only
    exchange left is the final o_year aggregation."""
    df = entrymod.queries()["q8_market_share"](spark, SF_DIR)
    a = audit(df, execute=True)  # AQE-final plan
    assert a.joins.get("SortMergeJoin", 0) == 0, a.summary()
    assert a.joins.get("BroadcastHashJoin", 0) >= 3, a.summary()
    assert a.joins.get("CartesianProduct", 0) == 0


def test_q3_customer_join_broadcasts_unhinted(spark, entrymod):
    """q3's segment-filtered customer frame carries a size-gated hint
    since r8 (customer scales with SF); at bench scale the gate is
    open and the join broadcasts."""
    df = entrymod.queries()["q3_shipping"](spark, SF_DIR)
    a = audit(df, execute=True)
    assert a.joins.get("BroadcastHashJoin", 0) >= 1, a.summary()
    assert not a.has_nested_loop


def test_q10_broadcasts_nation(spark, entrymod):
    df = entrymod.queries()["q10_returned_items"](spark, SF_DIR)
    a = audit(df)
    assert a.broadcast_exchanges >= 1
    assert not a.has_nested_loop


def test_q4_exists_plans_semi_join(spark, entrymod):
    df = entrymod.queries()["q4_priority_returns"](spark, SF_DIR)
    a = audit(df)
    assert "LeftSemi" in a.plan
    assert not a.has_nested_loop
    # the returnflag filter sits below the join (on the scan side)
    assert "l_returnflag" in a.plan


def test_q19_disjunction_keeps_equi_join(spark, entrymod):
    """The OR-of-ANDs must not degrade the partkey equi-join into a
    nested loop."""
    df = entrymod.queries()["q19_brand_quantity"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert not a.has_nested_loop


def test_q6_scan_only_single_shuffle(spark, entrymod):
    """Q6 is the minimal plan: all predicates pushed to the scan, one
    partial+final aggregate exchange, nothing else."""
    df = entrymod.queries()["q6_forecast"](spark, SF_DIR)
    a = audit(df)
    assert any("l_shipdate" in p for p in a.pushed_filters)
    assert a.joins == {}
    assert a.shuffle_exchanges == 1
    assert not a.python_in_plan


def test_q7_dims_broadcast_before_fact_shuffle(spark, entrymod):
    """Nation/supplier/customer lookups must all broadcast; the only
    permissible shuffles involve the two fact tables and the final agg."""
    df = entrymod.queries()["q7_volume_shipping"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 3
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_q13_aggregates_orders_before_outer_join(spark, entrymod):
    """The per-customer count must sit BELOW the outer join (orders
    shrink before shuffling), and the priority filter below that."""
    df = entrymod.queries()["q13_custdist"](spark, SF_DIR)
    a = audit(df)
    assert not a.has_nested_loop
    plan = a.plan
    # the o_orderpriority filter reaches the orders scan
    assert any("o_orderpriority" in p for p in a.pushed_filters) or (
        "o_orderpriority" in plan
    )
    # outer join present, aggregation below it (HashAggregate appears on
    # the build side of the join in the plan tree)
    assert "LeftOuter" in plan or "RightOuter" in plan


def test_q17_correlated_avg_stays_decimal(spark, entrymod):
    """The avg comparison is algebraic decimal (qty*n*5 < sum): no
    double division anywhere in the predicate, part filter broadcast."""
    df = entrymod.queries()["q17_small_quantity"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 2
    assert not a.has_nested_loop


def test_q18_having_filters_before_join(spark, entrymod):
    """The sum_qty > 250 HAVING must apply on the grouped lineitem
    BEFORE the orders join, so only qualifying orderkeys shuffle."""
    df = entrymod.queries()["q18_large_orders"](spark, SF_DIR)
    a = audit(df)
    assert not a.has_nested_loop
    plan = a.plan
    # the filter on the aggregate result appears below the join with
    # orders: find a Filter mentioning sum_qty
    assert "sum_qty" in plan


def test_q22_anti_join_not_cartesian(spark, entrymod):
    """NOT EXISTS plans as an anti join; the 1-row stats frame joins by
    broadcast (a single-row cross product is fine — a row-by-row
    nested loop over customers is not)."""
    df = entrymod.queries()["q22_sales_opportunity"](spark, SF_DIR)
    a = audit(df)
    assert "LeftAnti" in a.plan
    assert a.joins.get("BroadcastHashJoin", 0) >= 1


def test_q2_pair_distinct_then_broadcast(spark, entrymod):
    """The lineitem part/supplier bridge shuffles only its two key
    columns (pair distinct); part, the EU supplier dim, and the
    per-part min all broadcast onto it — no sort-merge join anywhere."""
    df = entrymod.queries()["q2_min_supplier"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 3
    assert a.joins.get("SortMergeJoin", 0) == 0
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_q11_scalar_threshold_broadcasts(spark, entrymod):
    """The nation-total scalar is a 1-row broadcast (its non-equi
    comparison plans as a nested loop over ONE build row — fine); the
    supplier/nation dims broadcast-hash-join, and the only real shuffle
    is the per-part aggregation."""
    df = entrymod.queries()["q11_important_parts"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 2
    assert a.joins.get("SortMergeJoin", 0) == 0
    assert a.shuffle_exchanges <= 3
    assert not a.python_in_plan


def test_q12_date_window_after_equi_join(spark, entrymod):
    """The correlated date-window predicate can't push below the join,
    but the 1997 shipdate slice must reach the lineitem scan, and the
    orderkey join stays an equi-join (no nested loop from the interval
    arithmetic)."""
    df = entrymod.queries()["q12_shipping_delay"](spark, SF_DIR)
    a = audit(df)
    assert any("l_shipdate" in p for p in a.pushed_filters)
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_q16_exclusion_is_anti_join(spark, entrymod):
    """The complained-suppliers NOT IN must plan as a broadcast
    anti-join over the pair-distinct bridge, never a nested loop."""
    df = entrymod.queries()["q16_supplier_counts"](spark, SF_DIR)
    a = audit(df)
    assert "LeftAnti" in a.plan
    assert not a.has_nested_loop


def test_q20_semi_joins_keep_supplier_unshuffled(spark, entrymod):
    """Both IN-subqueries plan as broadcast semi-joins; the supplier
    table itself never shuffles."""
    df = entrymod.queries()["q20_promotion_suppliers"](spark, SF_DIR)
    a = audit(df)
    assert "LeftSemi" in a.plan
    # the above-average scalar is the one 1-row nested loop; every
    # per-row join is a broadcast hash join
    assert a.joins.get("BroadcastHashJoin", 0) >= 3
    assert a.joins.get("SortMergeJoin", 0) == 0
    assert not a.python_in_plan


def test_q21_single_pass_aggregate_decision(spark, entrymod):
    """The EXISTS/NOT-EXISTS pair is decided by the two-level
    per-(order,supplier) -> per-order aggregate over ONE
    lineitem⋈orders slice — no semi/anti self-joins (which recomputed
    and reshuffled the slice per existence check), no countDistinct
    Expand, no nested loop; the only joins are the slice join, the
    supplier⋈nation dim build, and the broadcast nation attach."""
    df = entrymod.queries()["q21_waiting_suppliers"](spark, SF_DIR)
    a = audit(df)
    assert "LeftSemi" not in a.plan
    assert "LeftAnti" not in a.plan
    assert "Expand" not in a.plan
    assert sum(a.joins.values()) == 3
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_jaccard_pairs_no_cartesian(spark, entrymod):
    """The exact-Jaccard join must search via the prefix inverted index:
    an n-gram equi-join, never a cartesian/nested-loop all-pairs."""
    df = entrymod.queries()["jaccard_pairs"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_domain_cap_plans_window_group_limit(spark, entrymod):
    """A constant per-group cap must plan WindowGroupLimit (bounded
    map-side heap) — not a full per-group sort of the corpus."""
    df = entrymod.queries()["domain_cap"](spark, SF_DIR)
    a = audit(df)
    assert "WindowGroupLimit" in a.plan
    assert a.joins == {}
    assert not a.python_in_plan


def test_funnel_single_user_shuffle(spark, entrymod):
    """The funnel is one groupBy(user) fold — no k-way self-joins over
    the event stream; the step-ladder frames are tiny driver-side
    constants."""
    df = entrymod.queries()["funnel"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("SortMergeJoin", 0) == 0
    assert not a.python_in_plan


def test_pit_join_is_equi_join_with_residual(spark, entrymod):
    """The interval predicate must ride as a residual on the user_id
    equi-join — never degrade to a nested loop over facts x versions."""
    df = entrymod.queries()["pit_join"](spark, SF_DIR)
    a = audit(df)
    assert not a.has_nested_loop
    assert a.joins.get("CartesianProduct", 0) == 0


def test_incr_gold_merges_partials_only(spark, entrymod):
    """Three state merges must stay pure aggregations — no joins, no
    Python; each delta collapses map-side before any union."""
    df = entrymod.queries()["incr_gold"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    assert not a.python_in_plan


def test_sketch_rollup_broadcasts_dims(spark, entrymod):
    df = entrymod.queries()["sketch_rollup"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 3
    assert not a.has_nested_loop


def test_edit_join_segment_index_no_cartesian(spark, entrymod):
    """Candidates come from the (segment, text, length) hash equi-join;
    the only permissible nested loop is the tiny short-string fallback
    (both sides length <= 2k — broadcast)."""
    df = entrymod.queries()["edit_join"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_pit_join_dim_broadcasts_from_parquet(spark, entrymod):
    """With the SCD2 dimension materialized to parquet (pit_build), the
    planner sees real size stats: the dim side broadcasts and the fact
    table never shuffles."""
    df = entrymod.queries()["pit_join"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert a.shuffle_exchanges == 0
    assert not a.has_nested_loop


def test_tdigest_partials_map_only(spark):
    """The t-digest build is classic partial aggregation: raw values
    NEVER shuffle (partials are map-only); only the bounded digest rows
    shuffle in the merge."""
    from lakehouse_ingestion_spark.operators.sketches import (
        quantile_sketches,
        tdigest_partials,
    )

    df = spark.range(0, 10_000, 1, 8).select(
        (F.col("id") % 5).alias("g"), (F.col("id") * 1.0).alias("v")
    )
    assert audit(tdigest_partials(df, ["g"], "v")).shuffle_exchanges == 0
    a = audit(quantile_sketches(df, ["g"], "v"))
    assert a.shuffle_exchanges == 1
    assert a.joins == {}


def test_topk_sketch_candidates_broadcast(spark, entrymod):
    """The exact-confirm pass semi-joins against the BROADCAST candidate
    set (never a shuffle of the full token table against candidates);
    the only nested loop is the 1-row total attach."""
    df = entrymod.queries()["topk_sketch"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert a.joins.get("CartesianProduct", 0) == 0
    assert a.joins.get("BroadcastNestedLoopJoin", 0) <= 1


def test_weighted_sample_no_sort_no_cartesian(spark, entrymod):
    """Weighted sampling is a filter, not a top-k: no global sort, no
    cartesian; the single nested loop is the 1-row total-weight attach."""
    df = entrymod.queries()["weighted_sample"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert a.joins.get("BroadcastNestedLoopJoin", 0) <= 1
    assert "Sort [" not in a.plan or "SortAggregate" in a.plan


def test_pii_scrub_map_only(spark, entrymod):
    """PII scrubbing is a single fused projection: zero shuffles, zero
    joins, no Python workers — the regex chain rides codegen. (Audit
    the operator on the raw scan: the query wrapper's
    ensure_parallelism fan-out adds a round-robin shuffle at this
    single-file fixture scale that is a no-op at real scale.)"""
    from lakehouse_ingestion_spark.operators.pii import scrub_text

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = scrub_text(d, out_col="scrubbed")
    a = audit(df)
    assert a.shuffle_exchanges == 0
    assert a.joins == {}
    assert not a.python_in_plan
    assert a.codegen_spans >= 1


def test_line_dedup_two_keyed_shuffles_no_python(spark, entrymod):
    """Line dedup: count shuffle + reassembly shuffle, both keyed; the
    count side joins back without a nested loop; all JVM."""
    df = entrymod.queries()["line_dedup"](spark, SF_DIR)
    a = audit(df)
    assert not a.has_nested_loop
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_lm_perplexity_model_broadcasts(spark, entrymod):
    """Scoring joins the bigram/context count frames via broadcast —
    the exploded corpus side must never shuffle for the model join.

    The fused self-scoring path localCheckpoints the score frame (to
    release its bigram cache), which collapses the model joins out of
    the final plan — so the broadcast property is audited on the lazy
    train+score composition, and the queries() entry is checked for
    the remaining visible invariants (no cartesian, no Python)."""
    from lakehouse_ingestion_spark.operators.lm_score import (
        score_perplexity,
        train_bigram_lm,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bg, ctx, v = train_bigram_lm(d)
    lazy = audit(score_perplexity(d, bg, ctx, v))
    assert lazy.joins.get("BroadcastHashJoin", 0) >= 2
    assert lazy.broadcast_exchanges >= 2
    assert lazy.joins.get("CartesianProduct", 0) == 0

    df = entrymod.queries()["lm_perplexity"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_semantic_dedup_bucket_matmul_no_cartesian(spark, entrymod):
    """Intra-bucket pair cosines ride ONE grouped Arrow/BLAS stage
    (FlatMapGroupsInPandas, the cosine_dup idiom) — never an all-pairs
    nested loop or an interpreted per-pair fold."""
    df = entrymod.queries()["semantic_dedup"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.has_nested_loop
    assert "FlatMapGroupsInPandas" in a.plan


def test_exact_substr_window_keyed_no_python(spark, entrymod):
    """Span merge windows are per-document (keyed shuffle, bounded
    partitions) — no global single-partition window, no Python."""
    df = entrymod.queries()["exact_substr"](spark, SF_DIR)
    a = audit(df)
    assert "partial" not in {j.lower() for j in a.joins}  # sanity
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan
    # per-doc windows: plan must show a Window with partition spec
    assert "Window" in a.plan and "doc_id" in a.plan


def test_ngram_novelty_two_shuffles_no_python(spark, entrymod):
    """Novelty: distinct + min-id + per-doc ratio — keyed aggregations
    only, no cartesian, no Python."""
    df = entrymod.queries()["ngram_novelty"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_incr_near_dup_no_cartesian_batch_sized(spark, entrymod):
    """Candidates come from (band, key) equi-joins — batch vs index and
    batch self — never a cartesian; verification joins fetch only the
    candidates' hash sets."""
    df = entrymod.queries()["incr_near_dup"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_resample_grid_from_spans_no_calendar_join(spark, entrymod):
    """The grid explodes from the one-row-per-key span aggregate (no
    generated-calendar join); the ffill window is keyed per user."""
    df = entrymod.queries()["resample"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.has_nested_loop
    assert not a.python_in_plan
    assert "Window" in a.plan and "user_id" in a.plan


def test_bloom_dedup_sharded_broadcast_shard_join(spark, entrymod):
    """The sharded screen equi-joins the batch's computed shard id
    against the broadcast filter rows — broadcast hash join, no
    cartesian (the unsharded screen's scalar crossJoin shape is gone),
    no Python."""
    df = entrymod.queries()["bloom_dedup_sharded"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.has_nested_loop
    assert not a.python_in_plan


def test_dedup_content_single_exchange_partial_agg(spark, entrymod):
    """Content dedup: ONE fingerprint-keyed exchange with a map-side
    partial min_by below it — a corpus-hot fingerprint combines before
    it shuffles."""
    df = entrymod.queries()["dedup_content"](spark, SF_DIR)
    a = audit(df)
    assert a.shuffle_exchanges == 1
    assert a.joins == {}
    assert not a.python_in_plan
    assert "partial_min_by" in a.plan


def test_random_proj_map_only_single_arrow_stage(spark, entrymod):
    """JL projection: one Arrow Python stage (the tiled matmul), no
    joins, no shuffle beyond the fixture fan-out; summary expressions
    stay JVM-side."""
    df = entrymod.queries()["random_proj"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    assert sum(a.python_stages.values()) == 1


def test_bm25_topk_broadcast_fanout_no_sortmerge(spark, entrymod):
    """Multi-query retrieval: the (query_id, term) fan-out and the 1-row
    corpus stats both broadcast — no sort-merge join keyed wider than
    (doc, term) anywhere; the BroadcastNestedLoop is the 1-row
    scalar-attach idiom."""
    df = entrymod.queries()["bm25_topk"](spark, SF_DIR)
    a = audit(df)
    assert "SortMergeJoin" not in a.joins
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert sum(a.python_stages.values()) == 0


def test_contamination_broadcast_both_joins(spark, entrymod):
    """Per-eval-example audit: the eval shingle join AND the eval-sized
    rollup presentation join are both BroadcastHash (the rollup hides
    its stats behind an aggregate, so the explicit hint matters)."""
    df = entrymod.queries()["contamination"](spark, SF_DIR)
    a = audit(df)
    assert a.joins.get("BroadcastHashJoin", 0) == 2
    assert "SortMergeJoin" not in a.joins
    assert "CartesianProduct" not in a.joins


def test_event_dedup_keyed_window_only(spark, entrymod):
    """Time-window dedup: ONE keyed lag window, no joins, no
    partitionless window (the WindowExec warning class the
    quantile_buckets gate exists for)."""
    df = entrymod.queries()["event_dedup"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(user_id" in plan.replace("#", "").replace(
        "L", ""
    ) or "user_id" in plan  # keyed, not global


def test_quantile_agg_no_window_broadcast_edges(spark, entrymod):
    """Aggregation-path bucketing: zero Window nodes, edges attach via
    BroadcastHash."""
    df = entrymod.queries()["quantile_agg"](spark, SF_DIR)
    a = audit(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert a.joins.get("BroadcastHashJoin", 0) == 1


def test_top_p_keyed_window_no_join(spark, entrymod):
    """Per-stratum top-p: both window frames ride ONE keyed exchange;
    no join, no partitionless window."""
    df = entrymod.queries()["top_p"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(lang" in plan.replace("#", "").replace(
        "L", ""
    ) or "lang" in plan


def test_top_p_frac_same_shape_as_top_p(spark, entrymod):
    """Fractional-score top-p keeps the integral path's plan: ONE keyed
    exchange, zero joins — the dtype branch changes arithmetic, not the
    physical shape."""
    df = entrymod.queries()["top_p_frac"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    assert a.python_stages == {}


def test_bpe_histogram_map_side_combined_agg(spark, entrymod):
    """The corpus-sized half of BPE training is ONE hash aggregate:
    zero joins, zero Python stages, no window — partial (map-side)
    combine below the single word-keyed exchange."""
    df = entrymod.queries()["bpe_histogram"](spark, SF_DIR)
    a = audit(df)
    assert a.joins == {}
    assert a.python_stages == {}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_winnow_fingerprints_map_only(spark):
    """Fingerprinting never shuffles: two stacked projections + explode
    (the hash-array materialization boundary), all JVM-side."""
    from lakehouse_ingestion_spark.operators.winnow import winnow_fingerprints

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = audit(winnow_fingerprints(d, k=8, w=16))
    assert a.shuffle_exchanges == 0
    assert a.joins == {}
    assert not a.python_in_plan


def test_winnow_overlap_keyed_join_no_cartesian(spark):
    """The pair join is fp-keyed (SortMergeJoin/ShuffledHashJoin on the
    fingerprint) — never a cartesian, never Python."""
    from lakehouse_ingestion_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_overlap,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = audit(winnow_overlap(winnow_fingerprints(d)))
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_cms_estimate_broadcasts_sketch(spark):
    """The probe join broadcasts the bounded counter frame (depth*width
    rows by construction) — the probe side never shuffles for the join."""
    from lakehouse_ingestion_spark.operators.cms import cms_build, cms_estimate

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
    counters = cms_build(toks, "token", depth=4, width=64)
    probes = toks.limit(50).distinct()
    a = audit(cms_estimate(counters, probes, "token", depth=4, width=64))
    assert a.broadcast_exchanges >= 1
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_er_candidate_pairs_block_keyed(spark, entrymod):
    """ER candidate generation joins on the block key — no cartesian, no
    Python; the Levenshtein match is a JVM expression."""
    from lakehouse_ingestion_spark.operators.er import candidate_pairs

    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    a = audit(candidate_pairs(c, "id", "name"))
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan


def test_robust_scale_single_agg_broadcast_no_window(spark):
    """ONE percentile aggregate + broadcast edge join + projection: at
    most the agg's exchanges, a broadcast join, and ZERO Window nodes
    (the plan a per-group sort-based scaler would have)."""
    from lakehouse_ingestion_spark.operators.stats import robust_scale

    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = audit(robust_scale(l, "l_extendedprice", ["l_returnflag"]))
    assert a.broadcast_exchanges >= 1
    assert a.joins.get("BroadcastHashJoin", 0) >= 1
    assert "Window" not in a.plan
    assert not a.python_in_plan
