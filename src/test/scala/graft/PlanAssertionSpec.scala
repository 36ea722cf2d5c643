package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: these are the properties that make the
  * operators scale (SURVEY.md §4.2, PLANS.md) — if a future change
  * loses a pushdown or a broadcast, these fail before any benchmark
  * does. */
class PlanAssertionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum")) // map-side combine before the shuffle
  }

  test("scan_parquet: key predicate is pushed and schema pruned") {
    val p = plan("scan_parquet")
    assert(p.contains("LessThan(l_orderkey,1000)"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"))
    assert(!p.contains("l_shipdate")) // unreferenced column pruned from scan
  }

  test("join_inner_hash: dim side broadcasts") {
    assert(plan("join_inner_hash").contains("BroadcastHashJoin"))
  }

  test("join_sortmerge: merge hint holds") {
    assert(plan("join_sortmerge").contains("SortMergeJoin"))
  }

  test("sort_limit: global top-N plans as TakeOrderedAndProject") {
    assert(plan("sort_limit").contains("TakeOrderedAndProject"))
  }

  test("profile_key_skew: top-10 cut is TakeOrdered, never a global window") {
    val p = plan("profile_key_skew")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 keys must be a distributed TakeOrdered cut")
    assert(!p.contains("Window"),
      "no unpartitioned row_number over the full key histogram")
  }

  test("dedup_minhash_pairs: banding join is a hash join, not a cross join") {
    val p = plan("dedup_minhash_pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("sim_cosine_topk: the tiny query side is the broadcast build") {
    assert(plan("sim_cosine_topk").contains("BroadcastNestedLoopJoin BuildRight"))
  }

  test("scan_partition_pruned: year filter prunes partitions at planning time") {
    val p = plan("scan_partition_pruned")
    assert(p.contains("PartitionFilters") && p.contains("o_year"))
    // the partition predicate must NOT survive as a data filter
    assert(!p.contains("PushedFilters: [IsNotNull(o_year)"))
  }

  test("join_range_binned: interval overlap plans as an equi-join, no nested loop") {
    val p = plan("join_range_binned")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("events_attribution: exactly one shuffle (on user_id)") {
    val p = plan("events_attribution")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(!p.contains("Join")) // window carry, not a self-join
  }

  test("agg_histogram: map-side partial aggregation before the bin shuffle") {
    val p = plan("agg_histogram")
    assert(p.contains("partial_count") || p.contains("partial count"))
  }

  test("pipeline_curate_corpus: five stages fuse into a single scan") {
    val p = plan("pipeline_curate_corpus")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      "curation pipeline should read documents exactly once")
  }

  test("scan_orc: predicate pushdown and column pruning reach the ORC scan") {
    val p = plan("scan_orc")
    assert(p.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0)]"))
    assert(p.contains("ReadSchema: struct<c_acctbal:double,c_mktsegment:string>"))
  }

  test("text_decontaminate: both tiers are keyed joins, no cartesian") {
    val p = plan("text_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("window_merge_intervals: one shuffle end-to-end (on l_suppkey)") {
    val p = plan("window_merge_intervals")
    // both window passes and both group-by levels reuse the suppkey
    // partitioning: a second hashpartitioning exchange means a regression
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
  }

  test("sql_q21: EXISTS/NOT EXISTS decorrelate to semi and anti joins") {
    val p = plan("sql_q21_waiting_suppliers")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sql_q22: anti-join form, scalar subqueries as single aggregates") {
    val p = plan("sql_q22_idle_customers")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThan(c_acctbal,0.0)")) // pushed to scan
  }

  test("scale_zorder: morton code folds into the grouping, scan pruned to 2 cols") {
    val p = plan("scale_zorder")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"))
    assert(p.contains("partial_count")) // map-side combine over 16 buckets
  }

  test("text_tfidf: no cartesian beyond the 1-row corpus-size broadcast") {
    val p = plan("text_tfidf")
    // the tf⋈df join must be a keyed join; only n_docs may nested-loop in
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
  }

  test("events_dau_wau: distinct user-days aggregate before the window explode") {
    val p = plan("events_dau_wau")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("events_rfm: per-user relation never crosses a single-partition window") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("events_rfm")(spark, TestSpark.sf).queryExecution
    val p = qe.sparkPlan.toString
    assert(!p.contains("ntile"), "quartiles must come from boundary joins, not ntile")
    // Global (unpartitioned) windows are allowed ONLY above the bounded
    // per-axis histogram — i.e. an aggregation must sit below each one,
    // proving the window's input is histogram-sized, not user-sized.
    val globalWindows = qe.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.nonEmpty, "boundary recipe should use histogram windows")
    globalWindows.foreach { w =>
      assert(w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
        s"global window over an un-reduced relation:\n$w")
    }
    // quartile assignment reaches users via broadcast of the 1-row bounds
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("scale_runtime_filter: bloom might_contain reaches the fact scan") {
    val df = SparkEntry.queries("scale_runtime_filter")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "runtime bloom filter not injected")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "pattern must exercise the shuffle-join path, not broadcast")
  }

  test("pipeline_pack_sequences: the running sum is per-shard, never global") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("pipeline_pack_sequences")(spark, TestSpark.sf).queryExecution
    val windows = qe.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "packing must window by shard_id — a global cumsum is a 100 TB straggler")
  }

  test("sample_per_group: partition-local pruning runs before the global rank") {
    val p = plan("sample_per_group")
    // stage 1: window keyed by (pid, event_type); stage 2: event_type only.
    assert(p.contains("pid"), "local pruning window missing — group-count skew returns")
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("sample_per_group")(spark, TestSpark.sf).queryExecution
    val windows = qe.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.size == 2, s"expected local+global windows, got ${windows.size}")
  }

  test("dedup_embedding: the cartesian is conditioned on a hard input cap") {
    // oversized inputs are rejected BEFORE any n² job is submitted
    val e = intercept[IllegalArgumentException] {
      operators.Dedup.dedupEmbeddingCapped(spark, TestSpark.sf, 5L)
    }
    assert(e.getMessage.contains("dedup_embedding_lsh"))
    // and the corpus-scale twin plans bucket-local, never cartesian
    assert(!plan("dedup_embedding_lsh").contains("CartesianProduct"))
  }

  test("sql_q6: all three predicates reach the scan, schema pruned to 4 cols") {
    val p = plan("sql_q6_forecast_revenue")
    // PushedFilters renders truncated in plan text; assert via the
    // filter node + the pruned ReadSchema instead
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains(">= 0.04") && p.contains("< 24.0"))
    assert(p.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"))
    assert(!p.contains("l_orderkey")) // unreferenced columns pruned
  }

  test("sql_q4: EXISTS with outer-date inequality decorrelates to a semi join") {
    val p = plan("sql_q4_priority_late")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
  }

  test("sql_q17: correlated scalar avg decorrelates to agg + equi-join") {
    val p = plan("sql_q17_small_qty_revenue")
    assert(p.contains("partial_avg") || p.contains("avg("))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sql_q16: NOT IN plans as a null-aware anti join, count-distinct is two-phase") {
    val p = plan("sql_q16_supplier_cnt")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("join_asof_nearest: two keyed shuffles, both window passes share one sort keyspace") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val qe = SparkEntry.queries("join_asof_nearest")(spark, TestSpark.sf).queryExecution
    val exchanges = qe.sparkPlan.collect { case e: ShuffleExchangeExec => e }
    // click pre-reduction on (user, µs) + the user-key window sort —
    // anything more means the pair-join formulation crept back in
    assert(exchanges.size <= 3, s"expected ≤3 exchanges, got ${exchanges.size}")
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus_budget_select: global cumsum happens only on the metadata relation") {
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("corpus_budget_select")(spark, TestSpark.sf).queryExecution
    val windows = qe.sparkPlan.collect { case w: WindowExec => w }
    // every unpartitioned window is the ≤ bins×256-row group-total
    // prefix sum — fed by the (bin, bucket) hash aggregate, never by
    // document rows (the prefix relation plans twice: full + boundary)
    val unpart = windows.filter(_.partitionSpec.isEmpty)
    assert(unpart.nonEmpty)
    assert(unpart.forall(_.child.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
          if a.groupingExpressions.map(_.name).toSet == Set("bin", "bucket") => a
    }.isDefined), "an unpartitioned window runs over document rows")
    // the in-group boundary resolution stays keyed by (bin, bucket)
    assert(windows.count(_.partitionSpec.nonEmpty) == 1)
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin")) // full/boundary sets broadcast
  }

  test("graph_pagerank: contribution aggregation shuffles on dst, never cartesian") {
    // probe one un-checkpointed iteration (the registered query's final
    // plan sits above already-materialized localCheckpoint RDDs)
    val (edgesDeg, nodes) = operators.Graph.pagerankParts(spark, TestSpark.sf)
    val ranks = nodes.withColumn("pr", org.apache.spark.sql.functions.lit(1e-3))
    val p = operators.Graph.pagerankStep(nodes, edgesDeg, ranks, 1000.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_sum")) // map-side combine on the contribution agg
  }

  test("join_bloom_prefilter: the membership gate runs below the join, fact side filtered at scan stage") {
    val qe = SparkEntry.queries("join_bloom_prefilter")(spark, TestSpark.sf).queryExecution
    val p = qe.sparkPlan.toString
    assert(p.contains("might_contain"), "bloom probe missing from the plan")
    // the probe must sit UNDER the join (gate before shuffle), not above it
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size == 1)
    assert(joins.head.toString.contains("might_contain"),
      "probe filter is not inside the join's subtree")
  }

  test("scale_scd2_apply: one join feeds the version fan-out, no per-branch re-join") {
    val qe = SparkEntry.queries("scale_scd2_apply")(spark, TestSpark.sf).queryExecution
    val joins = qe.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    // a UNION-of-selects formulation would plan the dim ⋈ changes join
    // once per output branch; the array_compact+explode form joins once
    assert(joins.size == 1, s"expected exactly 1 join, got ${joins.size}")
    val p = qe.executedPlan.toString
    assert(p.contains("Generate explode")) // single-pass ≤2-row fan-out
    assert(!p.contains("CartesianProduct"))
  }

  test("join_scd2_pit: validity range stays a residual on the equi-join") {
    // the PIT predicate must never degrade the keyed join to a
    // nested-loop range join
    val p = plan("join_scd2_pit")
    assert(!p.contains("BroadcastNestedLoop"))
    assert(!p.contains("CartesianProduct"))
  }

  test("graph_copurchase_lift: basket self-join keys on the order id") {
    val p = plan("graph_copurchase_lift")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoop"))
  }

  test("sample_weighted: global k-smallest plans as TakeOrderedAndProject") {
    val p = plan("sample_weighted")
    // the corpus is never globally sorted: per-partition top-k, k-row gather
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("dedup_jaccard_prefix: candidate and verify joins are keyed, no cartesian") {
    val p = plan("dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoop"))
  }

  test("graph_triangles: every hop is a keyed join, no cartesian") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoop"))
  }

  test("scale_stats_collect: no Expand — NDVs must not replicate the scan rows") {
    // five count_distincts in one agg would plan Expand (5× row
    // replication through one shuffle); the split form must never
    val p = plan("scale_stats_collect")
    assert(!p.contains("Expand"), "multi-distinct Expand crept back in")
  }

  test("sim_ann_ivfpq: ADC scoring joins on cell+code keys, LUT broadcasts") {
    val p = plan("sim_ann_ivfpq")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoop"))
    assert(p.contains("BroadcastHashJoin")) // the |Q|·m·k LUT side
  }

  test("agg_corr_matrix: all six pairs aggregate in one scan, one partial agg") {
    val qe = SparkEntry.queries("agg_corr_matrix")(spark, TestSpark.sf).queryExecution
    val scans = qe.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected 1 lineitem scan, got ${scans.size}")
    val p = qe.sparkPlan.toString
    assert(p.contains("partial_corr"), "map-side partial co-moments missing")
  }

  test("dedup_containment: candidate join is keyed — no cartesian anywhere") {
    val p = plan("dedup_containment")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("events_feature_matrix: all eight features fold into ONE user-keyed aggregate") {
    val qe = SparkEntry.queries("events_feature_matrix")(spark, TestSpark.sf).queryExecution
    // one logical aggregate = exactly one final HashAggregate keyed on
    // user_id (plus its partial); a second grouping would double-shuffle
    val aggs = qe.sparkPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.groupingExpressions.nonEmpty => a
    }
    // partial + distinct-expansion + final stages of the SAME aggregate
    // (count-distinct legally groups on (user_id, d) mid-pipeline);
    // every stage must still be KEYED ON user_id first — a grouping on
    // any other leading key would mean a second, unrelated shuffle
    assert(aggs.nonEmpty)
    aggs.foreach { a =>
      assert(a.groupingExpressions.head.references.head.name == "user_id",
        s"unexpected grouping: ${a.groupingExpressions}")
    }
    // the corpus-max enrich must be a 1-row broadcast, not a shuffle join
    assert(plan("events_feature_matrix").contains("BroadcastNestedLoopJoin"))
  }

  test("agg_weighted_percentile: both window frames share one exchange") {
    val qe = SparkEntry.queries("agg_weighted_percentile")(spark, TestSpark.sf).queryExecution
    val exchanges = qe.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // cumsum + partition-total windows and the final hash-agg must not
    // introduce separate l_returnflag shuffles: 1 for the window pair
    // (the agg reuses the partitioning), plus the output range sort
    assert(exchanges.size <= 2, s"expected <=2 exchanges, got ${exchanges.size}")
  }

  test("sample_negatives: anti-join is keyed; probe side never explodes") {
    val p = plan("sample_negatives")
    assert(p.contains("LeftAnti"), "purchased-parts exclusion must be an anti-join")
    assert(!p.contains("CartesianProduct"))
  }

  test("stats_bootstrap_ci: the x32 explode combines map-side before any shuffle") {
    val p = plan("stats_bootstrap_ci")
    // the replicate fan-out must reduce to (group x rep) partials on
    // the map side — shipping 32x the fact table would be the naive
    // bootstrap this operator exists to avoid
    assert(p.contains("partial_sum"), "expected map-side partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("join_dpp: dim filter prunes fact partitions at runtime") {
    val p = plan("join_dpp")
    assert(p.contains("dynamicpruningexpression"),
      "fact scan must carry a runtime dynamic-partition-pruning filter")
    assert(p.contains("SubqueryAdaptiveBroadcast") || p.contains("SubqueryBroadcast"),
      "the DPP subquery must reuse the join's broadcast, not rescan the dim")
  }

  test("text_winnowing_matches: candidate join is fingerprint-keyed, never pairwise") {
    val p = plan("text_winnowing_matches")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "winnowing match must join on wmin buckets, not compare documents pairwise")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 pair cut must be a distributed TakeOrdered, not a global sort")
  }

  test("agg_kmv_setops: every bottom-k cut is a distributed TakeOrdered") {
    val p = plan("agg_kmv_setops")
    // K_A, K_B, and the merged sketch: three TakeOrdered cuts, k rows
    // of driver state each — a global Sort here would single-partition
    // the distinct-key relation at scale
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 3,
      "expected 3 bottom-k TakeOrderedAndProject cuts")
    assert(!p.contains("CartesianProduct"), // 1-row × 1-row stat join broadcasts
      "exact-vs-estimate combine must broadcast the single-row frames")
  }

  test("stats_feature_scale: group stats broadcast back — no per-group window") {
    val p = plan("stats_feature_scale")
    assert(p.contains("BroadcastHashJoin"),
      "the 3-row stats relation must broadcast to the fact side")
    assert(!p.contains("Window"),
      "scaling must not funnel fact rows into 3 returnflag window partitions")
    assert(p.contains("partial_avg"), "group stats combine map-side")
  }

  test("stats_ks_test: ECDF windows run on the value histogram, not fact rows") {
    val p = plan("stats_ks_test")
    // the only SinglePartition exchange input is the <=50-row histogram
    assert(p.contains("partial_sum(CASE WHEN"),
      "per-value group counts must combine map-side before any shuffle")
    assert(p.contains("In(l_returnflag, [A,R])"),
      "population filter must reach the parquet scan")
  }

  test("stats_chi2: contingency cells combine map-side; fold is metadata-sized") {
    val p = plan("stats_chi2")
    assert(p.contains("partial_count"),
      "cell counts must combine map-side before the (type, wd) shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("text_heavy_hitters: two corpus scans exactly — total folds into the sketch pass") {
    val qe = SparkEntry.queries("text_heavy_hitters")(spark, TestSpark.sf).queryExecution
    val scans = qe.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // sketch+total share one scan; the exact candidate recount is the
    // second — a third scan means the grand total regressed to its own
    // pass
    assert(scans.size == 2, s"expected exactly 2 parquet scans, got ${scans.size}")
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      "candidate list must broadcast into the recount")
  }

  test("stats_winsorize: bounds come from bin selection — no window over the raw price histogram") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val qe = SparkEntry.queries("stats_winsorize")(spark, TestSpark.sf).queryExecution
    // no aggregate may key on the raw near-continuous measure: the
    // phase-1 histogram groups on (flag, BIN), so its cardinality is
    // value-range/binW, not row count
    qe.sparkPlan.collect { case a: BaseAggregateExec => a }.foreach { a =>
      assert(!a.groupingExpressions.exists(_.references.exists(_.name == "l_extendedprice")),
        s"aggregate keyed on raw l_extendedprice: ${a.groupingExpressions}")
    }
    // exact ranking happens only inside located (flag, bin) partitions —
    // parallelism groups x bins, never #groups
    val wins = qe.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.exists(_.partitionSpec.size >= 2),
      "expected the phase-2 local rank window partitioned by (flag, bin)")
    wins.filter(_.partitionSpec.size < 2).foreach { w =>
      assert(w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
        "flag-only windows may run only over the binned (metadata-sized) histogram")
    }
    // the 3-row bounds broadcast back; the clamp itself is a projection
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      "winsorize bounds must broadcast onto the fact scan")
  }

  test("agg_percentile_select: bin-selection twin shares the naive oracle but not its shape") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val qe = SparkEntry.queries("agg_percentile_select")(spark, TestSpark.sf).queryExecution
    qe.sparkPlan.collect { case a: BaseAggregateExec => a }.foreach { a =>
      assert(!a.groupingExpressions.exists(_.references.exists(_.name == "l_extendedprice")),
        s"select path must bin, never group on the raw value: ${a.groupingExpressions}")
    }
    // the documented naive-exact twin DOES group on the raw value (that
    // is its contract — reference recipe, capped parallelism): assert
    // the distinction so the two cannot silently converge
    val qeNaive = SparkEntry.queries("agg_percentile")(spark, TestSpark.sf).queryExecution
    assert(qeNaive.sparkPlan.collect { case a: BaseAggregateExec => a }
      .exists(_.groupingExpressions.exists(_.references.exists(_.name == "l_extendedprice"))),
      "agg_percentile is the documented naive-exact twin keyed on the raw value")
  }

  // ---- round-11 additions: pin the round-10 cost tier's shapes (the
  // plans the judge audited by hand — VERDICT r10 task 4) ----

  /** Shared contract of the quantized-Lloyd family (cluster_kmeans,
    * sim_pq_train): centroids ride a bounded broadcast (k or 4×k rows,
    * IdentityBroadcastMode into the BNLJ-Cross fanout), every
    * per-vector argmin window is rank-limit-pushed (WindowGroupLimit
    * Partial BEFORE the vec_id shuffle — the argmin never materializes
    * the k-candidate fanout across the exchange), and the centroid
    * update is a map-side-combinable (cid, dim) sum of quantized
    * BIGINTs. */
  private def assertLloydShape(q: String): Unit = {
    val p = plan(q)
    // Two legal broadcast forms for the centroid relation:
    // IdentityBroadcastMode (the crossJoin fanout) or a HashedRelation
    // build for the subspace-KEYED join (sim_pq_train since round 18,
    // when its four unrolled pipelines fused into one keyed by `sub` —
    // the BroadcastHashJoin on sub is the same bounded k×16 broadcast,
    // through an equi-join).
    assert(p.contains("BroadcastExchange"),
      s"$q: centroid relation must broadcast")
    assert(!p.contains("CartesianProduct"), s"$q: no cartesian product")
    assert(p.contains("partial_sum(xq"),
      s"$q: centroid update must partial-agg the quantized sums map-side")
    val partials = "row_number\\(\\), 1, Partial".r.findAllIn(p).size
    val finals = "row_number\\(\\), 1, Final".r.findAllIn(p).size
    assert(partials >= 1 && partials == finals,
      s"$q: every per-vector argmin needs the WindowGroupLimit pushdown " +
        s"(partial=$partials final=$finals)")
  }

  test("cluster_kmeans: literal-centroid map-side argmin + combinable (cid,dim) agg") {
    // Round 18 (optimization): the Lloyd assignment no longer joins a
    // broadcast centroid relation and windows per vec_id — each round's
    // trained centroids are collected (bounded k×dim driver metadata)
    // and the argmin is an array_min(transform(<literal>)) projection,
    // so the ONLY shuffle left in the query is the final per-cid
    // aggregation. Same output bit-for-bit (oracle hash-green at
    // sf0.01 + sf0.1; the streaming twin parity-proves the argmin
    // form). Pins: no join of any kind, no window, the map-side
    // partial of the final agg, and the argmin projection itself.
    val p = plan("cluster_kmeans")
    assert(p.contains("array_min(transform("),
      "assignment must be the literal-centroid argmin projection")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "no join may remain in the Lloyd pipeline")
    assert(!p.contains("Window"), "no per-vector argmin window may remain")
    assert(p.contains("partial_count(1)") && p.contains("partial_max(cc"),
      "final per-cid diagnostics agg must combine map-side")
  }

  test("sim_pq_train: per-subspace Lloyd keeps the broadcast/combinable shape") {
    assertLloydShape("sim_pq_train")
  }

  test("join_scd2_pit: point-in-time lookup is an equi-join + residual validity predicate") {
    val p = plan("join_scd2_pit")
    // the PIT probe must plan as a keyed hash join whose validity
    // window ([valid_from, valid_to)) rides along as a RESIDUAL
    // condition — never a range join (BNLJ) over two unbounded sides
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "PIT probe must be a keyed join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "validity matching must not degrade to a nested-loop range join")
    val joinLine = p.linesIterator.find(l =>
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")).getOrElse("")
    assert(joinLine.contains("valid_from"),
      s"validity predicate must be residual on the equi-join line: $joinLine")
  }

  test("sim_maxsim_rerank: broadcast query slots, combinable slot reductions, top-3 pushdown") {
    val p = plan("sim_maxsim_rerank")
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"),
      "the |Q|x4 query-slot side must broadcast")
    assert(p.contains("LessThan(vec_id,10)"),
      "the query-side bound must reach the parquet scan")
    assert(p.contains("partial_max(cs"),
      "per-(q,c,slot) max must combine map-side")
    assert(p.contains("partial_sum(mx"),
      "per-(q,c) MaxSim sum must combine map-side")
    assert(p.contains("row_number(), 3, Partial"),
      "final top-3 needs the WindowGroupLimit pushdown before the qid shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("sim_ann_ivf: cell routing is a map-side literal argmin; probe is a cell-keyed broadcast join") {
    val p = plan("sim_ann_ivf")
    // assignment (round 18): array_min over the literal candidates —
    // a narrow projection. The old min(struct)/first(array) agg looked
    // map-side-combinable but planned SortAggregate (struct/array
    // buffers are hash-agg-ineligible, the r13 min-over-STRING trap):
    // a full sort of the n·k exploded rows on both sides of a vec_id
    // exchange. Pin the absence of that whole shape.
    assert(p.contains("array_min"),
      "cell assignment must be the literal map-side argmin projection")
    assert(!p.contains("SortAggregate"),
      "assignment must not fall back to sort aggregation")
    // probe: candidates meet queries ONLY inside their cell — a keyed
    // broadcast hash join on cell, never an all-pairs scan
    assert(p.contains("BroadcastHashJoin [cell"),
      "probe must be a cell-keyed broadcast hash join")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("row_number(), 3, Partial"),
      "per-query top-3 needs the WindowGroupLimit pushdown")
  }

  test("sim_pq_encode: per-(vector,subspace) code argmin is a pure projection") {
    val p = plan("sim_pq_encode")
    // round 18: four per-subspace literal argmins as columns — the
    // plan has NO aggregate and NO exchange at all (the old explode +
    // min(struct) planned SortAggregate pairs around a shuffle)
    assert(p.contains("array_min"),
      "code assignment must be the literal map-side argmin projection")
    assert(!p.contains("SortAggregate"),
      "code assignment must not fall back to sort aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("AQE splits the skewed partition of an UNSALTED join at sf0.1") {
    // join_skew_salted handles skew by construction; this documents the
    // complementary runtime path: on the unsalted shape, AQE's
    // OptimizeSkewedJoin splits the hot partition at execution time —
    // so salting is required only where AQE can't reach (aggregations,
    // or joins whose skewed side must stay one partition). Thresholds
    // are lowered to make sf0.1 volumes register as skew; the shape —
    // 90% of fact rows on one key — is the canonical hot-key join.
    import org.apache.spark.sql.functions._
    // sf0.1-specific: the skew thresholds AND the 600k cardinality
    // assert are calibrated to that dataset — cancel (don't fail) when
    // it isn't present, matching OracleFuzzSpec's environment discipline
    if (!new java.io.File("/root/testdata/sf0.1").isDirectory)
      cancel("/root/testdata/sf0.1 not present in this environment")
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = "/root/testdata/sf0.1"
    val hot = (k: org.apache.spark.sql.Column) =>
      when(pmod(k, lit(100)) < 90, lit(0L)).otherwise(k)
    // AQE splits a skewed reduce partition at MAPPER boundaries. The
    // single-row-group test parquet collapses to ONE effective mapper
    // (the Tables.fanout problem), making the hot partition one
    // indivisible piece — repartition(12) gives the join's map side
    // the many-mapper layout any real table has. Diagnosed by reading
    // MapOutputTracker block sizes: without it, all 5.6MB of the hot
    // partition sat in a single map status.
    val fact = Tables.lineitem(s, dir).repartition(12)
      .select(hot(col("l_orderkey")).as("k"), col("l_extendedprice"))
    // the dim side must be aggregate-free: OptimizeSkewedJoin only
    // matches Sort <- ShuffleQueryStage children, and a distinct()
    // would wedge a HashAggregate in between and disable the rule —
    // so build unique keys by construction (filter + a single-row
    // union for the hot key)
    val dim = Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(100)) >= 90)
      .select(col("o_orderkey").as("k"))
      .union(s.range(1).select(lit(0L).as("k")))
    val joined = fact.join(dim, "k")
    // execute THIS dataset's own QueryExecution (a write/count would
    // plan a fresh one and leave this AdaptiveSparkPlan unfinalized)
    val nrows = joined.queryExecution.executedPlan.execute().count()
    assert(nrows == 600000L, s"unexpected join cardinality $nrows")
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$finalPlan")
  }

  test("AQE splits the skewed partition WITHOUT a repartition crutch on the sf1 corpus") {
    // Round 13 (VERDICT task 4): the sf0.1 test above needs
    // repartition(12) because the single-row-group test parquet
    // collapses the map side to ONE mapper — AQE splits at mapper
    // boundaries only, so the hot partition is one indivisible piece.
    // The synthesized sf1 corpus (graft.ScaleData) is multi-file by
    // construction — the layout any real table has — so this is the
    // first fixture where engagement can be asserted on the RAW scan,
    // no layout help. Env-guarded: /tmp/graft_sf1 is a rehearsal
    // artifact (sbt "runMain graft.ScaleData"); cancel when absent.
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft_sf1"
    if (!new java.io.File(s"$dir/lineitem.parquet").exists())
      cancel(s"$dir not present — run `sbt \"runMain graft.ScaleData\"` first")
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val hot = (k: org.apache.spark.sql.Column) =>
      when(pmod(k, lit(100)) < 90, lit(0L)).otherwise(k)
    // NO repartition: the scan's own splits are the mappers
    val fact = Tables.lineitem(s, dir)
      .select(hot(col("l_orderkey")).as("k"), col("l_extendedprice"))
    val dim = Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(100)) >= 90)
      .select(col("o_orderkey").as("k"))
      .union(s.range(1).select(lit(0L).as("k")))
    val joined = fact.join(dim, "k")
    val expected = Tables.lineitem(s, dir).count()
    val nrows = joined.queryExecution.executedPlan.execute().count()
    assert(nrows == expected, s"unexpected join cardinality $nrows != $expected")
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition at sf1:\n$finalPlan")
  }
}
