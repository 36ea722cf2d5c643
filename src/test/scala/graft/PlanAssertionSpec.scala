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
}
