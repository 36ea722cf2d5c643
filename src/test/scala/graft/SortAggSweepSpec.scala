package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.aggregate.SortAggregateExec

/** Mechanical tripwire for the round-13 `min(STRING)` SortAggregate
  * trap (SCALING.md decade 3): any min/max over a STRING column — or
  * any other agg whose buffer isn't a mutable fixed-width type —
  * silently downgrades HashAggregate to SortAggregateExec, which
  * externally sorts its ENTIRE input stream. At sf0.001 that is
  * invisible; at 600 M rows it was a 2.6× slowdown (dedup_minhash
  * α 1.49 → 0.99 once fixed). The lesson cost a decade-3 rehearsal to
  * find; this sweep makes the next one cost a test failure instead.
  *
  * The sweep walks the physical plan (incl. subqueries) of EVERY
  * registered query at the canonical SF and fails if a
  * SortAggregateExec appears for a query not in the whitelist. The
  * whitelist must carry a reason proving the site is bounded — i.e.
  * the sort-agg's input is metadata-sized or already sorted — because
  * that is the only situation where SortAggregate is scale-safe.
  */
class SortAggSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** query name -> why its SortAggregate is scale-safe (input bounded
    * or pre-sorted). Keep this list short and justified. */
  private val whitelist: Map[String, String] = Map(
  )

  test("no registered query plans an unbounded SortAggregate") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, PlanShapes.CanonicalSf)
        .queryExecution.executedPlan
      val hits = plan.collectWithSubqueries { case s: SortAggregateExec => s }
      if (hits.nonEmpty && !whitelist.contains(name))
        Some(s"$name (${hits.size} SortAggregateExec: " +
          hits.map(_.aggregateExpressions.map(_.sql).mkString(",")).mkString("; ") + ")")
      else None
    }
    assert(offenders.isEmpty,
      "SortAggregateExec planned for non-whitelisted queries — a STRING " +
        "min/max (or other non-fixed-width agg buffer) silently kills " +
        "HashAggregate at scale. Fix the agg (60-bit long idiom, " +
        "Dedup.scala:63-77) or whitelist with a boundedness proof:\n  " +
        offenders.mkString("\n  "))
  }
}
