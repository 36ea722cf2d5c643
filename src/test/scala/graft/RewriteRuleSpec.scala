package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract for [[graft.plans.RewriteDotProduct]]: the optimizer rule
  * must (a) actually fire — the physical plan of a query written with
  * the composable `aggregate(zip_with(...))` dot shape contains the
  * codegen'd `dot_product` and no interpreted aggregate-lambda dot —
  * and (b) be a pure performance rewrite: results bit-identical with
  * the rule disabled (the vector-column contract under which the two
  * forms agree; the oracle gate re-proves this against DuckDB for
  * every affected registered query).
  */
class RewriteRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def withoutRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        before.filterNot(_ == graft.plans.RewriteDotProduct)
      body
    } finally spark.experimental.extraOptimizations = before
  }

  test("rewrite fires on both literal-operand and column-operand dots") {
    // sim_rp_project: dotLambda against a literal plane matrix;
    // cluster_kmeans: dotLambda between two data columns.
    for (name <- Seq("sim_rp_project", "cluster_kmeans")) {
      val phys = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(phys.contains("dot_product"),
        s"$name: RewriteDotProduct did not fire\n$phys")
      assert(!phys.toLowerCase.contains("zip_with"),
        s"$name: an interpreted zip_with dot survived the rewrite")
    }
  }

  test("rewrite is a pure performance change: results bit-identical") {
    for (name <- Seq("sim_rp_project", "cluster_kmeans", "sim_ann_multiprobe")) {
      val withRule = SparkEntry.queries(name)(spark, sf).collect().toSeq
      val withoutIt = withoutRule {
        SparkEntry.queries(name)(spark, sf).collect().toSeq
      }
      assert(withRule == withoutIt,
        s"$name: rewrite changed results — not a pure optimization")
    }
  }
}
