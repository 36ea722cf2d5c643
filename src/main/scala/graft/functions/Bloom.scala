package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's bloom-filter expressions exposed as callable functions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the engine's
  * own sketch pair — the optimizer injects them for runtime join
  * pruning (SPARK-32268, see `scale_runtime_filter`) but does NOT
  * register them in the public function registry. Registering them
  * makes the pattern available where the optimizer declines or can't
  * see it: an EXPLICIT pre-shuffle membership gate built in one job
  * and applied in another (classic two-step ETL), or a hand-placed
  * filter below an exchange the planner would not rewrite.
  *
  * - `bloom_agg(xxhash64(k), estItems, numBits)` → binary sketch
  *   (mergeable TypedImperativeAggregate — partials union losslessly,
  *   so the build side never single-threads)
  * - `bloom_might_contain(bf, xxhash64(k))` → boolean, no false
  *   negatives ⇒ a downstream exact join restores exact semantics.
  */
object Bloom {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
