package graft

/** Corpus-scale demonstration of the SemDeDup k-rule (SCALING.md):
  * run `dedupSemanticAuto` — Lloyd training, cell routing, in-cell
  * pairs, keep rule — end-to-end on a large embedding corpus at two
  * `targetCell` settings and report wall time + keep counts.
  * `sbt "runMain graft.SemDemo [dir]"` (default /tmp/graft_sf10,
  * the 200k-vector corpus ScaleData synthesizes). */
object SemDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitions(32).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.applyOptimizations(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for (tc <- Seq(8192L, 1024L)) {
      val n = Tables.embeddings(spark, dir).count()
      val k = operators.Similarity.semanticK(n, tc)
      val t0 = System.nanoTime()
      val kept = operators.Similarity.dedupSemanticAuto(spark, dir, tc)
        .filter(org.apache.spark.sql.functions.col("keep")).count()
      println(f"[semdemo] n=$n targetCell=$tc k=$k kept=$kept t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
