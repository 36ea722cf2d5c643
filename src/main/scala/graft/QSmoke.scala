package graft

object QSmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitions(16, GraftSession.dirBytes(args(0))).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.applyOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietBenignLogs()
    for (q <- args.tail) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, args(0))
      val n = df.count()
      println(f"[qsmoke] $q rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
      df.show(5, false)
    }
    spark.stop()
  }
}
