package graft

/** Plan audit aid: prints the physical plan of each named query
  * (args: sfDir query...). Source for PLANS.md excerpts. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, args(0))
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
