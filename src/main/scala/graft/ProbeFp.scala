package graft

import org.apache.spark.sql.SparkSession

/** Fingerprint diagnostic main (round 17): for the named queries,
  * print the raw + normalized ANALYZED plan (default), the impl
  * fingerprint (`PROBE_HASH=1`) — run before/after clearing
  * /tmp/graft_cache or relocating java.io.tmpdir to prove a
  * fingerprint is layout-independent — or the oracle-SQL sha256
  * (`PROBE_ORACLE_SHA=1`, with `PROBE_ORACLE_DUMP=<dir>` to write the
  * SQL text) — run across an oracle refactor to prove byte-identity
  * so OracleGateSpec needs no re-gate. */
object ProbeFp {
  def main(args: Array[String]): Unit = {
    if (sys.env.contains("PROBE_ORACLE_SHA")) {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      for (q <- args) {
        val sql = SparkEntry.oracleSql(q)
        val h = md.digest(sql.getBytes("UTF-8")).map("%02x".format(_)).mkString
        println(s"[probe] $q oracle_sha $h")
        sys.env.get("PROBE_ORACLE_DUMP").foreach { d =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/$q.sql"), sql)
        }
      }
      return
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.applyOptimizations(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      if (sys.env.contains("PROBE_HASH"))
        println(s"[probe] $q ${PlanShapes.implHash(spark, q)}")
      else {
        val plan = SparkEntry.queries(q)(spark, PlanShapes.CanonicalSf)
          .queryExecution.analyzed.toString
        println(s"===== $q RAW =====")
        println(plan.take(4000))
        println(s"===== $q NORMALIZED =====")
        println(PlanShapes.normalize(plan).take(4000))
      }
    }
    spark.stop()
  }
}
