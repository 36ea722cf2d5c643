/** TEMPORARY fire-drill stager (round 13, VERDICT task 8): build a
  * staged copy of an SF dir with the events.ts parquet dtype FLIPPED
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) — the exact change the
  * r8 testdata regeneration shipped — so the regeneration recovery
  * playbook can be rehearsed without touching /root/testdata.
  * Deleted after the drill; see CLAUDE.md's regeneration playbook. */
object RegenDrill {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // non-events tables are copied byte-identical by the shell; only
    // events is rewritten, µs-typed (Tables.events already normalizes
    // the loaded values to µs TimestampType — writing that back yields
    // TIMESTAMP(MICROS), the post-regeneration dtype)
    graft.Tables.events(spark, src)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    println(s"[drill] staged $dst/events.parquet as TIMESTAMP(MICROS)")
    spark.stop()
  }
}
