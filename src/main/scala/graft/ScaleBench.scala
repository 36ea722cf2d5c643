package graft

import org.apache.spark.sql.SparkSession

/** Two-point scaling harness (round 12, VERDICT task 1): time the
  * named queries at TWO scale factors in one JVM and report the
  * per-query scaling exponent α = log(t_B/t_A) / log(|B|/|A|) — the
  * empirical check behind every "linear at 100 TB" design argument:
  * α ≈ 1 is linear, α ≈ 0 is overhead-bound (fixed cost dominates at
  * these sizes), α ≫ 1.3 is a hidden super-linearity that would bite
  * at cluster scale.
  *
  * Protocol per (query, dir): one untimed warm run (JIT/codegen —
  * the Bench discipline), then best-of-2 timed noop-sink runs.
  * Queries run A then B back-to-back so both points share identical
  * JVM/JIT state. Output: one line per query plus a trailing JSON
  * object (committed observations land in SCALING.md).
  *
  * Usage:
  * `sbt "runMain graft.ScaleBench <dirA> <dirB> <sizeRatio> <q>..."`
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val ratio = args(2).toDouble
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle sizing (round 13, decade 3): partitions pinned to core
    // count hit the spill cliff once a partition's shuffle slice
    // outgrows executor memory (measured at sf100: join_sortmerge
    // α 1.58 with 32 partitions over 600 M rows — ~2 GB/partition/
    // side). Since round 14 the measured 4×-cores rule IS the session
    // default (GraftSession.shufflePartitions) — no env needed at
    // sf100; SPARK_GRAFT_SHUFFLE stays as the experiment override.
    // AQE coalescing keeps the small-SF side from over-partitioning.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitions(cpus.toInt).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.applyOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietBenignLogs()

    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        // Each invocation of a checkpoint-using query materializes a
        // FRESH localCheckpoint; the previous run's blocks are garbage
        // that only a GC-triggered ContextCleaner pass would free.
        // Left alone they accumulate across the warm+timed runs of
        // every query in the session (GBs at sf10 — measured: they
        // inflated later queries up to 8×, dedup_jaccard_prefix 8 s →
        // 62 s at the same SF), so drop them eagerly: each run pays
        // exactly its own materialization and nothing lingers.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        // SHUFFLE files are the other garbage class (round 14): they
        // are reaped only when ContextCleaner sees the dead
        // ShuffleDependency via driver GC, and a 64 g driver heap can
        // run a whole decade-3 session without one — measured:
        // graph_pagerank's three sf10 runs left ~25 GB of dead
        // shuffle scratch, and its sf100 run then hit ENOSPC on a
        // box that fits the live query with room to spare. Force the
        // collection between (untimed boundaries of) runs and give
        // the async cleaner a beat to land the deletions. This is
        // the in-session analogue of spark.cleaner.periodicGC (whose
        // 30 min default never fires inside one session).
        System.gc()
        Thread.sleep(500)
        secs
      }
      once() // warm (uncounted)
      math.min(once(), once())
    }

    val rows = names.map { n =>
      try {
        val tA = time(n, dirA)
        val tB = time(n, dirB)
        val alpha = math.log(tB / tA) / math.log(ratio)
        println(f"[scale] $n%-28s A=$tA%8.2fs B=$tB%8.2fs alpha=$alpha%6.2f")
        (n, tA, tB, alpha)
      } catch {
        case e: Throwable =>
          println(s"[scale] $n FAILED: ${e.getMessage}")
          (n, -1.0, -1.0, Double.NaN)
      }
    }
    // Failed queries carry NaN alpha (and -1 sentinel times, which are
    // valid JSON); emit JSON null for the NaN — a literal NaN token
    // would make the trailing object unparseable. Negative alphas from
    // successful runs are real measurements and pass through.
    def f3(v: Double) =
      if (v.isNaN) "null"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(rows.map { case (n, a, b, al) =>
      s""""$n":{"a_s":${f3(a)},"b_s":${f3(b)},"alpha":${f3(al)}}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
