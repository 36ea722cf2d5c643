package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** O(batch) measurement for a streaming ingest twin (round 18,
  * VERDICT task 4): all nine twins CLAIM per-ingest cost independent
  * of history size (one side of every probe is batch-bounded); this
  * puts two measured points under the newest one, `phashPairsIngest`.
  *
  * Protocol: two arms that differ ONLY in index-history size — same
  * epoch COUNT (4, so epoch-discovery and per-epoch scan setup cost
  * is held equal), 10× the signature rows per epoch — then the SAME
  * warm-up batch and the SAME two timed probe batches (1 000 docs
  * each; min of the two is the arm's latency; the second batch sees
  * +1k docs of history — 2.5% of arm B, noise). The implied exponent
  * log10(tB/tA) should read ≈ 0: the probe's band join keys one side
  * by the batch, so only the history-index SCAN (columnar, pruned to
  * 2 columns) grows with history.
  *
  *   tools/run_main.sh graft.IngestLatency <docsDir e.g. sf1>
  */
object IngestLatency {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/scratch/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    GraftSession.quietStartup()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        GraftSession.shufflePartitions(cpus, GraftSession.dirBytes(sfDir)).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.applyOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietBenignLogs()
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val media = graft.operators.Multimodal.phashMedia(spark, sfDir)
      .collect().sortBy(_.doc_id)
    println(s"[ingest] corpus ${media.length} media rows")
    val histB = media.take(40000)
    val histA = histB.take(4000)
    val rest = media.drop(40000)
    val warm = rest.slice(0, 500)
    val timed1 = rest.slice(500, 1500)
    val timed2 = rest.slice(1500, 2500)
    require(timed2.length == 1000, s"corpus too small: ${media.length}")

    def arm(name: String, hist: Array[graft.operators.Multimodal.MediaRow],
        epochs: Int): Double = {
      val base = s"/root/scratch/tmp/graft_ingestlat_${name}_${System.nanoTime()}"
      val ms = MemoryStream[graft.operators.Multimodal.MediaRow]
      val q = graft.streaming.StreamingOps
        .phashPairsIngest(ms.toDF(), s"$base/idx", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt").start()
      val per = hist.length / epochs
      for (i <- 0 until epochs) {
        ms.addData(hist.slice(i * per, (i + 1) * per).toIndexedSeq: _*)
        q.processAllAvailable()
      }
      ms.addData(warm.toIndexedSeq: _*); q.processAllAvailable()
      def timeBatch(b: Array[graft.operators.Multimodal.MediaRow]): Double = {
        val t0 = System.nanoTime()
        ms.addData(b.toIndexedSeq: _*); q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = timeBatch(timed1)
      val t2 = timeBatch(timed2)
      q.stop()
      val t = math.min(t1, t2)
      println(f"[ingest] arm $name history=${hist.length} epochs=$epochs " +
        f"batch=1000 t1=$t1%.2f t2=$t2%.2f min=$t%.2f s")
      t
    }

    // Arm order is configurable (SPARK_GRAFT_INGEST_ORDER=BA) so the
    // second-arm JIT advantage can be measured from both sides and
    // the exponent bounded instead of biased.
    val (tA, tB) = if (sys.env.get("SPARK_GRAFT_INGEST_ORDER").contains("BA")) {
      val b = arm("B", histB, 4); val a = arm("A", histA, 4); (a, b)
    } else {
      val a = arm("A", histA, 4); val b = arm("B", histB, 4); (a, b)
    }
    println(f"[ingest] alpha(batch-vs-history) = ${math.log(tB / tA) / math.log(10.0)}%.2f " +
      f"(tA=$tA%.2f tB=$tB%.2f, 10x history)")
    spark.stop()
  }
}
