package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured Streaming variants under MemoryStream (SURVEY.md §2.9):
  * watermark advances close windows; in-watermark duplicates drop. */
class StreamingSpec extends AnyFunSuite {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Doc(doc_id: Long, text: String)

  private def t(s: String) = Timestamp.valueOf(s)

  private def drain(q: StreamingQuery): Unit = { q.processAllAvailable(); q.stop() }

  test("tumbling window emits once the watermark passes window end") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(ms.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_tumble").outputMode("append").start()
    ms.addData(
      Ev(1, t("2024-01-01 10:05:00"), 7, "click", 1.0),
      Ev(2, t("2024-01-01 10:40:00"), 7, "click", 2.0))
    q.processAllAvailable()
    // watermark still at 10:30 → the 10:00 window is open, nothing emitted
    assert(spark.table("t_tumble").count() == 0)
    ms.addData(Ev(3, t("2024-01-01 12:00:00"), 7, "view", 1.0))
    drain(q)
    val rows = spark.table("t_tumble").collect()
    assert(rows.length == 1) // the 10:00–11:00 click window, n=2
    assert(rows(0).getAs[Long]("n") == 2)
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dedupWithinWatermark(ms.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    ms.addData(
      Ev(1, t("2024-01-01 10:00:00"), 7, "click", 1.0),
      Ev(1, t("2024-01-01 10:00:01"), 7, "click", 1.0), // dup id within horizon
      Ev(2, t("2024-01-01 10:00:02"), 7, "view", 2.0))
    drain(q)
    assert(spark.table("t_dedup").count() == 2)
  }

  test("stateful sessionize (flatMapGroupsWithState) emits on gap and on timeout") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.statefulSessionize(ms.toDF(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_fmgws").outputMode("append").start()
    // session A: 2 events; session B starts 2h later in the same batch
    ms.addData(
      Ev(1, t("2024-01-01 10:00:00"), 7, "click", 1.0),
      Ev(2, t("2024-01-01 10:10:00"), 7, "click", 2.0),
      Ev(3, t("2024-01-01 12:00:00"), 7, "click", 4.0))
    q.processAllAvailable()
    val afterBatch1 = spark.table("t_fmgws").as[StreamingOps.SessOut].collect()
    // in-batch gap closed session A immediately
    assert(afterBatch1.length == 1)
    assert(afterBatch1(0).n == 2 && afterBatch1(0).sum_value == 3.0)
    // advance the watermark far past session B's gap → timeout emits it
    ms.addData(Ev(4, t("2024-01-01 15:00:00"), 99, "view", 0.0))
    drain(q)
    val all = spark.table("t_fmgws").as[StreamingOps.SessOut].collect()
      .sortBy(_.session_start.getTime)
    assert(all.length == 2)
    assert(all(1).n == 1 && all(1).sum_value == 4.0)
    assert(all(1).session_start == t("2024-01-01 12:00:00"))
  }

  test("stream-static join enriches events with a broadcast dim") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("uid", "tier")
    val ms = MemoryStream[Ev]
    val q = StreamingOps.enrichWithDim(ms.toDF(), dim, "user_id", "uid")
      .writeStream.format("memory").queryName("t_enrich").outputMode("append").start()
    ms.addData(
      Ev(1, t("2024-01-01 10:00:00"), 7, "click", 1.0),
      Ev(2, t("2024-01-01 10:01:00"), 99, "click", 1.0)) // no dim row
    drain(q)
    val rows = spark.table("t_enrich").collect()
      .map(r => r.getAs[Long]("user_id") -> Option(r.getAs[String]("tier"))).toMap
    assert(rows(7L).contains("gold"))
    assert(rows(99L).isEmpty) // left join keeps unmatched stream rows
  }

  test("stream-stream interval join attributes purchases to in-window touches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val touches = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingOps.joinPurchasesToTouches(
        purchases.toDF(), touches.toDF(), windowMinutes = 30)
      .writeStream.format("memory").queryName("t_ssjoin").outputMode("append").start()
    touches.addData(
      Ev(1, t("2024-01-01 10:00:00"), 7, "click", 0.0),  // in window
      Ev(2, t("2024-01-01 09:00:00"), 7, "view", 0.0),   // too old
      Ev(3, t("2024-01-01 10:05:00"), 8, "click", 0.0))  // other user
    purchases.addData(Ev(10, t("2024-01-01 10:20:00"), 7, "purchase", 9.99))
    drain(q)
    val rows = spark.table("t_ssjoin").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("touch_id") == 1)
    assert(rows(0).getAs[Long]("purchase_id") == 10)
  }

  test("epoch-addressed foreachBatch sink overwrites, never duplicates") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_epoch_sink").toString
    val ms = MemoryStream[Ev]
    val q = StreamingOps.sinkEpochParquet(ms.toDF(), out)
      .outputMode("append").start()
    ms.addData(Ev(1, t("2024-01-01 10:00:00"), 7, "click", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(2, t("2024-01-01 10:01:00"), 7, "view", 2.0))
    drain(q)
    val read = spark.read.parquet(out)
    assert(read.count() == 2)
    assert(read.select("event_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("continuous dedup ingest: batch probes the persisted index and itself") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_dedup_ingest")
    val (idxDir, outDir) = (s"$base/index", s"$base/dups")
    val ms = MemoryStream[Doc]
    val q = StreamingOps.dedupIngest(ms.toDF(), idxDir, outDir)
      .outputMode("append").start()
    val textA = "the quick brown fox jumps over the lazy dog tonight"
    val textB = "completely different content with many unique words here today"
    val textC = "yet another unrelated document about spark streaming state stores"
    // epoch 0: two unique docs — no duplicates anywhere
    ms.addData(Doc(1, textA), Doc(2, textB))
    q.processAllAvailable()
    // epoch 1: doc 3 duplicates ingested doc 1 (history hit); docs 4+5
    // duplicate each other within the batch (self hit)
    ms.addData(Doc(3, textA), Doc(4, textC), Doc(5, textC))
    drain(q)
    val e0 = spark.read.parquet(s"$outDir/epoch=0")
    assert(e0.count() == 0, "unique first batch must flag nothing")
    val e1 = spark.read.parquet(s"$outDir/epoch=1")
      .select("doc_a", "doc_b", "origin", "verified").as[(Long, Long, String, Boolean)]
      .collect().toSet
    // batch hits are exact-Jaccard verified (texts on hand); history
    // hits probe the text-free band index, so they stay candidates
    assert(e1 == Set((1L, 3L, "history", false), (4L, 5L, "batch", true)), s"got $e1")
    val jacs = spark.read.parquet(s"$outDir/epoch=1")
      .select("origin", "jac").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(jacs("history").isEmpty, "unverified candidate must carry no jac")
    assert(jacs("batch").exists(_.asInstanceOf[Double] >= 0.5))
    // the index now holds every epoch's bands: 5 docs × 4 bands
    assert(spark.read.parquet(idxDir).count() == 20)
  }

  test("session windows merge events within the gap") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.sessionized(ms.toDF(), gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_sess").outputMode("append").start()
    ms.addData(
      Ev(1, t("2024-01-01 10:00:00"), 7, "click", 1.0),
      Ev(2, t("2024-01-01 10:10:00"), 7, "click", 1.0), // same session
      Ev(3, t("2024-01-01 11:30:00"), 7, "click", 1.0)) // new session
    ms.addData(Ev(4, t("2024-01-01 14:00:00"), 7, "view", 1.0)) // advance watermark
    drain(q)
    val rows = spark.table("t_sess").collect().sortBy(_.getAs[Timestamp]("session_start").getTime)
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2)
    assert(rows(1).getAs[Long]("n") == 1)
  }

  test("as-of join: watermark-matured match, then idle-key TTL drops the quote cache") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val msT = MemoryStream[Ev] // trades
    val msQ = MemoryStream[Ev] // quotes
    val q = StreamingOps.asofEnrich(msT.toDF(), msQ.toDF(),
        watermark = "10 minutes")
      .toDF()
      .writeStream.format("memory").queryName("t_asof").outputMode("append").start()

    // day 1: quote then trade for user 1; a user-2 quote pushes the
    // watermark past the trade → it matures, matched to quote 100
    msQ.addData(Ev(100, t("2024-01-01 10:00:00"), 1, "click", 0))
    msT.addData(Ev(200, t("2024-01-01 11:00:00"), 1, "purchase", 0))
    q.processAllAvailable()
    msQ.addData(Ev(101, t("2024-01-01 13:00:00"), 2, "click", 0))
    q.processAllAvailable()
    val first = spark.table("t_asof").collect()
    assert(first.length == 1 && first(0).getAs[Long]("purchase_id") == 200)
    assert(first(0).getAs[Long]("click_id") == 100, s"${first.toSeq}")

    // push the watermark > 24h past user 1's last quote: the idle key
    // is GC'd entirely, cached quote included
    msQ.addData(Ev(102, t("2024-01-02 12:00:00"), 2, "click", 0))
    q.processAllAvailable()

    // a user-1 trade after the TTL: the pre-TTL quote is gone, so the
    // match is (documented tradeoff) lost — emitted with click NULL
    msT.addData(Ev(201, t("2024-01-02 13:00:00"), 1, "purchase", 0))
    q.processAllAvailable()
    msQ.addData(Ev(103, t("2024-01-02 15:00:00"), 2, "click", 0))
    drain(q)
    val rows = spark.table("t_asof").collect()
      .map(r => r.getAs[Long]("purchase_id") -> Option(r.getAs[Any]("click_id")))
      .toMap
    assert(rows.size == 2, s"${rows}")
    assert(rows(201L).isEmpty,
      s"TTL'd key still matched an expired quote: ${rows(201L)}")
  }

  test("epoch sink is exactly-once across a mid-batch crash + checkpoint restart") {
    // Failure-injection proof of the sink's replay-overwrite claim
    // (round 11, VERDICT task 6): the first attempt dies MID-BATCH on
    // epoch 1 — after leaving a duplicated partial write in the epoch
    // dir, the worst at-least-once debris — and the restarted query
    // replays epoch 1 from the checkpoint WAL through the REAL
    // sinkEpochParquet, whose per-epoch overwrite must erase the
    // debris: final output = input, no duplicates, no gaps.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_exactly_once")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    (0 until 3).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$in/f$i.json"),
        s"""{"id":$i,"payload":"row$i"}""".getBytes("UTF-8"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, payload STRING")
    def source = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(in)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val attempt1 = source.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epochId: Long) =>
        if (epochId == 1 && crashed.compareAndSet(false, true)) {
          batch.union(batch).write.mode("overwrite").parquet(s"$out/epoch=$epochId")
          throw new RuntimeException("injected mid-batch crash")
        } else {
          batch.write.mode("overwrite").parquet(s"$out/epoch=$epochId")
        }
      }
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      attempt1.awaitTermination()
    }
    assert(crashed.get, "the injected crash never fired")
    assert(failed.getMessage.contains("injected mid-batch crash") ||
      Option(failed.getCause).exists(_.getMessage.contains("injected")),
      s"query failed for the wrong reason: $failed")
    // the at-least-once debris is really there before the restart
    assert(spark.read.parquet(s"$out/epoch=1").count() == 2,
      "expected the duplicated partial write from the crashed attempt")
    // restart from the same checkpoint through the real sink
    val attempt2 = StreamingOps.sinkEpochParquet(source, out)
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    attempt2.awaitTermination()
    val result = spark.read.parquet(s"$out/epoch=*")
    assert(result.count() == 3, "exactly one row per input row (no dups, no gaps)")
    assert(result.select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    assert(new java.io.File(out).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch=")) == 3)
  }
}
