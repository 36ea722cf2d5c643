package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming operators reuse the batch expressions — so a bounded
  * file driven through `readStream` must emit exactly the batch answer
  * for every window the watermark closed (SURVEY.md §2.9: "same code
  * reusable under Structured Streaming"). */
class StreamBatchParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed tumbling counts equal the batch computation for closed windows") {
    val batchEvents = Tables.events(spark, TestSpark.sf)
    val schema = batchEvents.schema

    // stage the events parquet (post ns→µs conversion) into a stream dir
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_src"
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.tumblingCounts(stream, watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_parity").outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val emitted = spark.table("t_parity")
      .select(col("window_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // every emitted window must match the batch result exactly
    assert(emitted.subsetOf(batch),
      s"stream emitted rows not in batch: ${emitted.diff(batch).take(3)}")
    // and the stream must have closed nearly all windows (only those
    // within the final watermark horizon may be withheld)
    assert(emitted.size >= batch.size - 10,
      s"stream emitted ${emitted.size} of ${batch.size} windows")
  }
}
