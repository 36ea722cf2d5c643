package graft

import graft.sources.HttpChunkSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 chunked-download source plans one partition per byte range
  * and fetches distributed — mirrors `/root/reference/src/extract/http.rs`
  * R6/R7 semantics (100 MB default chunk, 206-expectation) without the
  * reference's mutex-serialized writes. */
class HttpChunkSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("plans range partitions and reassembles content distributed") {
    // fake "server": content is the byte sequence 0..99
    HttpChunkSource.fetchers.put("testdata",
      (_, s, e) => (s to e).map(_.toByte).toArray)
    val df = spark.read.format("graft.sources.HttpChunkSource")
      .option("url", "http://fake/file.bin")
      .option("totalBytes", 100)
      .option("chunkBytes", 32)
      .option("fetcher", "testdata")
      .load()
    assert(df.rdd.getNumPartitions == 4) // ceil(100/32) ranges
    val rows = df.orderBy("start").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 31L), (32L, 63L), (64L, 95L), (96L, 99L)))
    val assembled = rows.flatMap(_.getAs[Array[Byte]]("content")).toSeq
    assert(assembled == (0 until 100).map(_.toByte).toSeq)
  }

  test("chunk byte totals can be aggregated without collecting payloads") {
    HttpChunkSource.fetchers.put("testdata2", (_, s, e) => new Array[Byte]((e - s + 1).toInt))
    val df = spark.read.format("graft.sources.HttpChunkSource")
      .option("url", "u").option("totalBytes", 250).option("chunkBytes", 100)
      .option("fetcher", "testdata2").load()
    val total = df.select(sum(length(col("content")))).collect()(0).getLong(0)
    assert(total == 250L)
  }
}
