package graft

import graft.etl._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's full ETL pass (SURVEY.md §3.3) end-to-end: extract →
  * surrogate-key transform (KeyMap) → dim upsert → partitioned fact
  * load — the star-schema workflow skopje exists for, on Spark. */
class EtlIntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("star-schema ETL pass: extract, keymap transact, upsert dim, load facts") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_etl_star"

    // 1. extract: the raw "feed" (customers) — reference §3.1/§3.2
    val feed = ParquetSource(s"${TestSpark.sf}/customer.parquet").read(spark)

    // 2. dim snapshot + transact: assign surrogate keys to segments —
    //    KeyMap::pg_fetch + transact (keymap.rs:52-75,171-183)
    val dim0 = KeyMap.empty(spark)
      .transact(feed.filter(col("c_custkey") < 50).select(col("c_mktsegment")))
    val dim1 = dim0.transact(feed.select(col("c_mktsegment")))
    // existing assignments survived the second batch
    dim0.dim.collect().foreach { r =>
      assert(dim1.lookupKey(r.getString(1)).contains(r.getLong(0)))
    }

    // 3. facts with dim keys: broadcast lookup (no fact-side shuffle)
    val facts = dim1.lookup(feed, "c_mktsegment")
      .select(col("c_custkey"), col("key").as("segment_key"), col("c_acctbal"))
    assert(facts.filter(col("segment_key").isNull).count() == 0)

    // 4. load: partitioned fact sink + dim sink — reference §3.3 load
    ParquetSink(s"$base/facts", partitionBy = Seq("segment_key")).write(facts)
    ParquetSink(s"$base/dim").write(dim1.dim)

    // 5. incremental dim arrival: upsert keeps keys stable (R11)
    val reloaded = spark.read.parquet(s"$base/dim")
    val merged = Upsert.merge(reloaded, dim1.dim, Seq("key"))
    assert(merged.count() == reloaded.count())

    // round-trip check: every customer appears exactly once, keys join back
    val back = spark.read.parquet(s"$base/facts")
    assert(back.count() == feed.count())
    val joined = back.join(spark.read.parquet(s"$base/dim"), back("segment_key") === col("key"))
    assert(joined.count() == feed.count())
  }
}
