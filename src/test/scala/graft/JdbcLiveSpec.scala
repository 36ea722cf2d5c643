package graft

import graft.etl.{JdbcSink, JdbcSource, KeyMap}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LIVE JDBC round-trips against embedded Derby (shipped in
  * /opt/spark/jars for the Hive metastore — public tooling already in
  * the environment). The JDBC recipes were previously
  * config-shape-tested only, because the sandbox has no Postgres; this
  * runs the REAL `DataFrameWriter.jdbc` / `spark.read.jdbc` paths
  * end-to-end against a real SQL engine — table create, batched
  * inserts, full and partitioned reads — leaving only the Postgres
  * dialect itself untestable here.
  */
class JdbcLiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Derby writes derby.log to user.dir unless homed elsewhere — keep
  // the repo clean and the databases in /tmp.
  System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))

  private lazy val url = {
    val db = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_derby_${System.nanoTime()}").getAbsolutePath
    s"jdbc:derby:$db;create=true"
  }
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("JdbcSink -> JdbcSource round-trips a dimension, full and partitioned reads") {
    val src = Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    JdbcSink(url, "nation_rt", props, SaveMode.Overwrite).write(src)

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getLong(2))
    val expected = src.collect().map(key).toSet

    val full = JdbcSource(url, "nation_rt", props).read(spark)
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(full.collect().map(key).toSet == expected,
      "full JDBC read diverged from the written dimension")

    // R12's split-read path: same rows through 4 executor partitions
    val part = JdbcSource(url, "nation_rt", props,
        partitionColumn = Some(("n_nationkey", 0L, 24L, 4))).read(spark)
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(part.rdd.getNumPartitions == 4, "partitioned read not split")
    assert(part.collect().map(key).toSet == expected,
      "partitioned JDBC read diverged from the written dimension")
  }

  test("KeyMap pg_fetch/pg_insert cycle runs live: fetch, transact, persist, refetch") {
    // seed a dim with a key gap (keys 0,1,3) — the reference doc-test
    // shape (keymap.rs:24-35): the next assignment must fill 2 (mex),
    // not append 4.
    val spark2 = spark
    import spark2.implicits._
    val seed = Seq((0L, "alpha"), (1L, "beta"), (3L, "delta"))
      .toDF("key", "value")
    JdbcSink(url, "keymap_rt", props, SaveMode.Overwrite).write(seed)

    val fetched = KeyMap.fromDim(
      JdbcSource(url, "keymap_rt", props).read(spark), "key", "value")
    val updated = fetched.transact(Seq("beta", "gamma", "epsilon").toDF("value"))
    // materialize BEFORE the write-back: the updated dim lazily reads
    // keymap_rt over JDBC, and an un-materialized overwrite of the same
    // table would re-execute that read mid-drop — the standard
    // read-then-overwrite-self hazard every JDBC pipeline must break
    // with a checkpoint (or by appending only the novel rows)
    JdbcSink(url, "keymap_rt", props, SaveMode.Overwrite)
      .write(updated.dim.localCheckpoint())

    val refetched = JdbcSource(url, "keymap_rt", props).read(spark)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(refetched("beta") == 1L, "existing assignment not preserved through JDBC")
    // novel values in value order: epsilon takes the gap (mex=2), gamma extends
    assert(refetched("epsilon") == 2L,
      s"mex gap not filled through the live cycle: $refetched")
    assert(refetched("gamma") == 4L, s"extension key wrong: $refetched")
    assert(refetched.size == 5)
  }
}
