package graft

import graft.etl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The ETL façade mirrors the reference's Extract/Load contract
  * (`/root/reference/src/etl.rs:14-28`): source → transforms → sink as
  * one plan, plus the HTTP retry (R5), chunked download (R6/R7) and zip
  * (R9) extract paths with injected fetchers (offline). */
class EtlPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_test/$name"

  test("pipeline: parquet → filter/project → parquet") {
    val out = tmp("pipe_out")
    Pipeline(
      ParquetSource(s"${TestSpark.sf}/lineitem.parquet"),
      Seq(
        _.filter(col("l_quantity") > 25),
        _.select("l_orderkey", "l_quantity")),
      ParquetSink(out)
    ).run(spark)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Seq("l_orderkey", "l_quantity"))
    assert(back.count() > 0)
    assert(back.filter(col("l_quantity") <= 25).count() == 0)
  }

  test("pipeline spec: JSON config → source/transforms/sink → runs end-to-end") {
    val out = tmp("spec_out")
    val pipeline = PipelineSpec.fromJson(
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/lineitem.parquet"},
         | "transforms": [
         |   {"op": "filter", "expr": "l_quantity > 25"},
         |   {"op": "withColumn", "name": "rev", "expr": "l_extendedprice * (1 - l_discount)"},
         |   {"op": "select", "columns": ["l_orderkey", "l_quantity", "rev"]},
         |   {"op": "dedup", "columns": []},
         |   {"op": "sort", "columns": ["l_orderkey"]},
         |   {"op": "limit", "n": 50}],
         | "sink": {"format": "parquet", "path": "$out", "mode": "overwrite"}}""".stripMargin)
    pipeline.run(spark)
    val back = spark.read.parquet(out)
    assert(back.columns.toSeq == Seq("l_orderkey", "l_quantity", "rev"))
    assert(back.count() == 50)
    assert(back.filter(col("l_quantity") <= 25).count() == 0)
  }

  test("pipeline spec: sql escape hatch sees the running frame as graft_spec_input") {
    val df = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/region.parquet"},
         | "transforms": [
         |   {"op": "sql",
         |    "query": "SELECT count(*) AS n FROM graft_spec_input"}]}""".stripMargin)
    assert(df.collect()(0).getLong(0) == 5L)
  }

  test("pipeline spec: first-class join + aggregate match the code-built plan") {
    val df = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/nation.parquet"},
         | "transforms": [
         |   {"op": "withColumn", "name": "r_regionkey", "expr": "n_regionkey"},
         |   {"op": "join", "on": ["r_regionkey"], "how": "inner", "broadcast": true,
         |    "right": {"source": {"format": "parquet", "path": "${TestSpark.sf}/region.parquet"}}},
         |   {"op": "aggregate", "groupBy": ["r_name"],
         |    "aggs": ["count(*) AS n_nations"]},
         |   {"op": "sort", "columns": ["r_name"]}]}""".stripMargin)
    val expected = Tables.nation(spark, TestSpark.sf)
      .join(Tables.region(spark, TestSpark.sf),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).count()
    assert(df.count() == expected.count())
  }

  test("pipeline spec: join broadcast hint reaches the physical plan") {
    val df = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/customer.parquet"},
         | "transforms": [
         |   {"op": "join", "condition": "c_nationkey = n_nationkey", "broadcast": true,
         |    "right": {"source": {"format": "parquet", "path": "${TestSpark.sf}/nation.parquet"},
         |              "transforms": [{"op": "select", "columns": ["n_nationkey", "n_name"]}]}},
         |   {"op": "aggregate", "groupBy": ["n_name"], "aggs": ["count(*) AS n"]}]}""".stripMargin)
    assert(df.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    assert(df.count() == 25)
  }

  test("pipeline spec: aggregate with empty groupBy is a global aggregate") {
    val df = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/region.parquet"},
         | "transforms": [
         |   {"op": "aggregate", "groupBy": [], "aggs": ["count(*) AS n"]}]}""".stripMargin)
    assert(df.collect()(0).getLong(0) == 5L)
  }

  test("pipeline spec: window op ranks within partitions and honors DESC") {
    val df = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/orders.parquet"},
         | "transforms": [
         |   {"op": "window", "partitionBy": ["o_orderstatus"],
         |    "orderBy": ["o_totalprice DESC", "o_orderkey"],
         |    "expr": "row_number()", "as": "rk"},
         |   {"op": "filter", "expr": "rk = 1"}
         | ]}""".stripMargin)
    val top = df.collect()
    // rank 1 must be each status's MAX total price — if "DESC" were
    // parsed as an alias (the expr() trap), this would be the min
    val maxes = Tables.orders(spark, TestSpark.sf)
      .groupBy("o_orderstatus").max("o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getAs[Double]("o_totalprice") ==
        maxes(r.getAs[String]("o_orderstatus")))
    }
  }

  test("pipeline spec: window op rejects an unpartitioned window") {
    val e = intercept[IllegalArgumentException] {
      PipelineSpec.frame(spark,
        s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/orders.parquet"},
           | "transforms": [{"op": "window", "partitionBy": [],
           |   "orderBy": ["o_totalprice"], "expr": "row_number()", "as": "rk"}]}""".stripMargin)
    }
    assert(e.getMessage.contains("partitionBy"))
  }

  test("pipeline spec: the same spec grammar runs as a stream (batch/stream parity)") {
    // stage a bounded file; stream it through the spec'd transforms
    val src = tmp("spec_stream_src")
    Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(src)
    val spec =
      s"""{"source": {"format": "parquet", "path": "$src",
         |  "schema": "l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE"},
         | "transforms": [
         |   {"op": "filter", "expr": "l_quantity > 25"},
         |   {"op": "withColumn", "name": "rev", "expr": "l_extendedprice * (1 - l_discount)"},
         |   {"op": "select", "columns": ["l_orderkey", "rev"]}],
         | "sink": {"format": "memory", "name": "spec_stream_out"}}""".stripMargin
    val q = PipelineSpec.startStream(spark, spec)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("spec_stream_out")
    val batch = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_quantity") > 25)
      .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .select("l_orderkey", "rev")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("pipeline spec: the screen verb streams with exact batch parity") {
    // the watermark screen is an expression-only verb, so the SAME
    // spec document runs on a stream unchanged — survivors on ingest
    // must equal the batch screen's survivors row-for-row.
    val src = tmp("spec_screen_src")
    Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(src)
    val body =
      """ "transforms": [
        |   {"op": "screen", "kind": "watermark", "threshold": 1.5},
        |   {"op": "select", "columns": ["doc_id", "lang"]}]""".stripMargin
    val spec =
      s"""{"source": {"format": "parquet", "path": "$src",
         |  "schema": "doc_id BIGINT, text STRING, lang STRING"},
         |$body,
         | "sink": {"format": "memory", "name": "spec_screen_out"}}""".stripMargin
    val q = PipelineSpec.startStream(spark, spec)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("spec_screen_out")
    val batch = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "$src"},
         |$body}""".stripMargin)
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.count() < Tables.documents(spark, TestSpark.sf).count(),
      "screen must actually drop rows at threshold 1.5")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("pipeline spec: orc and csv sinks round-trip through the registry") {
    val orcOut = tmp("spec_orc_out")
    PipelineSpec.fromJson(
      s"""{"source": {"format": "parquet", "path": "${TestSpark.sf}/nation.parquet"},
         | "transforms": [{"op": "select", "columns": ["n_nationkey", "n_name"]}],
         | "sink": {"format": "orc", "path": "$orcOut", "mode": "overwrite"}}""".stripMargin)
      .run(spark)
    // read the ORC back through a spec'd OrcSource into a CSV sink
    val csvOut = tmp("spec_csv_out")
    PipelineSpec.fromJson(
      s"""{"source": {"format": "orc", "path": "$orcOut"},
         | "transforms": [{"op": "filter", "expr": "n_nationkey < 10"}],
         | "sink": {"format": "csv", "path": "$csvOut", "mode": "overwrite"}}""".stripMargin)
      .run(spark)
    val back = spark.read.option("header", "true").csv(csvOut)
    assert(back.count() == Tables.nation(spark, TestSpark.sf)
      .filter(col("n_nationkey") < 10).count())
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("pipeline spec: bad spec fails loudly with the offending fragment") {
    val e = intercept[IllegalArgumentException] {
      PipelineSpec.fromJson("""{"source": {"format": "sqlite", "path": "x"}, "sink": {"format": "noop"}}""")
    }
    assert(e.getMessage.contains("sqlite"))
  }

  test("pipeline spec: curation chain (filter -> dedup_near -> sample_group) to a partitioned sink") {
    // the full declarative curation loop: the frame() dataflow is the
    // oracle-checked pipeline_spec_curate query; here the SAME json
    // runs end-to-end into a lang-partitioned parquet sink and prunes
    // on read-back.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val out = tmp("spec_curate_out")
    val base = JsonMethods.parse(SpecQueries.curateSpecJson(TestSpark.sf))
    val withSink = base merge JObject("sink" -> JObject(
      "format" -> JString("parquet"), "path" -> JString(out),
      "mode" -> JString("overwrite"),
      "partitionBy" -> JArray(List(JString("lang")))))
    PipelineSpec.fromJson(JsonMethods.compact(JsonMethods.render(withSink))).run(spark)
    val back = spark.read.parquet(out)
    val direct = SparkEntry.queries("pipeline_spec_curate")(spark, TestSpark.sf)
    assert(back.count() == direct.count())
    // per-group cap holds and ranks are 1..k
    assert(back.groupBy("lang").count().filter(col("count") > 3).count() == 0)
    assert(back.agg(max("rn")).collect()(0).getLong(0) <= 3L)
    // partition pruning reaches the scan on the partitioned layout
    val plan = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
  }

  test("pipeline spec: dedup_near drops only verified near-duplicates, keep-first") {
    // exact-copy pair planted with a smaller original id: the copy
    // (larger id) must vanish, the original must survive
    import org.json4s.jackson.JsonMethods
    val planted = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_planted_spec").getAbsolutePath
    val src = Tables.documents(spark, TestSpark.sf).limit(50)
    val copies = src.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 900000L)
    src.unionByName(copies).coalesce(1)
      .write.mode("overwrite").parquet(s"$planted/documents.parquet")
    val deduped = PipelineSpec.frame(spark,
      s"""{"source": {"format": "parquet", "path": "$planted/documents.parquet"},
         | "transforms": [{"op": "dedup_near", "threshold": 0.5}]}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (0L until 5L).foreach { d =>
      assert(deduped.contains(d), s"original $d must survive")
      assert(!deduped.contains(d + 900000L), s"copy ${d + 900000} must be dropped")
    }
  }

  test("upsert keeps existing rows and inserts only missing keys (R11)") {
    import org.apache.spark.sql.functions.lit
    val spark2 = spark
    import spark2.implicits._
    val existing = Seq((1L, "one"), (2L, "two")).toDF("k", "v")
    val incoming = Seq((2L, "TWO-NEW"), (3L, "three")).toDF("k", "v")
    val merged = Upsert.merge(existing, incoming, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(merged == Seq((1L, "one"), (2L, "two"), (3L, "three"))) // existing wins
    val updated = Upsert.mergeUpdate(existing, incoming, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(updated == Seq((1L, "one"), (2L, "TWO-NEW"), (3L, "three"))) // incoming wins
    // idempotence: merging the same increment twice changes nothing
    val once = Upsert.merge(existing, incoming, Seq("k"))
    assert(Upsert.merge(once, incoming, Seq("k")).count() == once.count())
  }

  test("partitioned parquet sink enables partition pruning at read") {
    val out = tmp("part_out")
    Pipeline(
      ParquetSource(s"${TestSpark.sf}/orders.parquet"),
      Seq(_.withColumn("status", col("o_orderstatus"))),
      ParquetSink(out, partitionBy = Seq("status"))
    ).run(spark)
    val pruned = spark.read.parquet(out).filter(col("status") === "O")
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan's PartitionFilters, and only
    // the matching directory is read
    assert(scan.contains("PartitionFilters: [isnotnull(status"))
    assert(pruned.count() > 0)
    assert(new java.io.File(out).listFiles().exists(_.getName == "status=O"))
  }

  test("http json source retries on 429 then parses (reference R5 contract)") {
    var calls = 0
    val fake: String => HttpJsonSource.Response = { _ =>
      calls += 1
      if (calls == 1) HttpJsonSource.Response(429, "")
      else HttpJsonSource.Response(200, """{"id": 1, "name": "a"}
{"id": 2, "name": "b"}""")
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = HttpJsonSource("http://fake", schema, fake, maxRetries = 3, backoffMs = 1)
      .read(spark)
    assert(calls == 2)
    assert(df.count() == 2)
    assert(df.filter(col("name") === "b").count() == 1)
  }

  test("http json source gives up after maxRetries (then attempts parse)") {
    var calls = 0
    val always429: String => HttpJsonSource.Response = { _ =>
      calls += 1; HttpJsonSource.Response(429, "")
    }
    val schema = StructType(Seq(StructField("id", LongType)))
    val df = HttpJsonSource("http://fake", schema, always429, maxRetries = 3, backoffMs = 1)
      .read(spark)
    assert(calls == 4) // initial + 3 retries, mirrors MAX_RETRIES (http.rs:157)
    assert(df.count() == 0)
  }

  test("chunked download: executors write parts + manifest, streamed reassembly (R6/R7)") {
    val dl = ChunkedDownload("u", totalBytes = 25, chunkBytes = 10,
      fetchRange = (_, s, e) => (s to e).map(_.toByte).toArray)
    assert(dl.ranges == Seq((0L, 9L), (10L, 19L), (20L, 24L)))
    val outDir = tmp("chunks")
    val parts = dl.runTo(spark, outDir)
    assert(parts.map(p => (p.start, p.nBytes)) == Seq((0L, 10L), (10L, 10L), (20L, 5L)))
    // parts land as individual files named so lexicographic = byte order
    val names = new java.io.File(outDir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq // drop Hadoop .crc sidecars
    assert(names == Seq("_MANIFEST.json", "part-0000000000000000",
      "part-0000000000000010", "part-0000000000000020"))
    // manifest is valid JSON covering every byte exactly once
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "_MANIFEST.json")), "UTF-8")
    assert(manifest.contains("\"start\":10"))
    // streamed single-file assembly (constant memory) round-trips
    val dest = tmp("chunks_assembled")
    assert(dl.assembleTo(spark, parts, dest) == 25L)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dest))
    assert(bytes.toSeq == (0 until 25).map(_.toByte).toSeq)
  }

  test("quality observation: metrics computed as a load side effect") {
    val (df, obs) = Quality.observed(
      ParquetSource(s"${TestSpark.sf}/customer.parquet").read(spark), "c_custkey")
    ParquetSink(tmp("quality_out")).write(df) // the action that runs the plan
    val m = obs.get
    assert(m("n_rows") == 150L)
    assert(m("n_null_keys") == 0L)
    assert(m("approx_distinct_keys").asInstanceOf[Long] > 100L)
  }

  test("zip source streams entries distributed (R9)") {
    val dir = new java.io.File(tmp("zips")); dir.mkdirs()
    val f = new java.io.File(dir, "a.zip")
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    Seq("one.txt" -> "hello", "sub/two.txt" -> "world!!").foreach { case (n, c) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(c.getBytes); zout.closeEntry()
    }
    zout.close()
    val df = ZipSource.entries(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.filter(col("entry") === "sub/two.txt")
      .select("n_bytes").collect()(0).getLong(0) == 7L)
  }
}
