package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, concat, expr, lit, md5, row_number, spark_partition_id}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declarative, config-driven pipeline construction — the working
  * Spark analogue of the reference's designed-but-commented-out
  * `#[skopje::extract(method = HTTP_GET, url = ...)]` /
  * `#[skopje::load(...)]` attribute macros
  * (`/root/reference/skopje-macros/src/lib.rs:12-75`): wire a whole
  * extract → transform → load flow from a configuration document
  * instead of code.
  *
  * A JSON spec names a source, an ordered list of transforms, and a
  * sink, resolved against the [[Source]]/[[Sink]] registry in Etl.scala.
  * Every transform is a SQL/Column EXPRESSION, never a closure, so the
  * assembled [[Pipeline]] is still one Catalyst plan — filter pushdown
  * and column pruning cross every spec stage, and the whole flow stays
  * whole-stage-codegen'd exactly as if it had been written in code.
  *
  * {{{
  * {"source": {"format": "parquet", "path": "/data/lineitem.parquet"},
  *  "transforms": [
  *    {"op": "filter", "expr": "l_quantity > 10"},
  *    {"op": "withColumn", "name": "rev", "expr": "l_extendedprice * (1 - l_discount)"},
  *    {"op": "select", "columns": ["l_orderkey", "rev"]}],
  *  "sink": {"format": "parquet", "path": "/out/rev", "mode": "overwrite"}}
  * }}}
  */
object PipelineSpec {

  private val viewCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Parse a JSON pipeline spec into a runnable [[Pipeline]]. */
  def fromJson(json: String): Pipeline = {
    val root = JsonMethods.parse(json)
    Pipeline(source(root \ "source"), transforms(root \ "transforms"), sink(root \ "sink"))
  }

  /** Source + transforms only (no sink): the spec's dataflow as a
    * DataFrame, for composing a spec'd extract into further code. */
  def frame(spark: SparkSession, json: String): DataFrame = {
    val root = JsonMethods.parse(json)
    transforms(root \ "transforms").foldLeft(source(root \ "source").read(spark))((df, f) => f(df))
  }

  /** The SAME spec grammar, executed as a stream: the source becomes a
    * `readStream` (file sources need an explicit "schema" — streaming
    * scans can't infer), the expression transforms apply unchanged
    * (they are Catalyst expressions, so batch/stream unification is
    * literal code reuse), and the sink becomes a `writeStream`. This is
    * the engine's batch/stream convergence point: one config document,
    * two execution modes. Transforms with batch-only semantics (sort,
    * limit) fail at stream start with Spark's own analysis error. */
  def streamFrame(spark: SparkSession, json: String): DataFrame = {
    val root = JsonMethods.parse(json)
    val src = root \ "source"
    val schema = StructType.fromDDL(str(src, "schema"))
    val reader = spark.readStream.schema(schema)
    val df = str(src, "format") match {
      case "parquet" => reader.parquet(str(src, "path"))
      case "json" => reader.json(str(src, "path"))
      case "csv" => reader.option("header", boolOpt(src, "header").getOrElse(true).toString)
        .csv(str(src, "path"))
      case other => fail(s"unknown streaming source format '$other'", src)
    }
    transforms(root \ "transforms").foldLeft(df)((d, f) => f(d))
  }

  /** Run a spec as a streaming query. Sinks: "parquet" (append files,
    * requires "checkpoint" for exactly-once progress tracking),
    * "memory" (test/inspection, requires "name"). Returns the running
    * query; the caller owns its lifecycle. */
  def startStream(spark: SparkSession, json: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val root = JsonMethods.parse(json)
    val out = streamFrame(spark, json)
    val snk = root \ "sink"
    str(snk, "format") match {
      case "parquet" =>
        out.writeStream.format("parquet")
          .option("path", str(snk, "path"))
          .option("checkpointLocation", str(snk, "checkpoint"))
          .outputMode(strOpt(snk, "outputMode").getOrElse("append"))
          .start()
      case "memory" =>
        out.writeStream.format("memory")
          .queryName(str(snk, "name"))
          .outputMode(strOpt(snk, "outputMode").getOrElse("append"))
          .start()
      case other => fail(s"unknown streaming sink format '$other'", snk)
    }
  }

  // ------------------------------------------------------------- parsing

  private def fail(msg: String, v: JValue): Nothing =
    throw new IllegalArgumentException(s"pipeline spec: $msg in ${JsonMethods.compact(JsonMethods.render(v))}")

  private def str(v: JValue, field: String): String = v \ field match {
    case JString(s) => s
    case _ => fail(s"missing string field '$field'", v)
  }

  // Optional fields distinguish ABSENT (None) from PRESENT-BUT-WRONG-TYPED
  // (loud failure) — a sink "mode": 5 must never silently default to
  // Overwrite and destroy output the user meant to append to.
  private def strOpt(v: JValue, field: String): Option[String] = v \ field match {
    case JString(s) => Some(s)
    case JNothing => None
    case other => fail(s"field '$field' must be a string", other)
  }

  private def strSeq(v: JValue, field: String): Seq[String] = v \ field match {
    case JArray(xs) => xs.map { case JString(s) => s; case other => fail("non-string element", other) }
    case JNothing => Seq.empty
    case _ => fail(s"field '$field' must be a string array", v)
  }

  private def boolOpt(v: JValue, field: String): Option[Boolean] = v \ field match {
    case JBool(b) => Some(b)
    case JNothing => None
    case other => fail(s"field '$field' must be a boolean", other)
  }

  private def intOpt(v: JValue, field: String): Option[Int] = v \ field match {
    case JInt(i) => Some(i.toInt)
    case JNothing => None
    case other => fail(s"field '$field' must be an integer", other)
  }

  private def doubleOpt(v: JValue, field: String): Option[Double] = v \ field match {
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JInt(i) => Some(i.toDouble)
    case JNothing => None
    case other => fail(s"field '$field' must be a number", other)
  }

  // ------------------------------------------------------------ registry

  private def source(v: JValue): Source = str(v, "format") match {
    case "parquet" => ParquetSource(str(v, "path"))
    case "orc" => OrcSource(str(v, "path"))
    case "json" => JsonSource(str(v, "path"), StructType.fromDDL(str(v, "schema")),
      multiLine = boolOpt(v, "multiLine").getOrElse(false))
    case "csv" => CsvSource(str(v, "path"), StructType.fromDDL(str(v, "schema")),
      header = boolOpt(v, "header").getOrElse(true))
    case other => fail(s"unknown source format '$other'", v)
  }

  /** Parse a sort item with an optional trailing ASC/DESC. Passing the
    * raw string to `expr` is a silent-wrong-answer trap: the SQL
    * expression parser reads "price DESC" as `price AS DESC` — an
    * ALIAS — and the sort comes out ascending. */
  private def sortItem(s: String): Column = {
    val t = s.trim
    val l = t.toLowerCase(java.util.Locale.ROOT)
    if (l.endsWith(" desc")) expr(t.dropRight(5).trim).desc
    else if (l.endsWith(" asc")) expr(t.dropRight(4).trim).asc
    else expr(t)
  }

  private def transforms(v: JValue): Seq[DataFrame => DataFrame] = v match {
    case JArray(ts) => ts.map(transform)
    case JNothing => Seq.empty
    case _ => fail("'transforms' must be an array", v)
  }

  private def transform(v: JValue): DataFrame => DataFrame = str(v, "op") match {
    case "filter" =>
      val e = str(v, "expr"); df => df.filter(e)
    case "select" =>
      val cs = strSeq(v, "columns"); df => df.selectExpr(cs: _*)
    case "withColumn" =>
      val n = str(v, "name"); val e = str(v, "expr"); df => df.withColumn(n, expr(e))
    case "drop" =>
      val cs = strSeq(v, "columns"); df => df.drop(cs: _*)
    case "dedup" =>
      val cs = strSeq(v, "columns")
      df => if (cs.isEmpty) df.dropDuplicates() else df.dropDuplicates(cs)
    case "sort" =>
      val cs = strSeq(v, "columns"); df => df.orderBy(cs.map(sortItem): _*)
    case "limit" =>
      val n = intOpt(v, "n").getOrElse(fail("limit needs 'n'", v)); df => df.limit(n)
    case "repartition" =>
      // explicit partitioning lever: by columns (co-locate a later
      // join/agg) and/or a target partition count
      // bare {"op":"repartition"} = fan out to cluster parallelism —
      // the Tables.fanout lever as config, for CPU-bound per-row
      // stages over few-split sources (a one-file parquet scan would
      // otherwise pin a downstream screen/regex/hash stage to one
      // core; measured 7.3 s → sub-second on pipeline_spec_screen)
      val cs = strSeq(v, "columns"); val n = intOpt(v, "n")
      df => (n, cs) match {
        case (Some(k), Seq()) => df.repartition(k)
        case (Some(k), cols) => df.repartition(k, cols.map(col): _*)
        case (None, cols) if cols.nonEmpty => df.repartition(cols.map(col): _*)
        case (None, Seq()) =>
          df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      }
    case "join" =>
      // first-class multi-source composition (the reference macro
      // design's implied join, skopje-macros/src/lib.rs:12-75): the
      // right side is itself a nested {source, transforms} spec, so a
      // config document expresses a full star join with per-dimension
      // pushdown. Equi-keys ("on") keep Catalyst free to pick
      // broadcast/shuffle strategy; "broadcast": true hints a bounded
      // dimension explicitly; "condition" admits theta joins.
      val right = v \ "right"
      if (right == JNothing) fail("join needs a 'right' {source, transforms} spec", v)
      val rightSrc = source(right \ "source")
      val rightTs = transforms(right \ "transforms")
      val on = strSeq(v, "on")
      val condOpt = strOpt(v, "condition")
      val how = strOpt(v, "how").getOrElse("inner")
      val bcast = boolOpt(v, "broadcast").getOrElse(false)
      df => {
        val built = rightTs.foldLeft(rightSrc.read(df.sparkSession))((d, f) => f(d))
        val r = if (bcast) org.apache.spark.sql.functions.broadcast(built) else built
        (on, condOpt) match {
          case (keys, None) if keys.nonEmpty => df.join(r, keys, how)
          case (Seq(), Some(c)) => df.join(r, expr(c), how)
          case _ => fail("join needs exactly one of 'on' or 'condition'", v)
        }
      }
    case "aggregate" =>
      // declarative groupBy: "aggs" are SQL aggregate expressions with
      // aliases ("sum(x) AS total"); empty "groupBy" = global aggregate.
      // Still one Catalyst plan — partial aggregation happens map-side
      // exactly as in code-built queries.
      val gs = strSeq(v, "groupBy")
      val aggs = strSeq(v, "aggs")
      if (aggs.isEmpty) fail("aggregate needs a nonempty 'aggs' array", v)
      df => {
        val aggCols = aggs.map(expr)
        if (gs.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(gs.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      }
    case "window" =>
      // declarative window functions — the last transform class the
      // grammar lacked (rank/lag/rolling metrics without SQL text).
      // "partitionBy" is REQUIRED non-empty: a config-driven global
      // window is exactly the single-partition straggler the engine
      // bans everywhere else; express a global rank via sort+limit or
      // the sql op, deliberately.
      val parts = strSeq(v, "partitionBy")
      val order = strSeq(v, "orderBy")
      val wexpr = str(v, "expr")
      val as = str(v, "as")
      if (parts.isEmpty)
        fail("window needs a nonempty 'partitionBy' (global windows are a scale hazard)", v)
      df => {
        import org.apache.spark.sql.expressions.Window
        val w0 = Window.partitionBy(parts.map(col): _*)
        val w = if (order.isEmpty) w0 else w0.orderBy(order.map(sortItem): _*)
        df.withColumn(as, expr(wexpr).over(w))
      }
    case "dedup_near" =>
      // declarative NEAR-duplicate removal — the curation loop's dedup
      // step as config (the exact-dedup "dedup" op above can't catch
      // boilerplate variants): MinHash LSH candidates + exact-Jaccard
      // verify at "threshold" (default 0.5), then drop every row whose
      // id matches a verified duplicate with a SMALLER id (keep-first,
      // deterministic at any partitioning). Same banding machinery as
      // dedup_minhash_verified — band-keyed equi-joins, no all-pairs.
      val idc = strOpt(v, "id").getOrElse("doc_id")
      val txt = strOpt(v, "text").getOrElse("text")
      val thr = doubleOpt(v, "threshold").getOrElse(0.5)
      df => {
        // fanout: a small single-split parquet source would otherwise
        // pin the whole signature pass to one core (plan-conditional —
        // a no-op once the file planner provides the parallelism)
        val std = graft.Tables.fanout(
          df.select(col(idc).as("doc_id"), col(txt).as("text")))
        val victims = graft.operators.Dedup.verifiedPairsOf(std, thr)
          .select(col("doc_b").as(idc)).distinct()
        df.join(victims, Seq(idc), "left_anti")
      }
    case "screen" =>
      // declarative PROVENANCE SCREEN — the curation loop's
      // synthetic-text gate as config: kind "watermark" computes the
      // greenlist one-proportion z per row (text_watermark_detect
      // semantics — same md5 keying via TextOps.isGreenPair, docs
      // under 2 tokens score 0) and DROPS rows with z > "threshold"
      // (default 4.0). Stateless per-row array fold, no shuffle.
      val kind = str(v, "kind")
      val txt = strOpt(v, "text").getOrElse("text")
      kind match {
        case "watermark" =>
          val thr = doubleOpt(v, "threshold").getOrElse(4.0)
          df => {
            val tk = F.filter(F.split(col(txt), " "), t => t =!= "")
            val bg = F.transform(F.sequence(lit(1), F.size(tk) - 1),
              i => F.concat_ws(" ", F.slice(tk, i, lit(2))))
            val n = F.size(bg).cast("double")
            val g = F.size(F.filter(bg, graft.operators.TextOps.isGreenPair _))
              .cast("double")
            val z = F.when(F.size(tk) >= 2, (lit(2.0) * g - n) / F.sqrt(n))
              .otherwise(lit(0.0))
            // the always-false nondeterministic disjunct pins this
            // filter ABOVE any preceding repartition: Catalyst pushes
            // deterministic predicates below exchanges, which would
            // run the md5 fold inside the (often single-split) scan
            // stage on one core — measured 6.5 s vs 0.6 s at sf0.1
            df.filter(z <= thr || spark_partition_id() < lit(0))
          }
        case other => fail(s"unknown screen kind '$other'", v)
      }
    case "sample_group" =>
      // declarative reproducible k-per-group sampling: rank rows in
      // each "by" group by md5(seed:key) and keep the k smallest —
      // partition-independent and stable under corpus growth within a
      // group ordering. Two-phase (partition-local top-k prune, then
      // the global rank over <= k·P survivors) so no single group's
      // full membership ever funnels through one task — the same
      // shape as sample_per_group (Curation.scala).
      // CONTRACT: 'key' must identify rows uniquely within each group
      // (the key value itself breaks md5 ties deterministically, so
      // distinct keys always rank reproducibly; rows sharing the SAME
      // key value are interchangeable under any ordering, so which of
      // them is kept is undefined — pass a row-unique key).
      val by = strSeq(v, "by")
      val k = intOpt(v, "k").getOrElse(fail("sample_group needs 'k'", v))
      val keyE = str(v, "key")
      val seed = strOpt(v, "seed").getOrElse("spec")
      val rankAs = strOpt(v, "as")
      if (by.isEmpty)
        fail("sample_group needs a nonempty 'by' (global sampling is a scale hazard)", v)
      df => {
        import org.apache.spark.sql.expressions.Window
        val tieKey = expr(keyE).cast("string")
        val local = Window
          .partitionBy((by.map(col) :+ spark_partition_id()): _*)
          .orderBy(col("__sg_h"), tieKey)
        val global = Window.partitionBy(by.map(col): _*)
          .orderBy(col("__sg_h"), tieKey)
        val ranked = df
          .withColumn("__sg_h", md5(concat(lit(s"$seed:"), expr(keyE).cast("string"))))
          .withColumn("__sg_l", row_number().over(local))
          .filter(col("__sg_l") <= k)
          .withColumn("__sg_r", row_number().over(global).cast("long"))
          .filter(col("__sg_r") <= k)
        val kept = rankAs match {
          case Some(a) => ranked.withColumn(a, col("__sg_r"))
          case None => ranked
        }
        kept.drop("__sg_h", "__sg_l", "__sg_r")
      }
    case "sql" =>
      // whole-query escape hatch: the running frame is exposed to the
      // query as the view `graft_spec_input`. Each invocation registers
      // a UNIQUE physical view (counter suffix) and drops it after the
      // query resolves, so concurrent pipelines / nested frame() calls
      // in one session can't clobber each other and nothing leaks; the
      // spec text itself keeps using the stable logical name.
      // DOCUMENTED LIMIT: the rewrite is textual (word-boundary regex),
      // so the token `graft_spec_input` is also replaced inside string
      // literals/comments in the query — treat the name as reserved.
      val q = str(v, "query")
      df => {
        val view = s"graft_spec_input_${viewCounter.incrementAndGet()}"
        df.createOrReplaceTempView(view)
        try df.sparkSession.sql(
          q.replaceAll("\\bgraft_spec_input\\b", view))
        finally df.sparkSession.catalog.dropTempView(view)
      }
    case other => fail(s"unknown transform op '$other'", v)
  }

  private def sink(v: JValue): Sink = str(v, "format") match {
    case "parquet" =>
      ParquetSink(str(v, "path"), saveMode(strOpt(v, "mode")), strSeq(v, "partitionBy"))
    case "orc" =>
      OrcSink(str(v, "path"), saveMode(strOpt(v, "mode")), strSeq(v, "partitionBy"))
    case "csv" =>
      CsvSink(str(v, "path"), saveMode(strOpt(v, "mode")),
        header = boolOpt(v, "header").getOrElse(true))
    case "json" =>
      JsonSink(str(v, "path"), saveMode(strOpt(v, "mode")))
    case "noop" =>
      // measurement/validation sink: computes everything, writes nothing
      (df: DataFrame) => df.write.format("noop").mode("overwrite").save()
    case other => fail(s"unknown sink format '$other'", v)
  }

  private def saveMode(s: Option[String]): SaveMode = s.map(_.toLowerCase) match {
    case None | Some("overwrite") => SaveMode.Overwrite
    case Some("append") => SaveMode.Append
    case Some("ignore") => SaveMode.Ignore
    case Some("error") | Some("errorifexists") => SaveMode.ErrorIfExists
    case Some(other) => throw new IllegalArgumentException(s"pipeline spec: unknown save mode '$other'")
  }
}
