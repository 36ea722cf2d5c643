package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Physical-plan SHAPE fingerprints for the bench headline set — the
  * round-7 "plan drift" tripwire. The r5→r6 bench-outlier episode cost
  * a round of attention re-timing queries whose plans had not actually
  * changed; the cheap guard is to diff the PLANS, not the times: hash a
  * normalized executedPlan string per headline query into a committed
  * artifact (tools/plan_shapes.json) and fail `sbt test`
  * (PlanDriftSpec) when any shape changes without the artifact (and a
  * PLANS.md note) being updated in the same commit.
  *
  * Normalization strips everything run-dependent — expression ids,
  * plan ids, file paths/locations, statistics — leaving the operator
  * tree and its strategy choices (join types, exchange placement,
  * pushed filters), which is exactly what a regression would alter.
  *
  * The fingerprints are config-sensitive (partition counts, AQE
  * thresholds, data sizes feed strategy choices), so the generator
  * pins the EXACT TestSpark session shape: local[4], 4 shuffle
  * partitions, UTC, sf0.001.
  *
  * Regenerate after an intentional plan change:
  *   sbt "runMain graft.PlanShapes"         # rewrites tools/plan_shapes.json
  * and record WHY in PLANS.md in the same commit.
  */
object PlanShapes {
  val ArtifactPath = "tools/plan_shapes.json"

  def normalize(plan: String): String = plan
    .replaceAll("#\\d+", "#")
    // Lambda variable names carry a SESSION-GLOBAL counter (x_157):
    // adding/removing any higher-order function anywhere shifts every
    // later query's lambdas, which is run-order noise, not shape.
    .replaceAll("lambda [A-Za-z]+_\\d+", "lambda v_")
    // FileScan truncates DataFilters to ~100 chars BEFORE id stripping,
    // so expression-id widths (#89 vs #123) shift the truncation point.
    // The content duplicates the Filter node above the scan — drop it.
    .replaceAll("(?s)DataFilters: \\[.*?(?=, Format:)", "DataFilters: [..]")
    .replaceAll("plan_id=\\d+", "plan_id=")
    .replaceAll("Location: [A-Za-z0-9]+\\([^)]*\\)\\[[^\\]]*\\]", "Location: PATH")
    .replaceAll("file:[^\\s\\],)]+", "file:PATH")
    .replaceAll("/tmp/[^\\s\\],)]+", "PATH")
    .replaceAll("/root/testdata/[^\\s\\],)]+", "PATH")
    .replaceAll("Statistics\\([^)]*\\)", "Statistics()")

  def shapeHash(spark: SparkSession, sfDir: String, name: String): String = {
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(normalize(plan).getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entries = Bench.headline.toSeq.sorted.map { q =>
      s"""  "$q": "${shapeHash(spark, sfDir, q)}""""
    }
    val json = entries.mkString("{\n", ",\n", "\n}\n")
    Files.writeString(Paths.get(ArtifactPath), json)
    println(s"[plan-shapes] wrote ${entries.size} fingerprints to $ArtifactPath")
    spark.stop()
  }
}
