package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Table loaders for the driver-generated parquet star schema
  * (/root/repo/TESTDATA.md). All operators read through here so the
  * scan path (and any future source swap — e.g. bucketed tables on a
  * real cluster) is centralized.
  *
  * Scale note: `spark.read.parquet` plans splits from footer metadata
  * (`maxPartitionBytes`), so the same code path scales from the 6k-row
  * sf0.001 fixture to a 100 TB lake — no code change, only config.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** `events.ts` has shipped as two parquet types across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 rejects by default —
    * read nanos as raw long and integer-`div` to µs; no double
    * round-trip, which would lose precision above 2^53 ns) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (which loads as
    * TIMESTAMP_NTZ — cast to the session-TZ type; every session here
    * pins UTC so the cast is value-preserving). DuckDB reads the same
    * column at µs precision either way, so both engines see identical
    * values (SURVEY.md §7.3 risk 2). Branch on the LOADED dtype so the
    * engine runs against either generation unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    raw.withColumn("ts", ts)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan-out for CPU-heavy per-row operators (hashing, vector math): a
    * small parquet arrives as one split, which would pin the whole
    * computation to a single core. At lake scale the file-split planner
    * provides this parallelism naturally — and there the repartition is
    * NOT free insurance but a pure tax: a round-robin shuffle of the
    * full payload (document text included, since pruning can't drop
    * the columns the operator needs) plus Spark's
    * sort-before-repartition pass over every row. Measured at sf100
    * (decade 3, round 13): the unconditional repartition cost
    * corpus_dsir_select two full-text shuffles per run. So fan out
    * ONLY when the planned scan has fewer splits than cores; results
    * are partition-layout-independent by design (every oracle is a
    * hash compare over sorted output), so the branch is
    * plan-conditional, never semantic.
    *
    * Gate caveat (adjudicated round 14): `df.rdd.getNumPartitions`
    * forces physical planning (split enumeration, no job) at
    * construction time, so the ANALYZED plan the impl gate fingerprints
    * depends on this branch. The fingerprint is stable because the
    * canonical gate fixture (sf0.001, ~6 k rows, a few KB per file) is
    * single-split at any `maxPartitionBytes`/core count a gate machine
    * could have — splits(1) < cores(≥2) always takes the repartition
    * branch. A future canonical fixture MUST stay below the split
    * threshold (one row-group, < maxPartitionBytes), else ImplGateSpec
    * trips spuriously on machines with different layouts — the
    * constraint is also pinned in CLAUDE.md's regeneration playbook. */
  def fanout(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}

/** One oracle-checked operator: `name` keys `SparkEntry.queries`;
  * `oracle` (when present) is the equivalent DuckDB SQL the driver runs
  * against the same parquet tables and hash-compares (column names must
  * match exactly — see the parity rules in SURVEY.md §5.2).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
