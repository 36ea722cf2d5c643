package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed surrogate-key map — the Spark-native `KeyMap`
  * (`/root/reference/src/keymap.rs:37-44`): a bijective (key ↔ value)
  * dimension with the reference's exact semantics:
  *
  *  - existing value → its existing key (`transact`, `keymap.rs:171-183`)
  *  - new value → the lowest free non-negative key (*mex*), gaps filled
  *    first (`calc_lowest_key`, `keymap.rs:129-142`; doc-tests
  *    `keymap.rs:24-35,153-170`: keys {0,1,3} → next is 2, then 4)
  *
  * Implementation: free keys are generated as `spark.range(0, max+m+1)`
  * anti-joined against used keys, ranked, and zipped to the ranked
  * novel values — exact mex gap-filling, fully distributed, O(|dim|)
  * work (never proportional to fact volume). At 100 TB the dim is the
  * small side: `lookup` broadcasts it.
  *
  * The deliberate deviation documented in SURVEY.md §7.3 (max+1 instead
  * of mex) applies only to the streaming-append fast path
  * (`assignDense`); `transact` is faithful.
  */
final case class KeyMap(dim: DataFrame) {
  require(dim.columns.toSeq == Seq("key", "value"),
    s"KeyMap dim must have (key, value) columns, got ${dim.columns.mkString(",")}")

  /** Reference `transact` lifted to a batch of values: dedupe incoming,
    * keep existing assignments, give novel values the lowest free keys
    * (gap-filling mex order, ties broken by value order — matching the
    * reference's per-record insertion by iteration order). */
  def transact(values: DataFrame): KeyMap = {
    val spark = dim.sparkSession
    val incoming = values.toDF("value").distinct()
    val novel = incoming.join(dim, Seq("value"), "left_anti")
      .withColumn("slot_idx",
        (row_number().over(Window.orderBy(col("value"))) - 1).cast(LongType))

    val stats = dim.agg(
      coalesce(max(col("key")), lit(-1L)).as("max_key")).collect()(0)
    val maxKey = stats.getLong(0)
    val nNovel = novel.count()

    if (nNovel == 0) this
    else {
      // candidate keys 0..max+nNovel: enough to fill every gap and extend
      val free = spark.range(0, maxKey + nNovel + 1).toDF("key")
        .join(dim.select("key"), Seq("key"), "left_anti")
        .withColumn("slot_idx",
          (row_number().over(Window.orderBy(col("key"))) - 1).cast(LongType))
      val assigned = novel.join(free, "slot_idx").select(col("key"), col("value"))
      KeyMap(dim.unionByName(assigned))
    }
  }

  /** Fast path for append-heavy pipelines: max+1 + dense rank, no gap
    * filling (one less join; keys stay monotonic). */
  def assignDense(values: DataFrame): KeyMap = {
    val incoming = values.toDF("value").distinct()
    val novel = incoming.join(dim, Seq("value"), "left_anti")
    val maxKey = dim.agg(coalesce(max(col("key")), lit(-1L))).collect()(0).getLong(0)
    val assigned = novel.select(
      (lit(maxKey) + row_number().over(Window.orderBy(col("value"))).cast(LongType)).as("key"),
      col("value"))
    KeyMap(dim.unionByName(assigned))
  }

  /** Dimension lookup on a fact table — broadcast hash join (the dim is
    * the bounded side by construction). */
  def lookup(facts: DataFrame, valueCol: String): DataFrame =
    facts.join(broadcast(dim.withColumnRenamed("value", valueCol)), Seq(valueCol), "left")

  /** The reference's `calc_lowest_key` (mex): smallest non-negative
    * integer not present as a key (`keymap.rs:129-135`). */
  def lowestFreeKey(): Long = {
    val spark = dim.sparkSession
    val maxKey = dim.agg(coalesce(max(col("key")), lit(-1L))).collect()(0).getLong(0)
    spark.range(0, maxKey + 2).toDF("key")
      .join(dim.select("key"), Seq("key"), "left_anti")
      .agg(min(col("key"))).collect()(0).getLong(0)
  }

  def lookupKey(value: String): Option[Long] =
    dim.filter(col("value") === value).select("key")
      .collect().headOption.map(_.getLong(0))
}

object KeyMap {
  /** `KeyMap::from` / `pg_fetch` (`/root/reference/src/keymap.rs:52-75`):
    * build from an existing two-column dimension. */
  def fromDim(df: DataFrame, keyCol: String, valueCol: String): KeyMap =
    KeyMap(df.select(col(keyCol).cast(LongType).as("key"), col(valueCol).as("value")))

  def empty(spark: SparkSession): KeyMap = {
    import org.apache.spark.sql.types._
    KeyMap(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("key", LongType), StructField("value", StringType)))))
  }
}
