package graft.operators

import graft.{Parity, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window functions + the reference's signature surrogate-key semantics
  * (SURVEY.md §2.6).
  *
  * `keymap_assign` re-expresses `KeyMap::transact`
  * (`/root/reference/src/keymap.rs:171-183`): existing value → its key;
  * new value → a fresh key past the current max. The reference's exact
  * mex ("lowest free key", `src/keymap.rs:129-135`) is driver-side
  * state; distributed we use max+1 + dense row_number — documented
  * deviation per SURVEY.md §7.3 risk 4, gap-filling is O(n log n)
  * global and rarely what a 100 TB dim wants.
  *
  * Scale: ranking windows partition by bounded keys (segment, user) —
  * state per partition is a sort, spillable. The one global
  * `Window.orderBy(value)` in keymap_assign runs on the *novel-values*
  * set only (post anti-join, post distinct), which is bounded by the
  * dimension's growth, not the fact volume.
  */
object Windows {
  import Tables._

  private def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val det = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_nationkey"), col("c_custkey"))
    val tie = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_nationkey"))
    customer(spark, dir)
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_nationkey"),
        row_number().over(det).cast(LongType).as("rn"),
        rank().over(tie).cast(LongType).as("rnk"),
        dense_rank().over(tie).cast(LongType).as("drnk"),
        ntile(4).over(det).cast(LongType).as("quartile"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  private def windowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(
        col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(w).as("first_value"))
      .orderBy(col("event_id"))
  }

  private def windowFrame(spark: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        Parity.r2(sum(col("o_totalprice"))
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("running_total"),
        Parity.r2(avg(col("o_totalprice"))
          .over(base.rowsBetween(-2, Window.currentRow)))
          .as("moving_avg3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distribution functions: percent_rank and cume_dist — single exact
    * divisions of ranks, bitwise cross-engine. */
  private def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** Value-based (RANGE) frame: a 30-day trailing sum per customer —
    * the frame is defined by the *order value* (days since epoch), not
    * row position, so sparse/dense order histories behave identically.
    */
  private def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("d")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-30, Window.currentRow)
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), days)
      .withColumn("trailing_30d", Parity.r2(sum(col("o_totalprice")).over(w)))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Surrogate-key assignment (R19/R20): dim snapshot = segments seen in
    * a seed subset, keyed 0..n-1; incoming = all distinct segments; new
    * values get maxKey + dense rank. Lookups against the dim would be a
    * broadcast join at scale. */
  private def keymapAssign(spark: SparkSession, dir: String): DataFrame = {
    val existing = customer(spark, dir)
      .filter(col("c_custkey") < 4)
      .select(col("c_mktsegment").as("value")).distinct()
      .select(col("value"),
        (row_number().over(Window.orderBy(col("value"))) - 1).cast(LongType).as("key"))
    val incoming = customer(spark, dir).select(col("c_mktsegment").as("value")).distinct()
    val maxKey = existing.agg(coalesce(max(col("key")), lit(-1L)).as("max_key"))
    val novel = incoming.join(existing, Seq("value"), "left_anti")
      .crossJoin(broadcast(maxKey))
      .select(col("value"),
        (col("max_key") + row_number().over(Window.orderBy(col("value"))).cast(LongType)).as("key"))
    existing.select(col("key"), col("value"))
      .unionByName(novel.select(col("key"), col("value")))
      .orderBy(col("key"))
  }

  /** Order-backlog balance over time — the event-sourcing "open items
    * at time t" pattern: daily placements minus daily completions
    * (an order completes when its LAST line ships), full-outer-merged
    * onto one day axis with a running difference. Both sides collapse
    * to day histograms before any window (map-side combinable); the
    * cumulative runs on the metadata-sized day relation. Orders with
    * no lineitems never complete — they correctly stay in the
    * backlog. All-integer ⇒ exact. */
  private def ordersBacklog(spark: SparkSession, dir: String): DataFrame = {
    val placed = orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("placed"))
    val done = lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .groupBy(to_date(col("last_ship")).as("day"))
      .agg(count(lit(1)).as("done"))
    val cum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    placed.join(done, Seq("day"), "full_outer")
      .na.fill(0L, Seq("placed", "done"))
      .withColumn("backlog",
        sum(col("placed")).over(cum) - sum(col("done")).over(cum))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("placed"), col("done"), col("backlog"))
      .orderBy(col("day"))
  }

  /** Ship-lag distribution per order priority: interpolated P50/P90 of
    * whole-day order-to-ship latency — the fulfilment-SLA profile. The
    * fact join is key-partitioned (orderkey); lags are integer days,
    * so the percentile histogram is value-domain-bounded per group and
    * the [[Statistics]] interpolation recipe applies bit-exactly
    * (oracle: quantile_cont). */
  private def aggShipLag(spark: SparkSession, dir: String): DataFrame = {
    val lags = lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast(LongType).as("lag"))
    val byP = Window.partitionBy(col("o_orderpriority"))
    val cumW = byP.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = lags.groupBy(col("o_orderpriority"), col("lag"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(byP))
    def pct(p: Double, name: String) = {
      val pos = lit(p) * (col("n") - 1)
      val coversLo = floor(pos) >= col("cum") - col("cnt") && floor(pos) < col("cum")
      val coversHi = ceil(pos) >= col("cum") - col("cnt") && ceil(pos) < col("cum")
      val lo = max(when(coversLo, col("lag")))
      val hi = max(when(coversHi, col("lag")))
      Parity.r4(lo + (hi - lo) * (min(pos) - floor(min(pos)))).as(name)
    }
    hist.groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n"), pct(0.5, "p50_days"), pct(0.9, "p90_days"))
      .orderBy(col("o_orderpriority"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("orders_backlog", Some(
      """WITH placed AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(count(*) AS BIGINT) AS placed
        |  FROM orders GROUP BY 1),
        | done AS (
        |  SELECT CAST(last_ship AS DATE) AS day,
        |   CAST(count(*) AS BIGINT) AS done
        |  FROM (SELECT l_orderkey, max(l_shipdate) AS last_ship
        |        FROM lineitem GROUP BY 1) GROUP BY 1),
        | m AS (
        |  SELECT coalesce(p.day, d.day) AS day,
        |   coalesce(p.placed, 0) AS placed, coalesce(d.done, 0) AS done
        |  FROM placed p FULL JOIN done d ON p.day = d.day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, placed, done,
        | CAST(sum(placed) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  - CAST(sum(done) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS backlog
        |FROM m ORDER BY day""".stripMargin),
      ordersBacklog),

    QueryDef("agg_ship_lag", Some(
      """WITH l AS (
        |  SELECT o_orderpriority,
        |   CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |     CAST(l_shipdate AS DATE)) AS BIGINT) AS lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | floor(quantile_cont(lag, 0.5) * 10000 + 0.5) / 10000 AS p50_days,
        | floor(quantile_cont(lag, 0.9) * 10000 + 0.5) / 10000 AS p90_days
        |FROM l GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      aggShipLag),

    QueryDef("window_rank", Some(
      """SELECT c_mktsegment, c_custkey, c_nationkey,
        | CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey, c_custkey) AS BIGINT) AS rn,
        | CAST(rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS BIGINT) AS drnk,
        | CAST(ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey, c_custkey) AS BIGINT) AS quartile
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin), windowRank),

    QueryDef("window_analytic", Some(
      """SELECT event_id, user_id,
        | lag(value, 1)  OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | first_value(value) OVER w AS first_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin), windowAnalytic),

    QueryDef("window_frame", Some(
      """SELECT o_custkey, o_orderkey,
        | floor(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS running_total,
        | floor(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS moving_avg3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin), windowFrame),

    QueryDef("window_distribution", Some(
      """SELECT c_mktsegment, c_custkey,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin), windowDistribution),

    QueryDef("window_range_frame", Some(
      """SELECT o_custkey, o_orderkey,
        | floor(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
        |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS trailing_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin), windowRangeFrame),

    QueryDef("keymap_assign", Some(
      """WITH existing AS (
        |  SELECT value, CAST(row_number() OVER (ORDER BY value) - 1 AS BIGINT) AS key
        |  FROM (SELECT DISTINCT c_mktsegment AS value FROM customer WHERE c_custkey < 4)),
        | incoming AS (SELECT DISTINCT c_mktsegment AS value FROM customer),
        | novel AS (SELECT value FROM incoming
        |   WHERE value NOT IN (SELECT value FROM existing)),
        | assigned AS (SELECT value,
        |   (SELECT coalesce(max(key), -1) FROM existing)
        |     + CAST(row_number() OVER (ORDER BY value) AS BIGINT) AS key
        |  FROM novel)
        |SELECT key, value FROM existing
        |UNION ALL SELECT key, value FROM assigned
        |ORDER BY key""".stripMargin), keymapAssign)
  )
}
