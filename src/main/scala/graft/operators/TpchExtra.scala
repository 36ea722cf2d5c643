package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The remaining TPC-H-shaped SQL queries (Q4/Q6/Q8/Q9/Q11/Q12/Q13/
  * Q15/Q16/Q17/Q20), adapted to the reduced test schema — the testdata
  * has no `partsupp` table and drops the comment/shipmode/commitdate
  * columns, so the partsupp-dependent queries re-derive supply facts
  * from `lineitem` and the text filters move to columns that exist.
  * Together with Statistics.scala's Q2/Q3/Q5/Q7/Q10/Q14/Q18/Q19/Q21/
  * Q22 this completes the classic 22-query shape inventory (Q1 is
  * `q1_pricing_summary`).
  *
  * All of these run as SQL text through `spark.sql` — the point of the
  * family is exercising Catalyst's decorrelation (EXISTS with a
  * non-equality outer reference in Q4, correlated scalar agg in Q17),
  * CTE reuse (Q15), null-tolerant anti-join (NOT IN in Q16), and
  * grouped-HAVING-vs-global-scalar pruning (Q11) from the SQL surface,
  * exactly as a reference user would write them.
  *
  * Scale notes (100 TB posture): every query here is
  * join-on-key + group-by — shuffles on join/group keys with map-side
  * partial aggregation, broadcastable dims (nation/region/supplier/
  * part at dim scale), and no driver-side loops. Q11's HAVING
  * threshold compares two independently-summed doubles; the 0.001
  * relative threshold sits ~9 orders of magnitude above double ulp at
  * these magnitudes, so the cross-engine flip risk is nil in practice
  * (same reasoning as the revenue roundings, see graft.Parity).
  */
object TpchExtra {
  import Tables._

  private def views(spark: SparkSession, dir: String): Unit = {
    customer(spark, dir).createOrReplaceTempView("graft_sql_customer")
    orders(spark, dir).createOrReplaceTempView("graft_sql_orders")
    lineitem(spark, dir).createOrReplaceTempView("graft_sql_lineitem")
    supplier(spark, dir).createOrReplaceTempView("graft_sql_supplier")
    part(spark, dir).createOrReplaceTempView("graft_sql_part")
    nation(spark, dir).createOrReplaceTempView("graft_sql_nation")
    region(spark, dir).createOrReplaceTempView("graft_sql_region")
  }

  /** Q4: priority-order count of orders with a late-shipped line
    * (EXISTS carries an outer-date inequality; Catalyst decorrelates
    * to a left-semi join on l_orderkey with the residual predicate). */
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM graft_sql_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM graft_sql_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Q6: single filtered scan + global agg — the canonical
    * pushdown/pruning probe (predicates reach the parquet scan;
    * ReadSchema is 4 columns). */
  private def q6(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100 AS revenue
        |FROM graft_sql_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin)
  }

  /** Q8: national market share — 7-way star join, share-of-total per
    * year via conditional aggregation. */
  private def q8(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT o_year,
        | floor(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
        |        / sum(volume) * 1000000 + 0.5) / 1000000 AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |        l_extendedprice * (1 - l_discount) AS volume,
        |        n2.n_name AS nation
        |  FROM graft_sql_part JOIN graft_sql_lineitem ON p_partkey = l_partkey
        |   JOIN graft_sql_supplier ON s_suppkey = l_suppkey
        |   JOIN graft_sql_orders ON l_orderkey = o_orderkey
        |   JOIN graft_sql_customer ON o_custkey = c_custkey
        |   JOIN graft_sql_nation n1 ON c_nationkey = n1.n_nationkey
        |   JOIN graft_sql_nation n2 ON s_nationkey = n2.n_nationkey
        |   JOIN graft_sql_region ON n1.n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
        |GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  /** Q9: product-type profit by nation and year. The reference schema
    * has no partsupp.ps_supplycost; cost is proxied as 10% of
    * retailprice per unit, preserving the query shape (LIKE filter on
    * part, 4-way join, two-key group). */
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT nation, o_year, floor(sum(amount) * 100 + 0.5) / 100 AS sum_profit
        |FROM (SELECT n_name AS nation,
        |        CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |        l_extendedprice * (1 - l_discount)
        |          - p_retailprice * l_quantity * 0.1 AS amount
        |  FROM graft_sql_part JOIN graft_sql_lineitem ON p_partkey = l_partkey
        |   JOIN graft_sql_supplier ON s_suppkey = l_suppkey
        |   JOIN graft_sql_orders ON l_orderkey = o_orderkey
        |   JOIN graft_sql_nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin)
  }

  /** Q11: important stock — per-part supply value within one nation,
    * kept only when above a fraction of the nation's total (grouped
    * HAVING vs a global scalar subquery). Supply value is re-derived
    * from lineitem in lieu of partsupp. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT l_partkey AS ps_partkey,
        | floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS value
        |FROM graft_sql_lineitem
        | JOIN graft_sql_supplier ON l_suppkey = s_suppkey
        | JOIN graft_sql_nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY l_partkey
        |HAVING sum(l_extendedprice) > (
        |  SELECT sum(l_extendedprice) * 0.001
        |  FROM graft_sql_lineitem
        |   JOIN graft_sql_supplier ON l_suppkey = s_suppkey
        |   JOIN graft_sql_nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7')
        |ORDER BY value DESC, ps_partkey""".stripMargin)
  }

  /** Q12: shipping-class priority counts. The schema has no
    * l_shipmode/l_commitdate; the class is l_returnflag and "late"
    * means shipped ≥30 days after the order date. */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT l_returnflag AS ship_class,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM graft_sql_orders JOIN graft_sql_lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Q13: customer order-count distribution — null-preserving outer
    * join with an ON-clause filter, then a histogram of counts. */
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM graft_sql_customer LEFT OUTER JOIN graft_sql_orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** Q15: top supplier by quarterly revenue — CTE computed once,
    * compared against its own max via a scalar subquery. */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |   sum(l_extendedprice * (1 - l_discount)) AS rev
        |  FROM graft_sql_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, floor(rev * 100 + 0.5) / 100 AS total_revenue
        |FROM graft_sql_supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE rev = (SELECT max(rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Q16: distinct-supplier counts per part attribute triple, with a
    * NOT IN anti-join excluding flagged suppliers (negative balance
    * standing in for the absent complaint-comment filter). */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM graft_sql_lineitem JOIN graft_sql_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1,4,9,14,19,23,36,45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM graft_sql_supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  /** Q17: small-quantity-order revenue — correlated scalar average per
    * part, decorrelated by Catalyst into an aggregate + equi-join.
    * Quantities are integer-valued doubles, so the per-part average is
    * exact in both engines and the comparison cannot flip. */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        |FROM graft_sql_lineitem JOIN graft_sql_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size < 15
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM graft_sql_lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** Q20: suppliers with meaningful stock of promoted parts — a
    * two-level IN chain over a grouped HAVING on integer-valued
    * quantities (exact in both engines). */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir)
    spark.sql(
      """SELECT s_name, s_acctbal
        |FROM graft_sql_supplier JOIN graft_sql_nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        | AND s_suppkey IN (
        |   SELECT l_suppkey
        |   FROM graft_sql_lineitem JOIN graft_sql_part ON p_partkey = l_partkey
        |   WHERE p_name LIKE 'small%'
        |     AND l_shipdate >= TIMESTAMP '1996-01-01'
        |     AND l_shipdate < TIMESTAMP '1997-01-01'
        |   GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 30)
        |ORDER BY s_name""".stripMargin)
  }

  /** Transitive closure of the event-type transition graph through the
    * SQL-text surface via Spark 4's WITH RECURSIVE — the recursive-CTE
    * capability itself is the point (a reference user writes
    * reachability this way, not as an unrolled driver loop like
    * graph_reachability). The graph is cyclic, so the recursion is
    * DEPTH-BOUNDED (paths ≤ 5 edges ≥ the k-node diameter) with a
    * distinct-dedup outside — the UNION ALL + bound + dedup form runs
    * identically on DuckDB. Recursion operates on the k² metadata edge
    * relation; the event stream is touched once by the lead() window
    * that derives the edges. */
  private def sqlTransitiveClosure(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).createOrReplaceTempView("graft_sql_events")
    // Materialize the k² edge relation ONCE before recursing (round 19,
    // the graph_reachability precedent): Spark's UnionLoop re-evaluates
    // every referenced view on EACH recursive step, so an edges CTE
    // inlined into the recursion re-ran the full lead() window over the
    // event stream per iteration — 6 window shuffles of the corpus for
    // one k²-sized metadata relation (guide §2.4: remove shuffles
    // outright). The recursion itself (the declared WITH RECURSIVE
    // surface) is unchanged and still bottoms out at depth 5.
    spark.sql(
      """SELECT DISTINCT src, dst FROM (
        | SELECT event_type AS src,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS dst
        | FROM graft_sql_events) WHERE dst IS NOT NULL""".stripMargin)
      .localCheckpoint()
      .createOrReplaceTempView("graft_sql_tc_edges")
    spark.sql(
      """WITH RECURSIVE reach(src, dst, depth) AS (
        |  SELECT src, dst, 1 AS depth FROM graft_sql_tc_edges
        |  UNION ALL
        |  SELECT r.src, e.dst, r.depth + 1
        |  FROM reach r JOIN graft_sql_tc_edges e ON r.dst = e.src
        |  WHERE r.depth < 5)
        |SELECT DISTINCT src, dst FROM reach ORDER BY src, dst""".stripMargin)
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sql_transitive_closure", Some(
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |   SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |   FROM events) WHERE dst IS NOT NULL),
        | reach(src, dst, depth) AS (
        |  SELECT src, dst, 1 AS depth FROM edges
        |  UNION ALL
        |  SELECT r.src, e.dst, r.depth + 1
        |  FROM reach r JOIN edges e ON r.dst = e.src
        |  WHERE r.depth < 5)
        |SELECT DISTINCT src, dst FROM reach ORDER BY src, dst""".stripMargin),
      sqlTransitiveClosure),
    QueryDef("sql_q4_priority_late", Some(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), q4),

    QueryDef("sql_q6_forecast_revenue", Some(
      """SELECT floor(sum(l_extendedprice * l_discount) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin), q6),

    QueryDef("sql_q8_market_share", Some(
      """SELECT o_year,
        | floor(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
        |        / sum(volume) * 1000000 + 0.5) / 1000000 AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |        l_extendedprice * (1 - l_discount) AS volume,
        |        n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |   JOIN supplier ON s_suppkey = l_suppkey
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |   JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |   JOIN region ON n1.n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
        |GROUP BY o_year ORDER BY o_year""".stripMargin), q8),

    QueryDef("sql_q9_product_profit", Some(
      """SELECT nation, o_year, floor(sum(amount) * 100 + 0.5) / 100 AS sum_profit
        |FROM (SELECT n_name AS nation,
        |        CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |        l_extendedprice * (1 - l_discount)
        |          - p_retailprice * l_quantity * 0.1 AS amount
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |   JOIN supplier ON s_suppkey = l_suppkey
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin), q9),

    QueryDef("sql_q11_important_stock", Some(
      """SELECT l_partkey AS ps_partkey,
        | floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS value
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY l_partkey
        |HAVING sum(l_extendedprice) > (
        |  SELECT sum(l_extendedprice) * 0.001
        |  FROM lineitem
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7')
        |ORDER BY value DESC, ps_partkey""".stripMargin), q11),

    QueryDef("sql_q12_ship_priority", Some(
      """SELECT l_returnflag AS ship_class,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin), q12),

    QueryDef("sql_q13_order_distribution", Some(
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin), q13),

    QueryDef("sql_q15_top_supplier", Some(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |   sum(l_extendedprice * (1 - l_discount)) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, floor(rev * 100 + 0.5) / 100 AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE rev = (SELECT max(rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin), q15),

    QueryDef("sql_q16_supplier_cnt", Some(
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1,4,9,14,19,23,36,45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin), q16),

    QueryDef("sql_q17_small_qty_revenue", Some(
      """SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size < 15
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin), q17),

    QueryDef("sql_q20_promo_suppliers", Some(
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        | AND s_suppkey IN (
        |   SELECT l_suppkey
        |   FROM lineitem JOIN part ON p_partkey = l_partkey
        |   WHERE p_name LIKE 'small%'
        |     AND l_shipdate >= TIMESTAMP '1996-01-01'
        |     AND l_shipdate < TIMESTAMP '1997-01-01'
        |   GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 30)
        |ORDER BY s_name""".stripMargin), q20)
  )
}
