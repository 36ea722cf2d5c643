package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint the oracle contract without DuckDB: the driver's compare sorts
  * columns by name before hashing, so a Spark output column missing
  * from the oracle SQL text (alias drift) silently fails the round.
  * This catches it at test time. */
class OracleLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
    test(s"oracle[$name] mentions every Spark output column") {
      val cols = SparkEntry.queries(name)(spark, TestSpark.sf).schema.fieldNames
      val sqlLower = sql.toLowerCase
      cols.foreach { c =>
        assert(sqlLower.contains(c.toLowerCase),
          s"column '$c' not found in oracle SQL for $name")
      }
    }
  }

  test("every query name is snake_case and unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), s"bad name: $n"))
  }

  test("no oracle SQL uses round() — .5 ties differ cross-engine (Parity rule)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.toLowerCase.matches("(?s).*\\bround\\s*\\(.*"),
        s"oracle[$name] uses round(); use floor(x*10^d + 0.5)/10^d instead")
    }
  }

  test("no oracle SQL uses Spark-only hash functions") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val l = sql.toLowerCase
      assert(!l.contains("xxhash64") && !l.matches("(?s).*\\bhash\\s*\\(.*"),
        s"oracle[$name] uses an engine-native hash; md5 is the only cross-engine hash")
    }
  }
}
