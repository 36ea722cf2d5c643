package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered operator runs end-to-end at sf0.001 (the driver's
  * t1 smoke scale) without throwing; spot-checks pin known counts. */
class OperatorSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, TestSpark.sf).count()
      assert(n >= 0)
    }
  }

  test("entry (flagship) returns the 6 pricing-summary groups") {
    assert(SparkEntry.entry(spark).count() == 6)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("join_cross is |region|^2") {
    assert(SparkEntry.queries("join_cross")(spark, TestSpark.sf).count() == 25)
  }

  test("scan_json round-trips all regions") {
    assert(SparkEntry.queries("scan_json")(spark, TestSpark.sf).count() == 5)
  }
}
