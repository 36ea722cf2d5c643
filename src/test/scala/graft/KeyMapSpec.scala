package graft

import graft.etl.KeyMap
import org.scalatest.funsuite.AnyFunSuite

/** The reference's doc-test assertions
  * (`/root/reference/src/keymap.rs:24-35,153-170`): keys {0,1,3} → next
  * free key is 2; after inserting at 2 the next is 4; existing values
  * keep their keys. */
class KeyMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base: KeyMap = KeyMap.fromDim(
    Seq((0L, "zero"), (1L, "one"), (3L, "three")).toDF("k", "v"), "k", "v")

  test("lowest free key fills the gap (mex = 2)") {
    assert(base.lowestFreeKey() == 2L)
  }

  test("transact assigns mex to a new value, then next free is 4") {
    val km = base.transact(Seq("two").toDF("value"))
    assert(km.lookupKey("two").contains(2L))
    assert(km.lowestFreeKey() == 4L)
  }

  test("transact returns the existing key for a known value") {
    val km = base.transact(Seq("zero").toDF("value"))
    assert(km.lookupKey("zero").contains(0L))
    assert(km.dim.count() == 3)
  }

  test("batch transact fills gaps in value order then extends past max") {
    // novel values sorted: alpha, beta → slots 2 (gap), 4 (past max 3)
    val km = base.transact(Seq("alpha", "beta", "one").toDF("value"))
    assert(km.lookupKey("alpha").contains(2L))
    assert(km.lookupKey("beta").contains(4L))
    assert(km.lookupKey("one").contains(1L))
    assert(km.dim.count() == 5)
  }

  test("empty keymap starts at 0") {
    val km = KeyMap.empty(spark).transact(Seq("a", "b").toDF("value"))
    assert(km.lookupKey("a").contains(0L))
    assert(km.lookupKey("b").contains(1L))
  }

  test("lookup broadcasts the dim onto facts") {
    val facts = Seq("zero", "three", "zero").toDF("name")
    val joined = base.lookup(facts, "name")
    assert(joined.count() == 3)
    assert(joined.filter("key = 0").count() == 2)
  }
}
