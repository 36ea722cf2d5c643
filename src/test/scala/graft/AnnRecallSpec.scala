package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** ANN recall drift tripwire: re-measures recall@3 at the SAME SF the
  * committed ANN_RECALL.json artifact records, and fails on a
  * >10-point drop for any variant. Raw uniform-random fixtures make
  * absolute recall low by nature (see CLAUDE.md / InvariantSpec's
  * planted-fixture contracts for the quality guarantees); what this
  * guards is a silent regression in the candidate generation — a
  * hyperplane/codebook/banding change that quietly halves recall would
  * pass the sanity floors but not this. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("measured ANN recall does not drop >10 points vs the committed artifact") {
    val f = new java.io.File("ANN_RECALL.json")
    assert(f.exists(), "ANN_RECALL.json missing — run `runMain graft.AnnRecall` and commit it")
    val root = JsonMethods.parse(java.nio.file.Files.readString(f.toPath))
    val JString(sfDir) = (root \ "sf_dir"): @unchecked
    assert(new java.io.File(sfDir).isDirectory, s"artifact sf dir $sfDir not present")
    val measured = AnnRecall.measure(spark, sfDir)
    AnnRecall.Variants.foreach { v =>
      val committed = (root \ "variants" \ v \ "recall") match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case other => fail(s"bad committed recall for $v: $other")
      }
      val now = measured(v)._1
      assert(now >= committed - 0.10,
        s"$v recall dropped ${committed} -> ${now} (more than 10 points); " +
          "if intentional, regenerate ANN_RECALL.json and note why in the commit")
    }
  }
}
