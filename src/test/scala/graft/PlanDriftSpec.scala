package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Headline plan-shape regression guard (see PlanShapes scaladoc):
  * red whenever any bench-headline query's normalized physical plan
  * differs from the committed fingerprint. An INTENTIONAL plan change
  * must regenerate tools/plan_shapes.json (`runMain graft.PlanShapes`)
  * and note the why in PLANS.md in the same commit — a silent
  * strategy flip (lost broadcast, new exchange, window sneaking in)
  * fails here before any benchmark moves. */
class PlanDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("headline physical plan shapes match the committed fingerprints") {
    val f = new java.io.File(PlanShapes.ArtifactPath)
    assert(f.exists(), s"${PlanShapes.ArtifactPath} missing — run `runMain graft.PlanShapes`")
    val committed = JsonMethods.parse(java.nio.file.Files.readString(f.toPath)) match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case other => fail(s"bad artifact: $other")
    }
    val diffs = Bench.headline.toSeq.sorted.flatMap { q =>
      val h = PlanShapes.shapeHash(spark, TestSpark.sf, q)
      committed.get(q) match {
        case Some(c) if c == h => None
        case Some(_) => Some(s"$q: plan shape changed")
        case None => Some(s"$q: no committed fingerprint")
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} headline plan(s) drifted: ${diffs.mkString("; ")}\n" +
        "If intentional: sbt \"runMain graft.PlanShapes\", explain the change in PLANS.md, commit both.")
  }
}
