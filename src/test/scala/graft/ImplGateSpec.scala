package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The Scala-side half of the registration gate (round 7; closes the
  * scope gap OracleGateSpec documents): every oracle-checked query's
  * gate entry records `impl_sha256` — sha256 of the normalized
  * ANALYZED plan of the Spark-side fn at the canonical SF, stamped by
  * `graft.Verify` → `tools/check_oracle.py` on each recorded pass.
  * This suite recomputes the hash from the CURRENT code and fails on
  * mismatch: a QueryDef fn (or shared helper) was edited without
  * re-running the local gate replica, which previously left `sbt
  * test` green with an unverified implementation.
  *
  * The hash is plan-shape only (expr ids, paths, parallelism-derived
  * widths normalized away — see PlanShapes.implHash), so it is stable
  * across sessions and sweep SFs, and changes exactly when the
  * declared computation changes.
  */
class ImplGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val implLog: Map[String, String] = {
    val path = Paths.get("tools/gate_log.json")
    assert(Files.exists(path), "tools/gate_log.json missing — run the local gate replica")
    (for {
      JObject(entries) <- JsonMethods.parse(Files.readString(path))
      (name, JObject(fields)) <- entries
      ("impl_sha256", JString(sha)) <- fields
    } yield name -> sha).toMap
  }

  SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
    test(s"impl[$name] matches its last gate-verified Spark-side plan") {
      assume(Files.isDirectory(Paths.get(PlanShapes.CanonicalSf)),
        s"canonical testdata dir ${PlanShapes.CanonicalSf} not present")
      implLog.get(name) match {
        case None =>
          fail(s"$name has no recorded impl fingerprint — re-run the gate " +
            "replica for it: sbt \"runMain graft.Verify " +
            s"""/root/testdata/sf0.01 /tmp/graft_verify $name" """ +
            "&& python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify")
        case Some(recorded) =>
          assert(recorded == PlanShapes.implHash(spark, name),
            s"$name's Spark-side plan changed since its last recorded gate " +
              "pass — re-run Verify + tools/check_oracle.py for it (any SF)")
      }
    }
  }
}
