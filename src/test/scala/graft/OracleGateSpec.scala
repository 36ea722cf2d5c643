package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The registration-time correctness gate: every query registered in
  * `SparkEntry.oracleSql` must have a recorded PASS from the local
  * gate replica (`graft.Verify` + `tools/check_oracle.py`) for its
  * EXACT current oracle SQL. `check_oracle.py` appends each PASS to
  * the checked-in `tools/gate_log.json` keyed by query name with a
  * sha256 of the SQL text, and evicts entries on FAIL — so a freshly
  * registered query that was never gate-checked, an edited oracle
  * that wasn't re-checked, and a red row all fail `sbt test` instead
  * of surviving to the driver's round compare (the process hole that
  * let two red rows persist across rounds 4–5).
  */
class OracleGateSpec extends AnyFunSuite {

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val gateLog: Map[String, String] = {
    val path = Paths.get("tools/gate_log.json")
    assert(Files.exists(path),
      "tools/gate_log.json missing — run the local gate: " +
        "sbt \"runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify\" " +
        "&& python3 tools/check_oracle.py")
    (for {
      JObject(entries) <- JsonMethods.parse(Files.readString(path))
      (name, JObject(fields)) <- entries
      ("oracle_sha256", JString(sha)) <- fields
    } yield name -> sha).toMap
  }

  SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
    test(s"gate[$name] has a recorded local-gate pass for its current oracle SQL") {
      gateLog.get(name) match {
        case None =>
          fail(s"$name is registered with an oracle but has no recorded " +
            "local-gate pass. Run: sbt \"runMain graft.Verify " +
            s"""/root/testdata/sf0.01 /tmp/graft_verify $name" """ +
            "&& python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify")
        case Some(recorded) =>
          assert(recorded == sha256(sql),
            s"$name's oracle SQL changed since its last recorded gate pass — " +
              "re-run Verify + tools/check_oracle.py for it")
      }
    }
  }

  test("gate log carries no entries for unregistered queries") {
    val stale = gateLog.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty,
      s"stale gate_log.json entries (query renamed/removed?): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
