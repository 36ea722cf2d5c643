package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine deterministic rounding.
  *
  * Spark's `round()` and DuckDB's `round()` break `.5` ties on doubles
  * differently (observed: 184927.545 → 184927.54 vs 184927.55), so
  * oracle-checked queries use `floor(x·10ᵈ + 0.5) / 10ᵈ` instead — pure
  * IEEE double ops (mul, add, floor, div), each exactly rounded, hence
  * bitwise-identical across engines. The oracle SQL mirrors the same
  * formula textually: `floor((x) * 100 + 0.5) / 100`.
  */
object Parity {
  private def r(c: Column, p: Long): Column = floor(c * p + lit(0.5)) / p
  def r1(c: Column): Column = r(c, 10L)
  def r2(c: Column): Column = r(c, 100L)
  def r3(c: Column): Column = r(c, 1000L)
  def r4(c: Column): Column = r(c, 10000L)
  def r6(c: Column): Column = r(c, 1000000L)
  def r8(c: Column): Column = r(c, 100000000L)

  /** Wrapping-mod-2⁶⁴ oracle recipe (round 12): DuckDB's BIGINT
    * arithmetic is overflow-CHECKED, so it cannot replay Spark's
    * natural Long-wrap polynomial hashes directly — but HUGEINT
    * (INT128) can hold every partial product (byte·2⁶⁴ < 2⁷², ≤16
    * terms < 2⁷⁶), after which ONE `% 18446744073709551616` recovers
    * the exact unsigned mod-2⁶⁴ value and
    * `CASE WHEN x >= 2⁶³ THEN x - 2⁶⁴ ELSE x END` re-signs it. The
    * wrapped power-of-base coefficients are precomputed HERE with the
    * very Long overflow being emulated and rendered as unsigned
    * decimal literals, so the oracle never performs a wrapping
    * multiply itself. Opens full oracles for the RollingHash byte
    * -window family (dedup_rolling_chunks, mm_simhash,
    * mm_simhash_pairs). */
  def wrappedPowers(base: Long, window: Int): Seq[String] = {
    val arr = new Array[Long](window)
    arr(window - 1) = 1L
    var i = window - 2
    while (i >= 0) { arr(i) = arr(i + 1) * base; i -= 1 }
    arr.toIndexedSeq.map(java.lang.Long.toUnsignedString)
  }

  /** The unsigned-HUGEINT window-hash CTE term for byte `j` (0-based)
    * of a window starting at 1-based byte `t.i` of hex-encoded column
    * `hx`: the '0x' cast idiom reads one byte, HUGEINT-widens, and
    * scales by the wrapped coefficient. */
  def hashTerm(hx: String, j: Int, coeff: String): String =
    s"CAST(CAST(('0x' || substr($hx, (t.i + $j - 1) * 2 + 1, 2)) AS BIGINT) AS HUGEINT) * $coeff"
}
