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
}
