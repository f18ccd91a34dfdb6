package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rounding helpers for oracle-compared double metrics.
  *
  * Spark rounds doubles through their shortest decimal representation
  * (BigDecimal.valueOf, HALF_UP) while DuckDB rounds the binary value,
  * so an exact-decimal product like 19570.815 (binary ≈ …814999…)
  * rounds to .82 in Spark and .81 in DuckDB. Adding 1e-9 before
  * rounding puts both engines on the upper side of the boundary for
  * true half-way decimals — valid for the non-negative metrics used in
  * the catalog. The oracle SQL applies the same epsilon.
  */
object Num {
  val Eps = 1e-9
  def r2(c: Column): Column = round(c + lit(Eps), 2)
  def r4(c: Column): Column = round(c + lit(Eps), 4)
  def r6(c: Column): Column = round(c + lit(Eps), 6)
  /** SQL fragment mirror. */
  def sqlR(expr: String, n: Int): String = s"round(($expr) + 1e-9, $n)"
}
