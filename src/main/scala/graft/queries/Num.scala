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
  *
  * Signed zero: DuckDB rounds a tiny negative (e.g. a mean of
  * −1.4e-9, + the 1e-9 epsilon) to **−0.0**, while Spark's
  * BigDecimal path cannot represent a signed zero and yields +0.0.
  * The driver's comparator sorts rows by the STRING form of each
  * value, so a single `-0.0` misaligns the whole sorted row list
  * against the Spark result (observed: q_pq_train at sf0.001, 515
  * spuriously "differing" rows from one register). The SQL mirror
  * therefore adds `+ 0.0` AFTER the round — the IEEE no-op that
  * folds −0.0 into +0.0 and changes nothing else.
  */
object Num {
  val Eps = 1e-9
  def r2(c: Column): Column = round(c + lit(Eps), 2)
  def r4(c: Column): Column = round(c + lit(Eps), 4)
  def r6(c: Column): Column = round(c + lit(Eps), 6)
  /** SQL fragment mirror ( + 0.0 folds DuckDB's −0.0; see above). */
  def sqlR(expr: String, n: Int): String =
    s"(round(($expr) + 1e-9, $n) + 0.0)"
}
