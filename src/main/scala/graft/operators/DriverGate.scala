package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared row-count gate for driver-local fast paths (union-find,
  * local PageRank/triangle loops). Same license class as a broadcast
  * threshold: below the gate, driver-local iteration beats several
  * Spark rounds of job overhead; above it, only the distributed
  * shape scales — and real 100 TB graphs blow straight past any sane
  * gate, so the distributed path self-selects. */
object DriverGate {

  /** True when `df` has at most `maxRows` rows, established by a
    * CAPPED count — scanning stops the moment the gate is exceeded
    * instead of counting the full frame. `limit()` takes an Int, so
    * gates above Int.MaxValue must clamp: a raw `.toInt` would wrap
    * negative, make the capped count trivially pass, and let the
    * caller collect an unbounded frame onto the driver. */
  def fitsOnDriver(df: DataFrame, maxRows: Long): Boolean = {
    val cap = math.min(math.max(maxRows, 0L), Int.MaxValue - 1L).toInt
    df.limit(cap + 1).count() <= maxRows
  }
}
