package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Quantiles
import graft.queries.Num._

/** Data-layout planning — the write-side lever that decides read-side
  * scan cost at 100 TB. A parquet/table-format file prunes on per-file
  * min/max ranges; rows sorted on ONE dimension give perfect pruning
  * on that dimension and none on any other. Z-ordering (bit-wise
  * interleaving of the clustering dimensions — the Morton curve, the
  * layout behind OPTIMIZE ZORDER in modern lakehouse formats) spends
  * the ordering budget across dimensions so every interleaved column
  * gets usable file ranges.
  *
  * The query audits exactly that: bucket events on two dimensions
  * (user and value), z-interleave the buckets, carve the corpus into
  * [[ZTiles]] equal files in z order, and report each file's
  * per-dimension min/max — the numbers a scan planner would prune
  * with. The ScalaTest proves the point against a 1-D layout: a
  * value-only box query touches every user-sorted file but only a
  * fraction of the z-ordered ones.
  *
  * Scale shape: the z-key is a per-row integer expression (codegen'd
  * shifts, no UDF); file assignment uses
  * [[graft.operators.Quantiles.tileOverlaps]] — exact ntile semantics
  * from a bounded histogram (≤ 2¹⁶ distinct z values by
  * construction, because both buckets are 8-bit) instead of a global
  * sort through one reducer. Per-file dimension ranges fall out of
  * the histogram FOR FREE: ub/vb are bit-functions of the z value, so
  * de-interleaving the histogram rows inside each tile yields exact
  * min/max without touching data rows again. Everything is integer;
  * the oracle keeps DuckDB's literal `ntile(32)` window, so the hash
  * gate re-proves the rank arithmetic ≡ ntile (same proof shape as
  * q_events_quartiles).
  *
  * Tie semantics: rows sharing a z value may straddle a file edge;
  * which COPIES cross is tie-broken arbitrarily, but since both
  * dimensions are functions of z, per-file ranges and counts are
  * invariant to the choice (the tileOverlaps contract). */
object Layout {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Bits per interleaved dimension: 8+8 → z < 2¹⁶, a histogram
    * bounded forever (the quantized-value license of Quantiles). */
  val ZBits = 8
  /** Output files (ntile buckets) in z order. */
  val ZTiles = 32

  /** user bucket = user_id mod 2⁸; value bucket = value/2 capped at
    * 255 (value spans [0, ~500] — /2 is a power-of-two float divide,
    * exact in IEEE, so the floor is wobble-free cross-engine). */
  private def ubCol: Column = pmod(col("user_id"), lit(256L)).cast("long")
  private def vbCol: Column =
    least(floor(col("value") / 2.0), lit(255L)).cast("long")

  /** Morton interleave: ub on odd bits, vb on even bits. */
  private def zOf(ub: Column, vb: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(ub, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(vb, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** De-interleave dimension d (1 = odd bits → ub, 0 = even → vb). */
  private def unZ(z: Column, odd: Boolean): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(z, 2 * i + (if (odd) 1 else 0))
        .bitwiseAND(lit(1L)), i)
    }.reduce(_ + _)

  private def sqlZ(ub: String, vb: String): String =
    (0 until ZBits).map { i =>
      s"((($ub >> $i) & 1) << ${2 * i + 1}) + ((($vb >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  private def sqlUnZ(z: String, odd: Boolean): String =
    (0 until ZBits).map { i =>
      s"((($z >> ${2 * i + (if (odd) 1 else 0)}) & 1) << $i)"
    }.mkString(" + ")

  /** Per-file layout audit of the z-ordered events table: one row per
    * file with exact row count and per-dimension min/max. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val keyed = t(spark, dir, "events")
      .select(zOf(ubCol, vbCol).as("z"))
    Quantiles.tileOverlaps(keyed, "z", ZTiles)
      .groupBy(col("tile").cast("long").as("file_id"))
      .agg(sum(col("ov")).cast("long").as("n_rows"),
        min(col("v")).as("z_lo"), max(col("v")).as("z_hi"),
        min(unZ(col("v"), odd = true)).as("ub_lo"),
        max(unZ(col("v"), odd = true)).as("ub_hi"),
        min(unZ(col("v"), odd = false)).as("vb_lo"),
        max(unZ(col("v"), odd = false)).as("vb_hi"))
  }

  /** The layout-stats CTE chain + per-file aggregate body, shared by
    * [[zorderLayoutSql]] and [[statsPruneSql]]. */
  private val sqlLayoutStats: String = {
    val ub = "(user_id % 256)"
    val vb = "least(floor(value / 2.0), 255)::BIGINT"
    s"""k AS (SELECT (${sqlZ("ub", "vb")})::BIGINT AS z FROM
           (SELECT $ub AS ub, $vb AS vb FROM events)),
       tl AS (SELECT z, ntile($ZTiles) OVER (ORDER BY z) AS file_id FROM k),
       stats AS (
         SELECT file_id::BIGINT AS file_id, count(*)::BIGINT AS n_rows,
           min(z) AS z_lo, max(z) AS z_hi,
           min(${sqlUnZ("z", odd = true)})::BIGINT AS ub_lo,
           max(${sqlUnZ("z", odd = true)})::BIGINT AS ub_hi,
           min(${sqlUnZ("z", odd = false)})::BIGINT AS vb_lo,
           max(${sqlUnZ("z", odd = false)})::BIGINT AS vb_hi
         FROM tl GROUP BY 1)"""
  }

  val zorderLayoutSql: String =
    s"""WITH $sqlLayoutStats SELECT * FROM stats"""

  /** The box predicate [[statsPrune]] audits: a user-bucket range ×
    * value-bucket range, each ~1/16 of its dimension's domain. */
  val PruneUbLo = 32L
  val PruneUbHi = 47L
  val PruneVbLo = 100L
  val PruneVbHi = 131L

  /** Stats-based file skipping — the READ side of [[zorderLayout]]'s
    * write-side story, the exact decision a lakehouse scan planner
    * makes from footer/manifest ranges: a file survives a box
    * predicate iff its per-dimension [lo, hi] ranges overlap the box.
    * Emits every file's verdict plus its row count, so the result IS
    * the pruning audit: `sum(n_rows) where kept=0` is the IO the
    * layout saved at this selectivity (the companion ScalaTest proves
    * the same box keeps ~all files under a 1-D layout).
    *
    * Scale shape: the stats table is one row per FILE (corpus-size /
    * file-size rows — thousands at 100 TB, never corpus-sized), so
    * the pruning decision is a broadcast-scale computation regardless
    * of data volume; the expensive part (building stats) is the
    * already-histogram-bounded [[zorderLayout]] pass. */
  def statsPrune(spark: SparkSession, dir: String): DataFrame =
    zorderLayout(spark, dir)
      .withColumn("kept",
        (col("ub_hi") >= PruneUbLo && col("ub_lo") <= PruneUbHi &&
          col("vb_hi") >= PruneVbLo && col("vb_lo") <= PruneVbHi)
          .cast("long"))
      .select(col("file_id"), col("kept"), col("n_rows"))

  val statsPruneSql: String =
    s"""WITH $sqlLayoutStats
       SELECT file_id,
         CASE WHEN ub_hi >= $PruneUbLo AND ub_lo <= $PruneUbHi
               AND vb_hi >= $PruneVbLo AND vb_lo <= $PruneVbHi
              THEN 1 ELSE 0 END::BIGINT AS kept,
         n_rows
       FROM stats"""

  /** The row-level z key over raw `events` columns — exposed for the
    * ZorderSpec containment proof. */
  private[queries] def zExprForTest: Column = zOf(ubCol, vbCol)

  val queries: Map[String, Q] = Map(
    "q_zorder_layout" -> (zorderLayout _),
    "q_stats_prune" -> (statsPrune _),
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_layout" -> zorderLayoutSql,
    "q_stats_prune" -> statsPruneSql,
  )
}
