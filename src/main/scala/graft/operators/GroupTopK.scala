package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Exact per-group top-k as a reusable operator — the DataFrame form
  * of [[graft.functions.expressions.BoundedTopK]].
  *
  * Replaces the `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
  * idiom wherever a group's window partition can be corpus-sized (ANN
  * coarse scans rank the whole corpus per query; per-entity top-k
  * over raw events ranks an entity's full history). The window plan
  * shuffles and SORTS every input row just to discard all but k per
  * group; this plan aggregates with bounded per-partition heaps, so
  * the exchange carries at most partitions·groups·k rows and nothing
  * is ever globally sorted. Results are identical — including rank
  * values — PROVIDED the sort key is total (callers append a unique
  * tiebreak column, exactly as the row_number idiom already must for
  * determinism).
  *
  * Output schema: the group columns, then `rankCol` (1-based, ==
  * row_number), then every non-group input column in input order.
  */
object GroupTopK {

  /** Top `k` rows per `groupCols` group under `sortCols` ((column,
    * descending) pairs, compared in order, NULLS FIRST asc / NULLS
    * LAST desc — the window-ORDER-BY defaults). */
  def topK(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[(String, Boolean)], k: Int,
      rankCol: String = "rk"): DataFrame = {
    require(groupCols.nonEmpty, "GroupTopK needs at least one group column")
    require(sortCols.nonEmpty, "GroupTopK needs at least one sort column")
    GraftFunctions.register(df.sparkSession)
    val sortNames = sortCols.map(_._1)
    val rest = df.columns.toSeq
      .filterNot(c => groupCols.contains(c) || sortNames.contains(c))
    // ranking fields FIRST (BoundedTopK binds the ordering by
    // position), payload after; aliases become the struct field names
    // the caller gets back
    val fields = (sortNames ++ rest).map(n => col(n).as(n))
    val spec = sortCols.map { case (_, d) => if (d) "d" else "a" }.mkString
    val g = groupCols.map(col)
    val topk = df
      .groupBy(g: _*)
      .agg(GraftFunctions.boundedTopK(struct(fields: _*), k, spec)
        .as("_topk"))
      .select(g :+ posexplode(col("_topk")).as(Seq("_pos", "_row")): _*)
    val out: Seq[Column] =
      groupCols.map(col) ++
        Seq((col("_pos") + 1).as(rankCol)) ++
        df.columns.toSeq.filterNot(groupCols.contains)
          .map(n => col(s"_row.`$n`").as(n))
    topk.select(out: _*)
  }
}
