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
    require(!df.columns.contains(rankCol),
      s"GroupTopK: rank column '$rankCol' already exists in the input")
    // internal scratch names must not shadow input columns (a column
    // literally named _topk/_pos/_row would otherwise yield ambiguous
    // output) — uniquify against the input schema
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_")
        .find(n => !df.columns.contains(n)).get
    val (cTopk, cPos, cRow) = (fresh("_topk"), fresh("_pos"), fresh("_row"))
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
        .as(cTopk))
      .select(g :+ posexplode(col(cTopk)).as(Seq(cPos, cRow)): _*)
    val out: Seq[Column] =
      groupCols.map(col) ++
        Seq((col(cPos) + 1).as(rankCol)) ++
        df.columns.toSeq.filterNot(groupCols.contains)
          .map(n => col(s"`$cRow`.`$n`").as(n))
    topk.select(out: _*)
  }
}
