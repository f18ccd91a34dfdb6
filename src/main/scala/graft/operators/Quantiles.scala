package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over a QUANTIZED value column — the
  * scale path between `percentile_approx` (no exactness) and a global
  * sort / ntile window (single-reducer trap).
  *
  * The trick (also inlined in `Curation.qualityThreshold`): when the
  * value column is quantized — a rounded score, an integer bucket, a
  * bounded enum — the full distribution fits a histogram whose size
  * is the number of DISTINCT VALUES, not the corpus size. The plan is
  * one map-side-combined `groupBy(value).count()` (the only full-data
  * shuffle, and it shrinks to the histogram immediately) plus a
  * cumulative sum over the bounded histogram; the serial step is
  * O(distinct values) regardless of row count. A 4-decimal score in
  * [0,1] bounds the histogram at 10⁴ rows forever.
  *
  * Quantile definition: the q-quantile is the smallest value whose
  * cumulative count reaches ceil(q·N) — the discrete ("lower")
  * quantile, computed with integer rank arithmetic so there is no
  * float boundary to disagree on (q is taken as a rational
  * num/den). Matches `ORDER BY v LIMIT 1 OFFSET ceil(q*N)-1`.
  */
object Quantiles {

  /** Exact quantiles of `valueCol` at ranks num/den (e.g. 1/10,
    * 1/2, 9/10). Returns one row per requested quantile:
    * (q_num, q_den, value). */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach { case (n, d) =>
      require(n > 0 && n <= d, s"quantile $n/$d outside (0, 1]")
    }
    val hist = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("n"))
    val byV = Window.orderBy(col("v"))
    val cum = hist
      .withColumn("cum", sum(col("n")).over(
        byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(
        byV.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // ceil(q·N) in integer math: (N·num + den − 1) div den. ALL
    // quantiles resolve in ONE pass over the histogram — a branch per
    // quantile would re-aggregate the full input per q (a 5-quantile
    // request cost 5 scans before this); a conditional min per q over
    // the shared cumsum costs one.
    val aggCols = qs.map { case (num, den) =>
      min(when(col("cum") >=
          expr(s"(total * $num + ${den - 1}) div $den"), col("v")))
        .as(s"v_${num}_$den")
    }
    val one = cum.agg(aggCols.head, aggCols.tail: _*)
    val stackExpr = s"stack(${qs.length}, " + qs.map { case (n, d) =>
      s"$n, $d, v_${n}_$d"
    }.mkString(", ") + ") as (q_num, q_den, value)"
    one.select(expr(stackExpr))
  }

  /** The threshold form: keep-mass audit against the q-quantile —
    * rows at/above the quantile value of `valueCol`, counted per
    * `groupCol`. (`Curation.qualityThreshold` is this shape with
    * q = 1/10 over the r4-rounded quality score.) */
  def keepAboveQuantile(df: DataFrame, valueCol: String,
      groupCol: String, num: Int, den: Int): DataFrame = {
    val thr = exactQuantiles(df, valueCol, Seq((num, den)))
      .select(col("value").as("threshold"))
    df.crossJoin(broadcast(thr))
      .groupBy(col(groupCol), col("threshold"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col(valueCol) >= col("threshold"), 1L).otherwise(0L))
          .as("n_kept"))
  }
}
