package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Default ceiling on histogram size (distinct values). A million
    * histogram rows still cumsum in milliseconds on one reducer; a
    * CORPUS-sized histogram (someone passed a raw continuous double)
    * must fail loudly instead of silently single-threading — see
    * [[guarded]]. */
  val DefaultMaxBins: Int = 1 << 20

  /** Enforce the bounded-value-domain license at RUNTIME with zero
    * good-case overhead: `bins` (a count over the same full-frame
    * window the quantile math already pays for — no extra exchange,
    * no extra action) guards the value column through `raise_error`,
    * so a caller who hands a raw continuous double gets a loud
    * per-job failure naming the fix (quantize/round first, or raise
    * maxBins) instead of a silently single-partition corpus sort. */
  private def guarded(v: Column, bins: Column, maxBins: Int): Column =
    when(bins > maxBins, raise_error(concat(
      lit("Quantiles: histogram has "), bins.cast("string"),
      lit(s" distinct values > maxBins=$maxBins — the exact-quantile " +
        "license is a BOUNDED value domain (quantize/round the column " +
        "first, e.g. integer cents or r4 scores), or raise maxBins if " +
        "the domain really is bounded"))))
      .otherwise(v)

  /** Exact quantiles of `valueCol` at ranks num/den (e.g. 1/10,
    * 1/2, 9/10). Returns one row per requested quantile:
    * (q_num, q_den, value). Fails loudly if the value domain exceeds
    * `maxBins` distinct values (the bounded-histogram license). */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[(Int, Int)], maxBins: Int = DefaultMaxBins): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach { case (n, d) =>
      require(n > 0 && n <= d, s"quantile $n/$d outside (0, 1]")
    }
    val hist = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("n"))
    val byV = Window.orderBy(col("v"))
    val full = byV.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(
        byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(full))
      .withColumn("v", guarded(col("v"), count(lit(1)).over(full), maxBins))
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

  /** Histogram-row → ntile-tile overlap table: each (partition,
    * value) histogram row, exploded to the tiles its cumulative rank
    * interval [cum−cnt+1, cum] overlaps, with `ov` = how many of its
    * rows land in that tile. Exact ntile semantics without sorting
    * any data row: ntile tile i covers ranks
    * ((i−1)·q + min(i−1, m) + 1) .. (i·q + min(i, m)) where
    * q = N div n, m = N mod n — tile sizes differ by ≤1 and
    * within-value tie-breaks only choose WHICH equal-valued rows
    * cross a tile edge, never which VALUE does, so every per-tile
    * aggregate over (value, weight) is recoverable from this table.
    * Serial step is O(distinct values) per partition (same
    * quantized-value license as [[exactQuantiles]]); the full-data
    * work is one map-side-combined groupBy that shrinks to the
    * histogram. Measured vs the textbook
    * `ntile(n) OVER (PARTITION BY …)` single-reducer-per-partition
    * window: 27.2s vs 119.9s at 100M rows (NOTES.md). */
  def tileOverlaps(df: DataFrame, valueCol: String, n: Int,
      partitionCols: Seq[String] = Nil,
      maxBins: Int = DefaultMaxBins): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val parts = partitionCols.map(col)
    val w = if (parts.isEmpty) Window.orderBy(col("v"))
            else Window.partitionBy(parts: _*).orderBy(col("v"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    df.groupBy(parts :+ col(valueCol).as("v"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(full))
      // per-PARTITION histogram bound — the license is per serial step
      .withColumn("v", guarded(col("v"), count(lit(1)).over(full), maxBins))
      .select(col("*"), explode(expr(s"sequence(1, $n)")).as("tile"))
      .withColumn("rlo", expr(
        s"(tile - 1) * (total div $n) + least(tile - 1, total % $n) + 1"))
      .withColumn("rhi", expr(
        s"tile * (total div $n) + least(tile, total % $n)"))
      .withColumn("ov",
        expr("least(cum, rhi) - greatest(cum - cnt + 1, rlo) + 1"))
      .filter(col("ov") > 0)
  }

  /** Aggregated ntile buckets: one row per (partition, tile) with
    * exact row count and value range — `ntile(n)` + per-tile
    * count/min/max without the per-partition sort
    * (`TimeSeries.eventsQuartiles` is this with n = 4 over events;
    * its DuckDB oracle keeps the literal ntile window, so the hash
    * gate proves the rank arithmetic reproduces ntile exactly). */
  def ntileBuckets(df: DataFrame, valueCol: String, n: Int,
      partitionCols: Seq[String] = Nil,
      maxBins: Int = DefaultMaxBins): DataFrame =
    tileOverlaps(df, valueCol, n, partitionCols, maxBins)
      .groupBy(partitionCols.map(col) :+ col("tile"): _*)
      .agg(sum(col("ov")).cast("long").as("n_rows"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))

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
