package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Global 1-based row_number over a TOTAL order without a
  * single-reducer window.
  *
  * `row_number() OVER (ORDER BY …)` plans as one unpartitioned Window
  * — every row funnels through ONE task, the classic 100 TB
  * scale-killer. This operator computes the identical ranks with the
  * two-pass prefix-offset algorithm: range-repartition on the sort
  * key (so partition p's rows all sort before partition p+1's), sort
  * within partitions, count each partition (one long per partition to
  * the driver — bounded by partition count, not data), then stream
  * each partition once more adding `offset(p) + local index`. The
  * count job + map job pair is exactly Spark's own
  * `RDD.zipWithIndex` discipline, which this delegates to; the sorted
  * frame is persisted so the second pass re-reads instead of
  * re-sorting.
  *
  * The caller's sort key MUST be total (append a unique tiebreak);
  * with ties the ranks would depend on intra-partition order. The
  * range partitioner's sampled boundaries affect only WHERE partition
  * edges fall, never the rank values — any boundary choice yields the
  * same total order.
  */
object GlobalRank {

  def rank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "ord"): DataFrame = {
    require(sortCols.nonEmpty, "GlobalRank needs at least one sort column")
    require(!df.columns.contains(rankCol),
      s"GlobalRank: column '$rankCol' already exists")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(
      StructField(rankCol, LongType, nullable = false))
    // persist at the RDD level, not Dataset.persist: the cache is
    // consumed twice (zipWithIndex's count job + map job), but a
    // CacheManager entry would pin the blocks for the session's
    // lifetime. A plain RDD persist is tracked by the ContextCleaner —
    // once the returned frame (and its lineage) is unreferenced, the
    // blocks are reclaimed automatically, so long-lived sessions
    // don't accumulate one cached sort per rank() call.
    val cached = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = cached.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
