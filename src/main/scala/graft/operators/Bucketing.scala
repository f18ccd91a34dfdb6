package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located (shuffle-free) repeated
  * joins — the 100 TB answer to "this join runs every day on the
  * same key": pay the shuffle ONCE at write time (`bucketBy` on the
  * join key), then every subsequent equi-join or aggregation on that
  * key is exchange-free because both sides share the same hash
  * partitioning on disk.
  *
  * Uses the session catalog's managed tables (parquet + bucket
  * metadata); no Hive required. Verified by BucketingSpec: the join
  * of two co-bucketed tables contains no Exchange in the physical
  * plan.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwrite). Sorting
    * within buckets makes merge-join possible without a sort step. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key. When both
    * tables were written with the same `numBuckets` on `key`, the
    * plan has no shuffle on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), Seq(key), joinType)

  /** True if the executed plan contains no SHUFFLE exchange (hash or
    * range repartitioning) — the co-location check callers assert
    * after planning. Broadcast exchanges don't count: they move the
    * small side, not the data. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning")
  }
}
