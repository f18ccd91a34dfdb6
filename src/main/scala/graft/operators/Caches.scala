package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-release discipline for `localCheckpoint`'d frames.
  *
  * `Dataset.unpersist` is a NO-OP on a localCheckpoint'd frame: it
  * only drops CacheManager entries, and a checkpoint's blocks are an
  * RDD-level persist the SQL cache layer never tracks. The blocks ARE
  * reclaimed eventually — the ContextCleaner acts once the RDD object
  * is GC'd — but "eventually" is driver-heap-GC time, and an
  * iterative loop (connected components) or a per-micro-batch
  * pipeline stage can accumulate many node-sized label tables in
  * executor memory before a driver GC happens to run.
  *
  * [[release]] frees the blocks NOW: the checkpointed frame's plan is
  * a [[LogicalRDD]] leaf holding the persisted internal RDD —
  * unpersist THAT. After release the frame is unusable (checkpointing
  * truncated its lineage; there is nothing to recompute from), so
  * callers release only frames they have fully consumed. */
object Caches {

  /** Release the RDD blocks behind a localCheckpoint'd `df`
    * immediately (async delete). Acts only when `df` IS the
    * checkpointed frame — possibly re-columned (Project) or aliased,
    * the shapes `checkpointed.drop(col)` produces — by unwrapping
    * pure column-level nodes and requiring a [[LogicalRDD]] ROOT
    * underneath. A frame merely DERIVED from a checkpoint
    * (filter/join over it) is left alone: collectFirst over the
    * whole plan would unpersist the still-needed INPUT's blocks, and
    * a truncated-lineage input cannot be recomputed (review-caught
    * API hazard). */
  def release(df: DataFrame): Unit = {
    @scala.annotation.tailrec
    def unwrap(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Option[LogicalRDD] = p match {
      case l: LogicalRDD => Some(l)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          // column pruning/renaming only — no computed rows dropped
          => unwrap(pr.child)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
          => unwrap(a.child)
      case _ => None
    }
    unwrap(df.queryExecution.analyzed)
      .foreach(_.rdd.unpersist(blocking = false))
  }
}
