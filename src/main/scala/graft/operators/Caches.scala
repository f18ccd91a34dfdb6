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
    * immediately (async delete). Safe no-op on frames that are not
    * checkpoint-backed. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
