package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.{MaterializedAgg, TableLog}

/** Streaming ingest into a [[TableLog]] versioned table —
  * EXACTLY-ONCE by the manifest's own atomicity, not by reader-side
  * dedup: each micro-batch appends through [[TableLog.appendOnce]]
  * stamped `appId#batchId`, so a crash-replayed batch (foreachBatch
  * re-runs with the SAME batch id) finds its stamp in the log and
  * no-ops, while a crash between the data write and the commit
  * leaves orphan files and NO version (the manifest is the commit
  * point). This is the txn-marker discipline real table formats use
  * for their streaming sinks.
  *
  * `appId` names THIS ingest pipeline (stable across restarts —
  * batch ids only mean anything per checkpoint); two different
  * pipelines appending the same table use different appIds and never
  * collide. Callers attach `.option("checkpointLocation", …)` and a
  * trigger.
  */
object TableStreams {

  /** `checkpointEvery`: a manifest CHECKPOINT lands after every N
    * committed versions, so a long-running ingest table's replay cost
    * stays bounded at ~N instead of growing with the stream's age
    * (the sink would otherwise accrue a manifest per micro-batch
    * forever). Checkpointing is idempotent metadata — re-running it
    * on a replayed batch is harmless. */
  def tableAppendStream(rows: DataFrame, dir: String,
      appId: String, checkpointEvery: Int = 16): DataStreamWriter[Row] = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      TableLog.appendOnce(spark, dir, batch, appId, batchId)
      if (TableLog.currentVersion(spark, dir) % checkpointEvery == 0)
        TableLog.checkpoint(spark, dir)
    }
  }

  /** Streaming ingest that ALSO keeps a materialized aggregate view
    * current — per micro-batch: exactly-once append (txn
    * `appId#batchId`), then exactly-once view maintenance
    * ([[MaterializedAgg.maintain]], stamped with the SOURCE version
    * in the view's own log). The two stamps compose across every
    * crash window: a replayed batch finds its append stamp and
    * no-ops; a crash BETWEEN the append and the maintain leaves the
    * view one version behind, and the replay's maintain catches it
    * up from the change feed — both table and view land byte-
    * identical to the crash-free run. `key` must be unique across
    * the table (the tier's MERGE contract — the change-feed join
    * depends on it once compaction interleaves). */
  def tableAppendWithViewStream(rows: DataFrame, dir: String,
      appId: String, viewDir: String, key: String, dims: Seq[String],
      measures: Seq[String],
      checkpointEvery: Int = 16): DataStreamWriter[Row] = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      TableLog.appendOnce(spark, dir, batch, appId, batchId)
      if (TableLog.currentVersion(spark, dir) % checkpointEvery == 0)
        TableLog.checkpoint(spark, dir)
      MaterializedAgg.maintain(spark, dir, key, viewDir, dims, measures)
      ()
    }
  }
}
