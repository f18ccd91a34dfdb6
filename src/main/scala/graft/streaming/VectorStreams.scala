package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.queries.Similarity

/** Streaming vector-index maintenance — the ingest half of the ANN
  * story run continuously (a training-data pipeline's embedding feed:
  * encoders emit vectors as documents arrive, and the search index
  * must absorb them without a rebuild).
  *
  * Reference scope note: the reference has no vector indexing at all;
  * this is a 100 TB extension (see SURVEY.md) pairing with the batch
  * [[Similarity.appendToIvfIndex]] path.
  */
object VectorStreams {

  /** Per micro-batch [[Similarity.appendToIvfIndex]] over a stream of
    * `(vec_id, v: array<double>)` rows: each batch assigns against the
    * index's OWN centroid rows (broadcast, [[Similarity.NumCentroids]]
    * rows at any index size) and dynamic-partition-appends into the
    * materialized cluster-partitioned layout — only the clusters that
    * received vectors are touched, the existing postings are never
    * rewritten, and the per-batch cost is O(batch), independent of
    * index size. The centroid-id-range guard fails the QUERY loudly on
    * a batch whose ids collide with centroid rows (a data error that
    * would corrupt future assignments must stop the stream, not
    * poison the index).
    *
    * Delivery semantics: foreachBatch with a checkpoint re-runs a
    * batch after a mid-batch crash, and a parquet append is not
    * transactional — so ingest is AT-LEAST-ONCE under crash replay.
    * vec_ids are stable, so readers get exactly-once semantics by
    * deduping on vec_id (or compact duplicates offline); this is the
    * standard discipline for non-transactional foreachBatch sinks.
    * Callers attach `.option("checkpointLocation", …)` and a trigger. */
  def ivfIngestStream(vecStream: DataFrame, indexPath: String,
      numCentroids: Int = Similarity.NumCentroids): DataStreamWriter[Row] =
    vecStream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        Similarity.appendToIvfIndex(batch.sparkSession, indexPath,
          batch, numCentroids)
    }
}
