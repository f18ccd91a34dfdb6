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
    * Delivery semantics: EXACTLY-ONCE-EFFECTIVE. foreachBatch with a
    * checkpoint re-runs a batch after a mid-batch crash and a parquet
    * append is not transactional, so the sink routes through
    * [[Similarity.appendToIvfIndexIdempotent]]: vec_ids already in
    * the index dedup away before the write (a partition- and
    * column-pruned probe of only the touched clusters), so a replayed
    * or double-delivered micro-batch appends nothing the second time
    * — the replay spec feeds the same batch twice and asserts the
    * index files unchanged. Callers attach
    * `.option("checkpointLocation", …)` and a trigger. */
  def ivfIngestStream(vecStream: DataFrame, indexPath: String,
      numCentroids: Int = Similarity.NumCentroids): DataStreamWriter[Row] =
    vecStream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        Similarity.appendToIvfIndexIdempotent(batch.sparkSession,
          indexPath, batch, numCentroids)
    }

  /** Continuously-maintained Gram/covariance state over a vector
    * stream (`v: array<double>` column): the same native
    * [[graft.functions.expressions.VectorGram]] aggregate as the
    * batch [[graft.queries.Spectral]] tier, run as a streaming
    * aggregation — Structured Streaming persists the O(d²) aggregate
    * BUFFER in the state store between micro-batches and folds each
    * batch in through the aggregate's own merge, so the drift/whiten
    * statistics stay current without ever rescanning the corpus.
    * State is one 2 081-double buffer total (a single global group);
    * callers run `outputMode("complete")` (or "update") and read
    * `(n, sums, prods)`.
    *
    * This is also the serialize/merge proof for the aggregate: the
    * streaming state path exercises exactly the code the map-side
    * combine uses. Fold ORDER differs between the streaming and batch
    * plans, so double sums agree only to accumulation error; the
    * companion spec pins exact stream == batch equality on
    * integer-valued vectors, where every fold order is exact. */
  def gramStream(vecStream: DataFrame, dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecStream.sparkSession)
    import org.apache.spark.sql.functions.col
    vecStream
      .select(col("v").cast("array<double>").as("v"))
      .agg(graft.functions.GraftFunctions.vectorGram(col("v"), dim)
        .as("g"))
      .select(col("g.n").as("n"), col("g.sums").as("sums"),
        col("g.prods").as("prods"))
  }

  /** Continuously-maintained per-file bloom filters over a keyed
    * ingest stream (`fid: bigint, h: bigint` rows — the file id and
    * the key's non-negative hash): the same
    * [[graft.functions.expressions.BloomOrAgg]] as the batch
    * [[graft.queries.Layout.bloomPrune]] build, run as a streaming
    * aggregation so the skip-index stays current as files receive
    * rows. Unlike the gram twin, stream == batch here is BIT-EXACT on
    * ANY input: bloom bits merge by OR, which is order- and
    * duplication-insensitive — replayed micro-batches (at-least-once
    * sources) cannot corrupt the filter, only re-set already-set
    * bits. State is `words` longs per live file id. */
  def bloomStream(keyed: DataFrame, words: Int, bitsPerWord: Int,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(keyed.sparkSession)
    import org.apache.spark.sql.functions.col
    keyed
      .groupBy(col("fid"))
      .agg(graft.functions.GraftFunctions
        .bloomOrAgg(col("h"), words, bitsPerWord, k).as("warr"))
  }
}
