package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.onnx.{Onnx, OnnxModel}

/** Neural reranking of a retrieval candidate list — the second stage
  * of the modern two-stage retrieval stack (BM25/ANN recall → a
  * cross-encoder scores each (query, document) pair JOINTLY; Nogueira
  * & Cho 1901.04085). The reference has no retrieval stack at all;
  * this completes the engine's BM25 / ANN family with the precision
  * stage those feed in production.
  *
  * Execution contract (the [[OnnxScoreFilter]] discipline):
  *  - one parsed session per executor ([[OnnxModel.forPath]] JVM
  *    cache), reused across tasks and batches;
  *  - per partition, rows batch `batchSize` at a time and the whole
  *    batch runs as ONE [N, 2·maxTokens] id tensor — the GPU
  *    batching boundary a real cross-encoder needs (unlike the
  *    bi-encoder towers, NOTHING is precomputable per side: the
  *    pair is the model input, which is exactly why rerankers only
  *    ever see the top-k, not the corpus);
  *  - null/empty text scores null without disturbing neighbors.
  *
  * Scale shape: candidates are a per-query TOP-K frame (TakeOrdered
  * output, k ≈ 10²–10³), so the expensive joint forward touches
  * k·|queries| rows regardless of corpus size. Reranking the corpus
  * itself is the anti-pattern this operator's input contract rules
  * out — recall stages exist precisely to bound this input.
  *
  * `modelPath = None` falls back to a deterministic stand-in head:
  * query–document token Jaccard overlap — same schema, no file
  * needed (the [[OnnxScoreFilter]] stand-in pattern). The input ids
  * are [query tokens | document tokens] in fixed halves, so a
  * trained cross-encoder drops in as an `.onnx` with input
  * [N, 2·maxTokens] ids → output [N, 1]. */
object OnnxRerank {

  val VocabSize = 1024
  val MaxTokens = 16

  /** Score every candidate row's `textCol` against the fixed `query`,
    * appending `rerank_score`. All input columns pass through. */
  def rerank(candidates: DataFrame, textCol: String, query: String,
      modelPath: Option[String] = None,
      vocabSize: Int = VocabSize, maxTokens: Int = MaxTokens,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(candidates.schema.fields :+
      StructField("rerank_score", DoubleType, nullable = true))
    val textIdx = candidates.schema.fieldIndex(textCol)
    val hadoopConf = SerializableHadoopConf.capture()
    val qIds = Towers.tokenIds(query, vocabSize, maxTokens)
    candidates.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map { r =>
          if (r.isNullAt(textIdx)) None
          else Option(r.getString(textIdx)).filter(_.nonEmpty)
        }
        val present = texts.flatten
        val scores: Seq[Double] = modelPath match {
          case Some(path) if present.nonEmpty =>
            val ids = new Array[Float](present.length * 2 * maxTokens)
            present.zipWithIndex.foreach { case (t, i) =>
              System.arraycopy(qIds, 0, ids, i * 2 * maxTokens, maxTokens)
              System.arraycopy(Towers.tokenIds(t, vocabSize, maxTokens), 0,
                ids, i * 2 * maxTokens + maxTokens, maxTokens)
            }
            OnnxHeads.scores(OnnxModel.forPath(path, hadoopConf.get()),
              Onnx.Tensor(Seq(present.length, 2 * maxTokens), ids), 0)
          case Some(_) => Nil
          case None => present.map(standinHead(query, _))
        }
        val si = scores.iterator
        batch.zip(texts).map { case (r, t) =>
          Row.fromSeq(r.toSeq :+
            (if (t.isDefined) Double.box(si.next()) else null))
        }
      }
    }(Encoders.row(schema))
  }

  /** No-model fallback: token-set Jaccard between query and document
    * — a real (if shallow) relevance signal, deterministic, and the
    * schema twin of a trained head. */
  private[operators] def standinHead(query: String, text: String): Double = {
    def toks(s: String) =
      s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val (q, d) = (toks(query), toks(text))
    if (q.isEmpty || d.isEmpty) 0.0
    else q.intersect(d).size.toDouble / q.union(d).size
  }
}
