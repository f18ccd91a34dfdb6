package graft.operators

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.onnx.{Onnx, OnnxModel, TestOnnx}

/** Cross-encoder reranking (OnnxRerank): a REAL serialized
  * single-head-attention .onnx scoring (query, doc) pairs jointly
  * through Spark, value-parity vs a driver-side forward, plus the
  * order-sensitivity a bag-of-words scorer cannot have. */
class OnnxRerankSpec extends SparkSpec {

  private val V = 64
  private val E = 4
  private val MaxToks = 4
  private val L = 2 * MaxToks

  private lazy val modelFile: String = {
    val f = new File(
      Files.createTempDirectory("graft-rerank").toFile, "xenc.onnx")
    val o = new FileOutputStream(f)
    try o.write(TestOnnx.tinyCrossEncoder(V, E, L, salt = 11))
    finally o.close()
    f.getAbsolutePath
  }

  private val query = "fast table scan"
  private val docs = Seq(
    (1L, "fast table scan plan"),
    (2L, "slow row merge"),
    (3L, "table fast scan plan"), // same bag of words as doc 1, reordered
    (4L, null.asInstanceOf[String]))

  private def rerun(model: Option[String]) = {
    import spark.implicits._
    OnnxRerank.rerank(docs.toDF("doc_id", "text"), "text", query,
      model, vocabSize = V, maxTokens = MaxToks, batchSize = 2)
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
  }

  test("scores equal a driver-side forward of the same pair tensor") {
    val got = rerun(Some(modelFile))
    assert(got(4L).isEmpty, "null text must score null")
    val m = OnnxModel.parseBytes(TestOnnx.tinyCrossEncoder(V, E, L, 11))
    val qIds = Towers.tokenIds(query, V, MaxToks)
    docs.filter(_._2 != null).foreach { case (id, text) =>
      val ids = qIds ++ Towers.tokenIds(text, V, MaxToks)
      val want = m.forward(Onnx.Tensor(Seq(1, L), ids)).data(0).toDouble
      assert(math.abs(got(id).get - want) < 1e-6, s"doc $id")
    }
  }

  test("the attention block is order-sensitive: a reordered bag of " +
      "words scores differently (position embeddings are real)") {
    val got = rerun(Some(modelFile))
    assert(got(1L).get != got(3L).get,
      "same tokens in different order must not tie — a bag-of-words " +
        "head would, a cross-encoder must not")
  }

  test("no model path falls back to the Jaccard stand-in ranking") {
    val got = rerun(None)
    // doc 1 shares all 3 query tokens (|union| = 4), doc 2 none
    assert(math.abs(got(1L).get - 3.0 / 4.0) < 1e-12)
    assert(got(2L).get == 0.0)
    assert(got(4L).isEmpty)
  }

  test("composes with BM25 recall: reranking the top-k keeps the " +
      "candidate set and appends scores for every row") {
    val sf = "/root/testdata/sf0.001"
    // recall emits ids + lexical scores; the reranker needs the raw
    // text back — the id-sized join every two-stage stack does
    val topk = graft.queries.TextAnalysis.bm25TopK(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text")), "doc_id")
    val reranked = OnnxRerank.rerank(topk, "text", query,
      Some(modelFile), vocabSize = V, maxTokens = MaxToks)
    val n = topk.count()
    val out = reranked.select(col("rerank_score")).collect()
    assert(out.length == n && n > 0)
    assert(out.forall(r => !r.isNullAt(0)))
  }
}
