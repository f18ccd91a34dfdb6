package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Curation.chunkDocs]] — sliding-window chunking: boundary
  * arithmetic at every edge (empty doc, exactly W, W+1, stride
  * multiples), full-coverage/overlap invariants on the real table,
  * and the no-shuffle plan shape.
  */
class ChunkDocsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val W = Curation.ChunkTokens
  private val S = Curation.ChunkStride

  private def chunksOf(text: String): Array[(Long, Long, String)] = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("ts", graft.functions.TextFunctions.tokens(col("text")))
      .withColumn("ntok", size(col("ts")))
      .filter(col("ntok") > 0)
      .withColumn("n_chunks",
        when(col("ntok") <= W, lit(1L)).otherwise(
          expr(s"(ntok - $W + $S - 1) div $S").cast("long") + 1L))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("ck", slice(col("ts"),
        (col("chunk_id") * S + 1).cast("int"), lit(W)))
      .select(col("chunk_id"), size(col("ck")).cast("long"),
        array_join(col("ck"), " "))
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  private def words(n: Int, from: Int = 0): String =
    (from until from + n).map(i => s"w$i").mkString(" ")

  test("boundary arithmetic: empty, <=W, W+1, stride multiples") {
    assert(chunksOf("").isEmpty)
    assert(chunksOf("   ").isEmpty)
    // 1 token and exactly W tokens -> one chunk, no padding
    assert(chunksOf("a") === Array((0L, 1L, "a")))
    val exactly = chunksOf(words(W))
    assert(exactly.length == 1 && exactly(0)._2 == W)
    // W+1 tokens -> 2 chunks; second starts at S, covers the tail
    val plus1 = chunksOf(words(W + 1))
    assert(plus1.length == 2)
    assert(plus1(0)._3 == words(W))
    assert(plus1(1)._3 == (S until W + 1).map(i => s"w$i").mkString(" "))
    // ntok - W a multiple of S: the last window ENDS exactly at ntok
    // (no extra duplicate tail chunk)
    val exact2 = chunksOf(words(W + 2 * S))
    assert(exact2.length == 3)
    assert(exact2.last._2 == W)
    assert(exact2.last._3.endsWith(s"w${W + 2 * S - 1}"))
  }

  test("coverage + overlap invariants on the real table") {
    val ch = Curation.chunkDocs(spark, dir).cache()
    try {
      // every chunk is non-empty and at most W tokens
      assert(ch.filter(col("n_tokens") < 1 || col("n_tokens") > W)
        .count() == 0)
      // chunk ids are dense from 0 per doc
      val perDoc = ch.groupBy("doc_id")
        .agg(count(lit(1)).as("n"), max(col("chunk_id")).as("mx"),
          min(col("chunk_id")).as("mn"))
      assert(perDoc.filter(col("mn") =!= 0 ||
        col("mx") =!= col("n") - 1).count() == 0)
      // consecutive chunks overlap by exactly W - S tokens (both
      // full-width) and concatenating first tokens of each stride
      // plus the last chunk reconstructs the doc's token count
      val docs = Tables.t(spark, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("ntok"))
      val joined = perDoc.join(docs, "doc_id")
        .join(ch.filter(col("chunk_id") === 0)
          .select(col("doc_id"), col("n_tokens").as("t0")), "doc_id")
      // reconstruction: (n-1) strides + last chunk width == ntok for
      // multi-chunk docs; t0 == ntok for single-chunk docs
      val bad = joined
        .join(ch.select(col("doc_id"), col("chunk_id"),
          col("n_tokens").as("tl")), Seq("doc_id"))
        .filter(col("chunk_id") === col("mx"))
        .filter(
          when(col("n") === 1, col("t0") =!= col("ntok"))
            .otherwise(lit(S) * (col("n") - 1) + col("tl")
              =!= col("ntok")))
      assert(bad.count() == 0)
    } finally ch.unpersist()
  }

  test("q_chunk_docs plan has no exchange — pure per-row fan-out") {
    val p = Curation.chunkDocs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000))
  }
}
