package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE merge-learning semantics beyond the oracle hash-gate: the
  * learned merges on a hand-built corpus match the by-hand BPE trace
  * (including frequency weighting and the merged symbol feeding later
  * steps), greedy left-to-right application on overlaps, and the
  * early-dry edge (corpus with fewer distinct pairs than steps).
  */
class BpeSpec extends SparkSpec {

  private def write(docs: Seq[String], tag: String): String = {
    val tmp = Files.createTempDirectory(s"graft-bpe-$tag").toString
    spark.createDataFrame(docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t)
    }).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("learned merges match the by-hand trace on a weighted corpus") {
    // corpus: "lowest" x3, "low" x2  (the classic BPE example shape)
    val dir = write(Seq("lowest lowest lowest", "low low"), "trace")
    val rows = TextAnalysis.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand trace: pairs of lowest(3): l-o o-w w-e e-s s-t; low(2): l-o o-w
    // step1: (l,o)=5 vs (o,w)=5 tie -> lexicographic (l,o) wins
    assert(rows(0) == ((1L, "l", "o", 5L)))
    // step2: (lo,w)=5 beats the rest
    assert(rows(1) == ((2L, "lo", "w", 5L)))
    // step3: within "lowest": (low,e)=3, (e,s)=3, (s,t)=3 -> (e,s) first
    assert(rows(2) == ((3L, "e", "s", 3L)))
    // step4: (es,t)=3 vs (low,es)=3 -> lexicographic: es < low
    assert(rows(3) == ((4L, "es", "t", 3L)))
    // step5: (low,est)=3 is the only pair left in "lowest"
    assert(rows(4) == ((5L, "low", "est", 3L)))
  }

  test("greedy left-to-right application on overlapping pairs") {
    // "aaa": pairs (a,a)=2 -> merge once greedily -> aa|a| so step2
    // learns (aa, a), not (a, aa)
    val dir = write(Seq("aaa aaa"), "overlap")
    val rows = TextAnalysis.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows(0) == ((1L, "a", "a", 4L)))
    assert(rows(1) == ((2L, "aa", "a", 2L)))
    assert(rows.length == 2, s"should dry up after 2 merges: ${rows.toSeq}")
  }

  test("single-character vocabulary dries immediately") {
    val dir = write(Seq("a b a b"), "dry")
    assert(TextAnalysis.bpeMerges(spark, dir).collect().isEmpty)
  }

  test("tokenize applies the learned merges: fully-merged words are one token") {
    val dir = write(Seq("lowest lowest lowest", "low low"), "tok")
    val rows = TextAnalysis.bpeTokenize(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_words"),
        r.getAs[Long]("bpe_tokens"))).toMap
    // after the 5 learned merges "lowest" and "low" are single symbols
    assert(rows(0L) == ((3L, 3L)))
    assert(rows(1L) == ((2L, 2L)))
  }

  test("tokenize on an untrainable corpus counts one token per character") {
    // single-char words learn no merges; every char stays a symbol
    val dir = write(Seq("a b a"), "tok-dry")
    val rows = TextAnalysis.bpeTokenize(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_words") == 3L)
    assert(rows.head.getAs[Long]("bpe_tokens") == 3L)
  }

  test("a merge never fires inside a longer symbol (suffix collision)") {
    // after (x,y) then (y,z) are learned, the word "xyz" holds
    // symbols [xy, z] — the (y,z) merge must NOT match the 'y' inside
    // 'xy' (a one-sided encoding silently merged a never-learned
    // 'xyz' symbol here); step 3 can then still learn (xy, z)
    val dir = write(Seq(
      ("xy " * 10).trim, ("yz " * 6).trim, "xyz"), "suffix")
    val rows = TextAnalysis.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // step1: (x,y) = 10 from "xy" + 1 from "xyz"; step2: (y,z) = 6
    // from "yz" only — the 'y' inside the merged 'xy' of "xyz" no
    // longer pairs with 'z'; step3: (xy,z) = 1 from "xyz"
    assert(rows.toSeq == Seq(
      (1L, "x", "y", 11L), (2L, "y", "z", 6L), (3L, "xy", "z", 1L)))
  }

  test("tokens containing the symbol terminator are excluded from training") {
    // "x|y" would corrupt the pipe-terminated encoding; only "ab"
    // (weight 2) must train
    val dir = write(Seq("x|y ab", "x|y ab"), "pipe")
    val rows = TextAnalysis.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, "a", "b", 2L)))
  }
}
