package graft.queries

import graft.SparkSpec

/** ExactSubstr-style removal (Dedup.dupGramRemoval): the canonical
  * (min doc_id, pos) copy of a duplicated 5-gram survives intact,
  * later copies lose exactly the covered positions, and untouched
  * docs round-trip as their normalized token stream. */
class DupGramRemovalSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val dir = java.nio.file.Files.createTempDirectory("dupgram-rm").toString
    import spark.implicits._
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    Dedup.dupGramRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("canonical copy survives; later copy loses exactly the dup span") {
    val leak = "one two three four five"
    val out = run(Seq(
      (1L, s"$leak tail words here"),
      (2L, s"lead words $leak trailing bits"),
      (3L, "completely different content with no overlap at all")))
    // doc 1 holds the canonical occurrence: untouched
    assert(out(1L) == ((8L, 0L, "one two three four five tail words here")))
    // doc 2 loses the 5 covered tokens, keeps the rest in order
    assert(out(2L) == ((9L, 5L, "lead words trailing bits")))
    // doc 3 untouched, normalized (lowercase passthrough)
    assert(out(3L)._2 == 0L)
    assert(out(3L)._3 == "completely different content with no overlap at all")
  }

  test("overlapping dup grams merge their covered spans") {
    // 6 shared tokens = two overlapping 5-grams; the whole 6-token
    // run is removed from the non-canonical doc
    val leak = "a b c d e f"
    val out = run(Seq(
      (10L, s"$leak x y"),
      (11L, s"p q $leak z")))
    assert(out(10L)._3 == "a b c d e f x y")
    assert(out(11L) == ((9L, 6L, "p q z")))
  }

  test("fully-duplicated doc empties; normalization lowercases and squeezes") {
    val out = run(Seq(
      (20L, "Alpha  Beta\tGamma Delta Epsilon"),
      (41L, "alpha beta gamma delta epsilon")))
    // doc 20 is canonical (lower doc_id); doc 41 is wholly removed
    assert(out(20L) == ((5L, 0L, "alpha beta gamma delta epsilon")))
    assert(out(41L) == ((5L, 5L, "")))
  }
}
