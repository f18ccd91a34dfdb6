package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Pins the interval-union semantics of the duplicated-n-gram
  * coverage signal on a corpus built by hand: a gram shared by two
  * docs covers its [pos, pos+N) token span in BOTH docs, overlapping
  * spans union (no double count), and a doc with no shared gram
  * reports zero coverage.
  */
class DupGramCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("coverage = union of duplicated-gram spans over token positions") {
    assert(Dedup.CoverN == 5 && Dedup.CoverMinDocs == 2,
      "spec expectations assume N=5, minDocs=2")
    val docs = Seq(
      // A and B share the 5-gram "one two three four five"
      (1L, "one two three four five six"),   // gram at pos 0 → covers 0..4 of 6
      (2L, "zero one two three four five"),  // gram at pos 1 → covers 1..5 of 6
      // C repeats a phrase internally but shares nothing across docs
      (3L, "u v w x y z"),
      // D is too short to produce any 5-gram
      (4L, "tiny doc"))
      .map { case (id, text) =>
        (id, text, "en", "s", text.length.toLong)
      }
    val dir = Files.createTempDirectory("graft-cov").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = Dedup.dupGramCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(1L) == ((6L, 5L, 0.8333)))
    assert(rows(2L) == ((6L, 5L, 0.8333)))
    assert(rows(3L) == ((6L, 0L, 0.0)))
    assert(rows(4L) == ((2L, 0L, 0.0)))
  }
}
