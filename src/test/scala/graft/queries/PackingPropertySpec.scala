package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants of greedy in-order token packing on adversarial data
  * (empty docs, docs far over the budget, single-token runs):
  *  (a) token mass is preserved — every token lands in exactly one
  *      pack;
  *  (b) the last pack id per source is exactly (total−1) div budget —
  *      the cumsum fixes it regardless of how docs split (ids may
  *      legitimately skip: an over-budget doc jumps several windows);
  *  (c) no pack exceeds budget + (max doc tokens − 1): a doc lands in
  *      the pack of its END, so a pack's mass is one budget window
  *      plus whatever its first doc dragged across the boundary.
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  test("pack invariants hold on adversarial synthetic corpora") {
    val rnd = new scala.util.Random(31337)
    val docs = (0 until 500).map { i =>
      val kind = rnd.nextInt(4)
      val nTok = kind match {
        case 0 => 0                        // empty doc
        case 1 => 1 + rnd.nextInt(5)       // tiny
        case 2 => 50 + rnd.nextInt(200)    // normal
        case _ => 300 + rnd.nextInt(400)   // over budget (256)
      }
      (i.toLong, Seq.fill(nTok)("tok").mkString(" "),
        "xx", s"s${i % 7}", nTok.toLong)
    }
    val dir = Files.createTempDirectory("graft-pack").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val packs = Curation.packSequences(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // (a) token mass preserved
    val totalTokens = docs.map(_._5).sum
    assert(packs.map(_._4).sum == totalTokens)

    // (b) last pack id per source is pinned by the source's total
    val totalsBySource = docs.groupBy(_._4)
      .map { case (s, ds) => s -> ds.map(_._5).sum }
    packs.groupBy(_._1).foreach { case (src, ps) =>
      val ids = ps.map(_._2)
      assert(ids.distinct.length == ids.length, s"$src dup pack ids")
      val total = totalsBySource(src)
      assert(ids.max == (total - 1) / Curation.PackBudget,
        s"$src last pack ${ids.max} for $total tokens")
    }

    // (c) pack mass bound
    val maxDoc = docs.map(_._5).max
    val bound = Curation.PackBudget + maxDoc - 1
    packs.foreach { case (src, pid, _, toks) =>
      assert(toks <= bound, s"$src pack $pid has $toks > $bound")
    }
  }
}
