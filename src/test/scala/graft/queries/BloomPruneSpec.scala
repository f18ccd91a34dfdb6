package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Layout.bloomPrune]]: the bloom may keep a file it needn't (false
  * positive — bounded by the m/n/k geometry) but must NEVER skip a
  * file that holds a probed key (false negative = wrong results at
  * scan time). Fixture: a synthetic events corpus large enough for
  * several modeled files. */
class BloomPruneSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("bloomprune").toString
    val rows = (0L until 4000L).map { i =>
      (i, i * 1000L, i % 97, "c", 1.0, """{"k": 1}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  private lazy val out = Layout.bloomPrune(spark, dir).collect()

  test("no false negatives: every file holding a probe key is kept") {
    out.filter(_.getLong(3) > 0).foreach { r =>
      withClue(s"probe ${r.getLong(0)} file ${r.getLong(1)}: ") {
        r.getLong(2) shouldBe 1L
      }
    }
    // each probe key exists exactly once in exactly one file
    val matched = out.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.map(_.getLong(3)).sum
    }
    matched.foreach(_ shouldBe 1L)
  }

  test("pruning is real: a point lookup keeps a small fraction of files") {
    val files = out.map(_.getLong(1)).distinct.length
    files shouldBe 16 // ceil(4000 / 256)
    val keptFrac = out.count(_.getLong(2) == 1L).toDouble / out.length
    // theoretical FP ≈ 0.16 at 250 keys / 992 bits / k=4; the true
    // file adds 1/16. Assert well below half so a saturated bloom
    // (every file kept) can never pass.
    keptFrac should be < 0.5
    keptFrac should be > 0.0
  }

  test("probe count and shape") {
    // only 4 ids ≡ 7 (mod 1000) exist below 4000 — the LIMIT 8 probe
    // pick degrades gracefully; one row per (probe, file)
    out.length shouldBe 4 * 16
    out.map(_.getLong(0)).distinct.sorted shouldBe
      Seq(7L, 1007L, 2007L, 3007L)
  }
}
