package graft.operators

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** PHash-banded image near-dup (operators/ImageDedup): retouched
  * copies must pair up (hamming ≤ 3 guaranteed by pigeonhole),
  * unrelated images must not, and the survivor set keeps exactly one
  * image per cluster. */
class ImageDedupSpec extends SparkSpec {

  /** deterministic 64×64 gradient image parameterized by seed */
  private def makeImage(seed: Int, retouch: Boolean = false): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    // even channel values only, so the retouch map below is an EXACT
    // integer linear transform (no rounding noise near the median)
    // the noise term breaks the gradient's symmetry: a perfectly
    // regular sawtooth yields many EXACTLY-tied DCT coefficients
    // whose median comparisons flip under float rounding noise
    // (measured: 24 bits on the un-noised seed-0 image)
    for (y <- 0 until 64; x <- 0 until 64) {
      val n = ((x * 31 + y * 17 + seed * 97) % 16) * 2
      val r = (x * 4 + seed * 38 + n) % 256
      val g = (y * 4 + seed * 74 + n) % 256
      val b = ((x + y) * 2 + seed * 12 + n) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    if (retouch) {
      // contrast/brightness remap v → v/2 + 64 (exact on even v):
      // every AC coefficient halves, so threshold comparisons are
      // invariant and at most the DC bit flips (hamming ≤ 1), while
      // every pixel byte changes — the re-encode-style edit pHash is
      // designed to tolerate and equality dedup is not
      for (y <- 0 until 64; x <- 0 until 64) {
        val rgb = img.getRGB(x, y)
        def m(v: Int) = v / 2 + 64
        img.setRGB(x, y, (m((rgb >> 16) & 0xff) << 16) |
          (m((rgb >> 8) & 0xff) << 8) | m(rgb & 0xff))
      }
    }
    img
  }

  private def phashOf(img: BufferedImage): String =
    PHashFilter(8).phashHex(img)

  test("retouched copies pair up; unrelated images do not; survivors keep one per cluster") {
    import spark.implicits._
    // 6 unrelated base images; bases 0 and 1 get a retouched variant
    val rows =
      (0 until 6).map(i => (i.toLong, phashOf(makeImage(i)))) ++
        Seq((100L, phashOf(makeImage(0, retouch = true))),
          (101L, phashOf(makeImage(1, retouch = true))))
    val df = rows.toDF("img_id", "phash")
    val pairs = ImageDedup.nearDupPairs(df, "img_id", "phash").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 100L)), s"retouched copy of 0 not found: $pairs")
    assert(pairs.contains((1L, 101L)), s"retouched copy of 1 not found: $pairs")
    // no pair between unrelated bases
    val unrelated = pairs.filter { case (a, b) => a < 100L && b < 100L }
    assert(unrelated.isEmpty, s"unrelated bases paired: $unrelated")
    val surv = ImageDedup.survivors(df, "img_id", "phash").collect()
      .map(_.getAs[Long]("id")).toSet
    assert(surv.contains(0L) && !surv.contains(100L))
    assert(surv.contains(1L) && !surv.contains(101L))
    assert((2L to 5L).forall(surv.contains))
  }

  test("survivors releases its intermediate blocks promptly (no " +
      "lingering pair/label caches — Dataset.unpersist is a no-op on " +
      "checkpointed frames, Caches.release is not)") {
    import spark.implicits._
    val rows =
      (0 until 6).map(i => (i.toLong, phashOf(makeImage(i)))) ++
        Seq((100L, phashOf(makeImage(0, retouch = true))))
    val df = rows.toDF("img_id", "phash")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    ImageDedup.survivors(df, "img_id", "phash").count()
    // everything the call pinned must be gone except the drop list
    // the returned (lazy) frame still needs — hash cache, candidate
    // pairs, every CC round's label table all released inline
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1,
      s"survivors leaked ${leaked.size} cached RDDs (expected <=1, " +
        "the drop list): ids " + leaked.mkString(","))
  }

  test("hamming verify rejects band collisions beyond the threshold") {
    import spark.implicits._
    // hand-built hex hashes: share band 0 (low 16 bits) but differ in
    // 20+ bits elsewhere → candidate via the band join, killed by the
    // popcount verify
    val a = "00000000" + "0000beef"
    val b = "ffffffff" + "0000beef"
    val df = Seq((1L, a), (2L, b)).toDF("img_id", "phash")
    assert(ImageDedup.nearDupPairs(df, "img_id", "phash").count() == 0)
    // and a 2-bit tweak passes
    val c = "00000003" + "0000beef"
    val df2 = Seq((1L, a), (2L, c)).toDF("img_id", "phash")
    val got = ImageDedup.nearDupPairs(df2, "img_id", "phash").collect()
    assert(got.length == 1 && got.head.getAs[Long]("hamming") == 2L)
  }

  test("top-bit-set hashes parse without the decimal-cast null trap") {
    import spark.implicits._
    val df = Seq((1L, "ffffffffffffffff"), (2L, "fffffffffffffffc"))
      .toDF("img_id", "phash")
    val got = ImageDedup.nearDupPairs(df, "img_id", "phash").collect()
    assert(got.length == 1 && got.head.getAs[Long]("hamming") == 2L)
  }

  test("wrong-width hashes fail loudly instead of silently disabling dedup") {
    import spark.implicits._
    // a PHashFilter(4) column is 4 hex chars — must raise, not no-op
    val df = Seq((1L, "beef"), (2L, "beee")).toDF("img_id", "phash")
    val ex = intercept[Exception] {
      ImageDedup.nearDupPairs(df, "img_id", "phash").collect()
    }
    assert(ex.getMessage.contains("16-hex-char") ||
      Option(ex.getCause).exists(_.getMessage.contains("16-hex-char")))
    // right length but non-hex content must ALSO raise: conv() parses
    // junk to 0, which would collide every such image at hamming 0
    val junk = Seq((1L, "zzzzzzzzzzzzzzzz"), (2L, "xxxxxxxxxxxxxxxx"))
      .toDF("img_id", "phash")
    val ex2 = intercept[Exception] {
      ImageDedup.nearDupPairs(junk, "img_id", "phash").collect()
    }
    assert(ex2.getMessage.contains("16-hex-char") ||
      Option(ex2.getCause).exists(_.getMessage.contains("16-hex-char")))
    // nulls (undecodable images) are still legitimately skipped
    val ok = Seq((1L, "ffffffffffffffff"), (2L, null.asInstanceOf[String]))
      .toDF("img_id", "phash")
    assert(ImageDedup.nearDupPairs(ok, "img_id", "phash").collect().isEmpty)
  }
}
