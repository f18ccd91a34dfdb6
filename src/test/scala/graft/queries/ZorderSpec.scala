package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Z-order layout (Layout.zorderLayout): the per-file ranges must
  * actually buy multi-dimension pruning, and the Morton arithmetic
  * must round-trip. */
class ZorderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("z layout prunes a value-box query that a user-sorted layout cannot") {
    val files = Layout.zorderLayout(spark, sf).collect()
    assert(files.length == 32)
    // box query: value bucket in [64, 127] (≈ value in [128, 256) —
    // selective on this low-skewed value distribution)
    val zTouched = files.count { r =>
      r.getAs[Long]("vb_lo") <= 127L && r.getAs[Long]("vb_hi") >= 64L
    }
    // the 1-D comparison: same corpus, same 32 files, but laid out
    // in user_id order — each file's value range is then ~the full
    // span, so the same box touches (almost) every file
    val ubSorted = Quantiles.tileOverlaps(
      Tables.t(spark, sf, "events")
        .select((col("user_id") * lit(65536L) +
          least(floor(col("value") / 2.0), lit(255L)).cast("long"))
          .as("k")),
      "k", 32)
      .groupBy("tile")
      .agg(min(pmod(col("v"), lit(65536L))).as("vb_lo"),
        max(pmod(col("v"), lit(65536L))).as("vb_hi"))
      .collect()
    val ubTouched = ubSorted.count { r =>
      r.getAs[Long]("vb_lo") <= 127L && r.getAs[Long]("vb_hi") >= 64L
    }
    assert(zTouched < ubTouched,
      s"z layout touched $zTouched files, user-sorted $ubTouched")
    assert(zTouched <= 32 / 2,
      s"z layout should prune at least half the files, touched $zTouched")
  }

  test("statsPrune never false-prunes: kept files hold every row " +
      "matching the box predicate") {
    // rows matching the box, re-derived from raw events
    val ub = pmod(col("user_id"), lit(256L)).cast("long")
    val vb = least(floor(col("value") / 2.0), lit(255L)).cast("long")
    val matchRows = Tables.t(spark, sf, "events")
      .filter(ub.between(Layout.PruneUbLo, Layout.PruneUbHi) &&
        vb.between(Layout.PruneVbLo, Layout.PruneVbHi))
      .count()
    assert(matchRows > 0, "box predicate selects nothing — dead test")
    // kept-file row mass must be able to contain them (stats skipping
    // may over-read, never under-read)
    val pruned = Layout.statsPrune(spark, sf).collect()
    val keptRows = pruned.filter(_.getAs[Long]("kept") == 1L)
      .map(_.getAs[Long]("n_rows")).sum
    assert(keptRows >= matchRows,
      s"kept files hold $keptRows rows < $matchRows matching rows")
    // containment: every matching row's z value lies inside some KEPT
    // file's z range (needs the full stats row set, so re-read the
    // layout audit rather than the 3-column statsPrune projection)
    val stats = Layout.zorderLayout(spark, sf).collect()
      .map(r => (r.getAs[Long]("file_id"),
        r.getAs[Long]("z_lo"), r.getAs[Long]("z_hi"),
        r.getAs[Long]("ub_lo"), r.getAs[Long]("ub_hi"),
        r.getAs[Long]("vb_lo"), r.getAs[Long]("vb_hi")))
    val keptIds = pruned.filter(_.getAs[Long]("kept") == 1L)
      .map(_.getAs[Long]("file_id")).toSet
    val keptRanges = stats.filter(s => keptIds.contains(s._1))
      .map(s => (s._2, s._3))
    val matchZ = Tables.t(spark, sf, "events")
      .filter(ub.between(Layout.PruneUbLo, Layout.PruneUbHi) &&
        vb.between(Layout.PruneVbLo, Layout.PruneVbHi))
      .select(Layout.zExprForTest.as("z"))
      .distinct().collect().map(_.getLong(0))
    matchZ.foreach { z =>
      assert(keptRanges.exists { case (lo, hi) => lo <= z && z <= hi },
        s"matching z=$z not covered by any kept file's z range")
    }
    // and the audit is a real cut, not keep-everything
    assert(pruned.count(_.getAs[Long]("kept") == 1L) < pruned.length / 2)
  }

  test("file counts cover the corpus exactly and ranges nest in z") {
    val files = Layout.zorderLayout(spark, sf).collect()
    val total = files.map(_.getAs[Long]("n_rows")).sum
    val corpus = Tables.t(spark, sf, "events").count()
    assert(total == corpus)
    // z ranges of consecutive files may share exactly the boundary
    // value (ties straddle), but never invert
    val byFile = files.sortBy(_.getAs[Long]("file_id"))
    byFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("z_hi") <= b.getAs[Long]("z_lo"),
          s"z ranges out of order: $a / $b")
      case _ =>
    }
  }
}
