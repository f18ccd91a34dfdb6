package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[MaterializedAgg]]: incremental maintenance equals full
  * recompute through births, deaths, moving updates, and deletes;
  * exactly-once under replay; crash tombstones filtered and swept;
  * spec drift and divergence refused loudly. */
class MaterializedAggSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def tmp(tag: String) =
    Files.createTempDirectory(s"mv-$tag").toString

  private def srcRows(n: Int) = (0 until n)
    .map(i => (i.toLong, s"g${i % 5}", (i % 7).toLong))
    .toDF("id", "grp", "val")

  private def viewMap(viewDir: String) =
    MaterializedAgg.readView(spark, viewDir)
      .select("grp", "n_rows", "sum_val").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def recomputed(srcDir: String) =
    TableLog.readVersion(spark, srcDir)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum("val").as("sum_val"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def gidOf(grp: String): Long =
    spark.range(1)
      .select(xxhash64(to_json(struct(lit(grp).as("grp")))))
      .head.getLong(0)

  test("incremental maintenance equals full recompute through " +
      "updates, moving updates, births, deaths, and deletes") {
    val src = tmp("src"); val view = tmp("view")
    TableLog.writeBase(spark,
      srcRows(100).repartitionByRange(4, col("id"))
        .sortWithinPartitions(col("id")),
      src, statsKey = Some("id"))
    val s1 = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    s1.mode shouldBe "full"
    s1.groupsTotal shouldBe 5
    viewMap(view) shouldBe recomputed(src)

    // nothing changed: noop, not a re-aggregation
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val")).mode shouldBe "noop"

    // in-place update (g3), MOVING update (id 4: g4 -> g0, both
    // groups must adjust), and a brand-new group (g9)
    TableLog.upsert(spark, src, Seq(
      (3L, "g3", 13L), (4L, "g0", 4L), (1000L, "g9", 1L))
      .toDF("id", "grp", "val"), "id")
    val s2 = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    s2.mode shouldBe "incremental"
    s2.groupsTouched shouldBe 4 // g3, g4, g0, g9
    s2.groupsTotal shouldBe 6
    viewMap(view) shouldBe recomputed(src)

    // deletes, including the DEATH of g9 (its only row goes): the
    // group must vanish from the view, not linger at zero
    TableLog.delete(spark, src, Seq(1000L, 2L).toDF("id"), "id")
    val s3 = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    s3.mode shouldBe "incremental"
    s3.groupsTotal shouldBe 5
    viewMap(view) shouldBe recomputed(src)
    TableLog.readVersion(spark, view)
      .filter(col("grp") === "g9").count() shouldBe 0
  }

  test("exactly-once under replay; crash tombstones are invisible " +
      "and swept by the next maintain") {
    val src = tmp("src2"); val view = tmp("view2")
    TableLog.writeBase(spark, srcRows(50), src, statsKey = Some("id"))
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    TableLog.upsert(spark, src,
      Seq((1L, "g1", 100L)).toDF("id", "grp", "val"), "id")
    val before = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    before.mode shouldBe "incremental"
    val snapshot = viewMap(view)
    // a REPLAYED maintain (same source head) applies nothing — the
    // txn stamp in the view's own log is the resume point
    val replay = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    replay.mode shouldBe "noop"
    replay.groupsTotal shouldBe -1 // the noop path scans nothing
    viewMap(view) shouldBe snapshot

    // crash residue: a tombstone committed but not yet swept — it
    // must be invisible to readView and gone after the next maintain
    TableLog.upsert(spark, view,
      Seq(("zz", 0L, 0L, 424242L))
        .toDF("grp", "n_rows", "sum_val", "gid"), "gid")
    MaterializedAgg.readView(spark, view)
      .filter(col("gid") === 424242L).count() shouldBe 0
    TableLog.upsert(spark, src,
      Seq((2L, "g2", 50L)).toDF("id", "grp", "val"), "id")
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    TableLog.readVersion(spark, view)
      .filter(col("gid") === 424242L).count() shouldBe 0
    viewMap(view) shouldBe recomputed(src)
  }

  test("a compaction-only source window advances the stamp with a " +
      "metadata-only commit instead of being re-read forever") {
    val src = tmp("src5"); val view = tmp("view5")
    TableLog.writeBase(spark, srcRows(80).repartition(4), src,
      statsKey = Some("id"))
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    // the only source change is a compaction: zero row-level changes
    TableLog.compact(spark, src, targetBytes = 1L << 20)
    val s = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    s.mode shouldBe "empty"
    s.groupsTouched shouldBe 0
    // the stamp ADVANCED: the next maintain is a pure noop, not a
    // re-read of the compaction window
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val")).mode shouldBe "noop"
    viewMap(view) shouldBe recomputed(src)
  }

  test("a long-running maintainer folds the view's small files back " +
      "together; content is identical across the compaction") {
    val src = tmp("src4"); val view = tmp("view4")
    TableLog.writeBase(spark, srcRows(60), src, statsKey = Some("id"))
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    // 6 maintains with a 2-file threshold: compaction must fire and
    // keep folding the per-maintain file sets
    (0 until 6).foreach { i =>
      TableLog.upsert(spark, src,
        Seq((i.toLong, s"g${i % 5}", 100L + i))
          .toDF("id", "grp", "val"), "id")
      MaterializedAgg.maintain(spark, src, "id", view,
        Seq("grp"), Seq("val"), compactAboveFiles = 2)
      viewMap(view) shouldBe recomputed(src)
    }
    TableLog.liveFiles(spark, view).size should be <= 3
  }

  test("a SOURCE restore flows through the change feed: the view " +
      "rolls back with it, incrementally") {
    val src = tmp("src6"); val view = tmp("view6")
    TableLog.writeBase(spark,
      srcRows(100).repartitionByRange(4, col("id"))
        .sortWithinPartitions(col("id")),
      src, statsKey = Some("id"))
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    val v0Map = viewMap(view)
    TableLog.upsert(spark, src, Seq(
      (3L, "g3", 999L), (5000L, "g9", 7L)).toDF("id", "grp", "val"),
      "id")
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    viewMap(view) should not be v0Map

    // roll the SOURCE back: the next maintain reads the restore's
    // file diff as ordinary retractions and the view returns to the
    // v0 aggregate — including the DEATH of the inserted group
    TableLog.restore(spark, src, 0)
    val s = MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    s.mode shouldBe "incremental"
    viewMap(view) shouldBe v0Map
    viewMap(view) shouldBe recomputed(src)
    TableLog.readVersion(spark, view)
      .filter(col("grp") === "g9").count() shouldBe 0
  }

  test("spec drift and view divergence refuse loudly instead of " +
      "committing corruption") {
    val src = tmp("src3"); val view = tmp("view3")
    TableLog.writeBase(spark, srcRows(50), src, statsKey = Some("id"))
    MaterializedAgg.maintain(spark, src, "id", view,
      Seq("grp"), Seq("val"))
    // different measures against the same view dir
    intercept[IllegalArgumentException] {
      MaterializedAgg.maintain(spark, src, "id", view,
        Seq("grp"), Seq.empty)
    }.getMessage should include("different view spec")
    // divergence: a foreign writer dropped g1 from the view; the
    // source then retracts g1 rows -> negative count -> refuse
    TableLog.delete(spark, view,
      Seq(gidOf("g1")).toDF("gid"), "gid")
    TableLog.delete(spark, src,
      (0L until 50L).filter(_ % 5 == 1).toDF("id"), "id")
    intercept[IllegalArgumentException] {
      MaterializedAgg.maintain(spark, src, "id", view,
        Seq("grp"), Seq("val"))
    }.getMessage should include("negative group count")
  }
}
