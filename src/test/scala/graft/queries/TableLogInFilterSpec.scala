package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The keyed touch-scan's IN-FILTER fast path (round-8 optimization):
  * on a long-kinded stats key, MERGE/DELETE test membership with a
  * typed pushed `In` over the batch's already-collected keys instead
  * of two broadcast joins. These tests pin that the fast path and the
  * broadcast-join path (which a no-stats-key table still takes)
  * produce IDENTICAL tables — including the null-key arm, where a
  * NULL key must match nothing in the semi scan and survive the anti
  * rewrite. */
class TableLogInFilterSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def baseRows = (0L until 500L)
    .map(i => (i, s"body $i")) :+ ((-1L, "keyless"))

  // one null-keyed resident row: the contract allows one, and it is
  // exactly the row whose handling differs between a naive NOT-IN
  // filter and the anti join the fast path must mirror
  private def baseDf = baseRows.toDF("id", "body")
    .withColumn("id", when(col("id") === -1L,
      lit(null).cast("long")).otherwise(col("id")))

  private def content(dir: String): Seq[(Option[Long], String)] =
    TableLog.readVersion(spark, dir).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1)))
      .sortBy(t => (t._1.getOrElse(Long.MinValue), t._2)).toSeq

  test("MERGE + DELETE land identically through the IN-filter fast " +
      "path (stats key) and the broadcast-join path (no stats key)") {
    val fast = Files.createTempDirectory("tl_infilter_fast").toString
    val slow = Files.createTempDirectory("tl_infilter_join").toString
    TableLog.writeBase(spark, baseDf.repartition(4), fast,
      statsKey = Some("id"))
    TableLog.writeBase(spark, baseDf.repartition(4), slow)

    val batch = Seq((7L, "updated 7"), (444L, "updated 444"),
      (9001L, "fresh")).toDF("id", "body")
    TableLog.upsert(spark, fast, batch, "id")
    TableLog.upsert(spark, slow, batch, "id")
    val afterMerge = content(fast)
    afterMerge shouldBe content(slow)
    // the null-keyed resident survived the rewrite on both paths
    assert(afterMerge.contains((None, "keyless")))
    assert(afterMerge.contains((Some(7L), "updated 7")))
    assert(afterMerge.contains((Some(9001L), "fresh")))
    afterMerge.size shouldBe 502

    val doomed = Seq(7L, 100L, 101L).toDF("id")
    TableLog.delete(spark, fast, doomed, "id")
    TableLog.delete(spark, slow, doomed, "id")
    val afterDelete = content(fast)
    afterDelete shouldBe content(slow)
    assert(!afterDelete.exists(_._1.contains(7L)))
    assert(afterDelete.contains((None, "keyless")))
    afterDelete.size shouldBe 499
  }

  test("a null-keyed BATCH row inserts without disturbing the " +
      "null-keyed resident, same as the join path") {
    val fast = Files.createTempDirectory("tl_infilter_nullb").toString
    val slow = Files.createTempDirectory("tl_infilter_nullbj").toString
    TableLog.writeBase(spark, baseDf.repartition(4), fast,
      statsKey = Some("id"))
    TableLog.writeBase(spark, baseDf.repartition(4), slow)
    val batch = Seq((Some(3L), "updated 3"), (None, "keyless v2"))
      .toDF("id", "body")
    TableLog.upsert(spark, fast, batch, "id")
    TableLog.upsert(spark, slow, batch, "id")
    val got = content(fast)
    got shouldBe content(slow)
    // null matches nothing: the resident null row is NOT replaced,
    // the batch's null row inserts alongside it (join semantics)
    got.count(_._1.isEmpty) shouldBe 2
    assert(got.contains((Some(3L), "updated 3")))
  }
}
