package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** CHECK constraints: ADD validates the whole existing table; every
  * later write validates what it WRITES and refuses violations
  * before any commit; NULL evaluations violate (strict data-quality
  * reading); DROP re-opens the gate; delete/compact are exempt by
  * construction. */
class TableLogConstraintSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def base(n: Long) = (0L until n)
    .map(i => (i, s"body $i", i % 7 + 1)).toDF("id", "body", "score")

  test("writes that violate a CHECK constraint are refused before " +
      "commit; valid writes pass; drop re-opens the gate") {
    val dir = Files.createTempDirectory("tl-chk").toString
    TableLog.writeBase(spark, base(100), dir, statsKey = Some("id"))
    TableLog.addConstraint(spark, dir, "pos_score", "score > 0")
    TableLog.addConstraint(spark, dir, "has_body",
      "body IS NOT NULL AND length(body) > 0")
    TableLog.constraintsOf(spark, dir).map(_._1) shouldBe
      Seq("pos_score", "has_body")

    // a violating MERGE refuses loudly and commits NOTHING
    val v = TableLog.currentVersion(spark, dir)
    val ex = intercept[IllegalArgumentException] {
      TableLog.upsert(spark, dir,
        Seq((3L, "poisoned", -5L)).toDF("id", "body", "score"), "id")
    }
    ex.getMessage should include("pos_score")
    ex.getMessage should include("nothing was committed")
    TableLog.currentVersion(spark, dir) shouldBe v
    TableLog.readVersion(spark, dir)
      .filter(col("score") <= 0).count() shouldBe 0

    // a violating append refuses too — BEFORE its data writes
    intercept[IllegalArgumentException] {
      TableLog.appendOnce(spark, dir,
        Seq((1000L, "", 5L)).toDF("id", "body", "score"), "app", 0L)
    }.getMessage should include("has_body")
    TableLog.currentVersion(spark, dir) shouldBe v

    // valid writes pass
    TableLog.upsert(spark, dir,
      Seq((3L, "fine", 9L)).toDF("id", "body", "score"), "id")
    TableLog.appendOnce(spark, dir,
      Seq((1000L, "ok", 5L)).toDF("id", "body", "score"), "app", 1L)
    TableLog.readVersion(spark, dir).count() shouldBe 101

    // delete is exempt (it only removes rows that already passed)
    TableLog.delete(spark, dir, Seq(5L).toDF("id"), "id")
    TableLog.readVersion(spark, dir).count() shouldBe 100

    // drop re-opens the gate
    TableLog.dropConstraint(spark, dir, "pos_score")
    TableLog.upsert(spark, dir,
      Seq((4L, "neg now fine", -1L)).toDF("id", "body", "score"), "id")
    TableLog.readVersion(spark, dir)
      .filter(col("score") < 0).count() shouldBe 1
    // unknown drops are loud
    intercept[IllegalArgumentException] {
      TableLog.dropConstraint(spark, dir, "nope")
    }.getMessage should include("no constraint")
  }

  test("ADD CONSTRAINT validates the existing table; NULL " +
      "evaluations violate (evolution's null-fills included)") {
    val dir = Files.createTempDirectory("tl-chk2").toString
    TableLog.writeBase(spark, base(50), dir, statsKey = Some("id"))
    // the existing data violates: refused, nothing recorded
    intercept[IllegalArgumentException] {
      TableLog.addConstraint(spark, dir, "big", "score > 100")
    }.getMessage should include("ADD CONSTRAINT")
    TableLog.constraintsOf(spark, dir) shouldBe empty
    // duplicate names are loud
    TableLog.addConstraint(spark, dir, "pos", "score > 0")
    intercept[IllegalArgumentException] {
      TableLog.addConstraint(spark, dir, "pos", "score >= 0")
    }.getMessage should include("already exists")

    // NULL evaluations violate: a null score makes `score > 0`
    // evaluate to NULL, which this gate reads as a violation (the
    // strict data-quality semantics, not SQL CHECK's pass-on-unknown)
    intercept[IllegalArgumentException] {
      TableLog.upsert(spark, dir,
        Seq((1L, "one", Option.empty[Long]))
          .toDF("id", "body", "score"), "id")
    }.getMessage should include("pos")

    // evolution OMITTING a constrained column: the replaced row
    // null-fills `score` in the REWRITTEN file, so the gate refuses —
    // the constraint sees what would actually land on disk, not just
    // the batch's own columns
    intercept[IllegalArgumentException] {
      TableLog.upsert(spark, dir,
        Seq((2L, "two")).toDF("id", "body"), "id",
        allowSchemaEvolution = true)
    }.getMessage should include("pos")
    // the refused evolution committed nothing
    TableLog.readVersion(spark, dir).count() shouldBe 50
  }
}
