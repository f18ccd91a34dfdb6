package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.DatasetConfig
import graft.queries.TableLog

/** The pipeline-facing versioned-table stages
  * ([[Processor.snapshotTo]] / [[Processor.mergeInto]] /
  * [[Processor.deleteFrom]]): a DPF-style pipeline author gets
  * versioned, exactly-once dataset persistence as ordinary chained
  * stages — and the stage's OUTPUT is the committed snapshot, so
  * downstream reads exactly what the table serves. */
class ProcessorTableSpec extends SparkSpec with Matchers {

  import spark.implicits._

  private def proc(rows: Seq[(Long, String, Long)]) = Processor(
    rows.toDF("id", "body", "grp"),
    DatasetConfig.filesImageText("/nonexistent.csv"))

  test("snapshotTo -> mergeInto -> deleteFrom chain: each stage " +
      "continues on the committed snapshot; history stays readable") {
    val dir = Files.createTempDirectory("proc-table").toString
    val base = (0L until 500L).map(i => (i, s"body $i", i % 7))
    val p0 = proc(base).snapshotTo(dir, statsKey = Some("id"))
    p0.count() shouldBe 500
    TableLog.currentVersion(spark, dir) shouldBe 0
    TableLog.statsKeyOf(spark, dir) shouldBe Some("id")

    // MERGE through the pipeline: the stage output reflects the new
    // committed version, not the input frame
    val p1 = proc(Seq((3L, "updated", 99L), (9000L, "fresh", 99L)))
      .mergeInto(dir, "id")
    p1.count() shouldBe 501
    p1.df.filter(col("id") === 3L).select("body")
      .head.getString(0) shouldBe "updated"
    TableLog.currentVersion(spark, dir) shouldBe 1

    // delete arm: retract by key list
    val p2 = proc(Seq((3L, "", 0L), (4L, "", 0L))).deleteFrom(dir, "id")
    p2.count() shouldBe 499
    p2.df.filter(col("id").isin(3L, 4L)).count() shouldBe 0
    TableLog.currentVersion(spark, dir) shouldBe 2

    // the table tier's guarantees hold through the pipeline surface:
    // v0 still reads the original bytes
    TableLog.readVersion(spark, dir, Some(0)).count() shouldBe 500
    TableLog.readVersion(spark, dir, Some(0))
      .filter(col("id") === 3L).select("body")
      .head.getString(0) shouldBe "body 3"
    // and pipeline stages compose AFTER the table stages
    p2.filterRows(col("grp") === 0L).count() shouldBe
      p2.df.filter(col("grp") === 0L).count()
  }

  test("maintainAggView: the stage output IS the current view, " +
      "maintained incrementally and exactly-once across re-runs") {
    val dir = Files.createTempDirectory("proc-mv-src").toString
    val view = Files.createTempDirectory("proc-mv-view").toString
    val base = (0L until 300L).map(i => (i, s"body $i", i % 5))
    proc(base).snapshotTo(dir, statsKey = Some("id"))
    val p0 = proc(Seq.empty).copy(df = TableLog.readVersion(spark, dir))
      .maintainAggView(dir, "id", view, Seq("grp"), Seq("id"))
    p0.count() shouldBe 5
    // MERGE the source, maintain through the pipeline again: the
    // stage reads ONLY the change feed and the output reflects it
    proc(Seq((3L, "moved", 4L))).mergeInto(dir, "id")
    val p1 = p0.maintainAggView(dir, "id", view, Seq("grp"), Seq("id"))
    val got = p1.df.select("grp", "n_rows").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = TableLog.readVersion(spark, dir).groupBy("grp")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe want
    // a re-run maintains nothing (exactly-once) and still reads true
    p1.maintainAggView(dir, "id", view, Seq("grp"), Seq("id"))
      .df.select("grp", "n_rows").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe want
  }

  test("snapshotTo refuses a dir that already holds a table") {
    val dir = Files.createTempDirectory("proc-table2").toString
    proc(Seq((1L, "a", 0L))).snapshotTo(dir)
    intercept[IllegalArgumentException] {
      proc(Seq((2L, "b", 0L))).snapshotTo(dir)
    }.getMessage should include("writeBase")
  }
}
