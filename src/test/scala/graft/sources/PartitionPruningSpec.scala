package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{ColumnPayload, FilesConfig, Modality}

/** Partitioned metadata layout: hive-partitioned writes +
  * partition-pruned reads — the at-scale layout for date/source-keyed
  * corpora. The assertions are on the PHYSICAL plan: a filter on the
  * partition column must reach the scan as a partition filter and
  * shrink the scanned file set, not run as a post-scan row filter.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private def textConfig(path: String) =
    FilesConfig(path, Seq(ColumnPayload(Modality.Text, "text")),
      format = "parquet")

  test("partitionBy write + day filter prunes to one partition's files") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val df = (0 until 1000).map { i =>
      (i.toLong, s"day-${i % 10}", s"text $i", i % 10)
    }.toDF("id", "label", "text", "day")
    val p = DatasetReader.fromDataFrame(df, textConfig(dir))
    ShardWriters.saveMetadataPartitioned(p, dir, Seq("day"))

    val back = spark.read.parquet(dir)
    val pruned = back.filter(col("day") === 3)

    // correctness: exactly the day-3 rows survive
    assert(pruned.count() == 100)
    assert(pruned.select("label").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("day-3"))

    // plan: the scan's partition filters carry the predicate and the
    // selected partition count is 1 of 10
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"day=3 must be a partition filter, plan:\n${scan.treeString}")
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(selected.map(_.files.length).sum <
      scan.relation.location.inputFiles.length,
      "pruned scan must read fewer files than the full table")
    assert(selected.length == 1, s"expected 1 partition, got ${selected.length}")
  }

  test("unfiltered read still sees all partitions and rows") {
    val dir = Files.createTempDirectory("graft-part2").toString + "/t"
    val df = (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "bucket")
    val p = DatasetReader.fromDataFrame(df, textConfig(dir))
    ShardWriters.saveMetadataPartitioned(p, dir, Seq("bucket"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 40)
    assert(back.select("bucket").distinct().count() == 4)
  }
}
