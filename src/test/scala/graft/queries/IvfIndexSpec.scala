package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The materialized IVF layout: a probe-1 search against the
  * cluster-partitioned index must (a) prune the scan to the probed
  * cluster's partition directory — asserted on the physical plan —
  * and (b) return the same neighbors as searching the in-memory
  * assignment.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probe-1 search prunes the scan to one cluster partition") {
    val idxPath = Files.createTempDirectory("graft-ivf").toString + "/idx"
    Similarity.buildIvfIndex(spark, dir, idxPath)

    // pick query vector 0's cluster + embedding from the index itself
    val q = spark.read.parquet(idxPath).filter(col("vec_id") === 0)
      .select(col("cluster"), col("v")).collect().head
    // partition columns come back with directory-inferred types
    val qCluster = q.getAs[Number](0).longValue()
    val qv = q.getSeq[Double](1).toArray

    val res = Similarity.annIvfFromIndex(spark, idxPath, qCluster, qv)

    // plan: the cluster predicate is a partition filter and selects
    // exactly one of the index's partition directories
    val scan = res.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty, scan.treeString.take(1000))
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(selected.length == 1,
      s"expected 1 pruned partition, got ${selected.length}")

    // results: identical to searching the full assignment in memory
    val fromIndex = res.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = spark.read.parquet(idxPath)
      .filter(col("cluster") === qCluster)
    graft.functions.GraftFunctions.register(spark)
    val expected = full
      .withColumn("sim", Num.r6(graft.functions.GraftFunctions.cosineSim(
        lit(qv).cast("array<double>"), col("v"))))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(Similarity.IvfTopK)
      .select(col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == expected)
    assert(fromIndex.head._1 == 0L && fromIndex.head._2 == 1.0,
      "the query vector itself must be its own nearest neighbor")
  }
}
