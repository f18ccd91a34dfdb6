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

    val res = Similarity.annIvfFromIndex(spark, idxPath, qCluster, qv,
      excludeId = Some(0L))

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

    // results: identical to the INDEPENDENT in-memory IVF search
    // (annIvf recomputes the assignment from the raw embeddings —
    // if the partitioned write corrupted or dropped rows, the two
    // paths diverge here)
    val fromIndex = res.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = Similarity.annIvf(spark, dir)
      .filter(col("query_id") === 0)
      .orderBy(col("rk"))
      .select(col("neighbor_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == expected, s"$fromIndex vs $expected")
  }

  test("SQ8 postings: two-stage probe prunes both scans to one " +
      "partition; the coarse scan never reads the vectors; results " +
      "== the in-memory composition") {
    val idxPath = Files.createTempDirectory("graft-ivf-sq8").toString + "/idx"
    Similarity.buildIvfSq8Index(spark, dir, idxPath)
    val q = spark.read.parquet(idxPath).filter(col("vec_id") === 0)
      .select(col("cluster"), col("v"), col("codes")).collect().head
    val qCluster = q.getAs[Number](0).longValue()
    val qv = q.getSeq[Double](1).toArray
    val qcodes = q.getSeq[Double](2).toArray

    val res = Similarity.annIvfSq8FromIndex(spark, idxPath, qCluster,
      qv, qcodes, excludeId = Some(0L))

    // joins/limits make this plan adaptive — unwrap to reach the scans
    val root = res.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = root.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.foreach { scan =>
      assert(scan.partitionFilters.nonEmpty, scan.treeString.take(800))
      val selected = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      assert(selected.length == 1,
        s"expected 1 pruned partition, got ${selected.length}")
    }
    // the coarse scan's parquet projection excludes the 512-byte
    // vector column — the bandwidth claim lives in ReadSchema
    assert(scans.exists(s => s.requiredSchema.fieldNames.contains("codes")
        && !s.requiredSchema.fieldNames.contains("v")),
      scans.map(_.requiredSchema.fieldNames.mkString(",")).mkString(" | "))

    // same election as the in-memory composition for this query
    val fromIndex = res.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = Similarity.annIvfSq8(spark, dir)
      .filter(col("query_id") === 0)
      .orderBy(col("rk"))
      .select(col("neighbor_id"), col("xd")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == expected, s"$fromIndex vs $expected")
    spark.catalog.clearCache()
  }

  test("append: new vectors join their twin's cluster; other " +
      "partitions untouched; search finds them") {
    val idxPath = Files.createTempDirectory("graft-ivf-app").toString + "/idx"
    Similarity.buildIvfIndex(spark, dir, idxPath)
    val before = spark.read.parquet(idxPath)
      .groupBy("cluster").count().collect()
      .map(r => r.getAs[Number]("cluster").longValue() ->
        r.getLong(1)).toMap

    // duplicate vector 0 under a fresh id — bit-identical, so it must
    // land in vector 0's own cluster
    val twin = spark.read.parquet(idxPath).filter(col("vec_id") === 0)
      .select(col("cluster"), col("v")).collect().head
    val twinCluster = twin.getAs[Number](0).longValue()
    val newVecs = spark.read.parquet(idxPath)
      .filter(col("vec_id") === 0)
      .select(lit(999999L).as("vec_id"), col("v"))
    // file lists of untouched partitions, taken before the append
    val untouchedFiles = new java.io.File(idxPath).listFiles()
      .filter(f => f.getName.startsWith("cluster=") &&
        f.getName != s"cluster=$twinCluster")
      .map(f => f.getName -> f.listFiles().map(_.getName).sorted.toSeq)
      .toMap

    Similarity.appendToIvfIndex(spark, idxPath, newVecs)

    val after = spark.read.parquet(idxPath)
      .groupBy("cluster").count().collect()
      .map(r => r.getAs[Number]("cluster").longValue() ->
        r.getLong(1)).toMap
    assert(after(twinCluster) == before(twinCluster) + 1,
      s"twin cluster $twinCluster: ${before(twinCluster)} -> " +
        s"${after(twinCluster)}")
    assert((after - twinCluster) == (before - twinCluster),
      "append must not change any other cluster's size")
    // dynamic-partition append left every other partition's files alone
    untouchedFiles.foreach { case (part, files) =>
      val now = new java.io.File(idxPath, part)
        .listFiles().map(_.getName).sorted.toSeq
      assert(now == files, s"$part files changed by the append")
    }
    // probe-1 search in the twin's cluster surfaces the copy at sim 1
    val qv = twin.getSeq[Double](1).toArray
    val hits = Similarity.annIvfFromIndex(spark, idxPath, twinCluster,
      qv, excludeId = Some(0L)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hits.get(999999L).contains(1.0),
      s"appended twin must rank with sim 1.0, got $hits")
  }
}
