package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The materialized postings layout: a BM25 probe against the
  * term-partitioned index must (a) prune the scan to the query
  * terms' partition directories — asserted on the physical plan —
  * and (b) rank identically to the in-memory postings-join plan on
  * the documents both can see (the index probe cannot surface
  * zero-score docs, by construction).
  */
class Bm25IndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("index probe prunes to the query terms' partitions and ranks identically") {
    val idxPath = Files.createTempDirectory("graft-bm25idx").toString + "/idx"
    TextAnalysis.buildPostingsIndex(spark, dir, idxPath)

    val res = TextAnalysis.bm25FromIndex(spark, idxPath)

    // inspect BEFORE execution: AQE's post-run plan hides scans
    // inside materialized query stages, while the initial adaptive
    // plan still holds the full tree. Pick the PARTITIONED scan (the
    // stats scan has no partition columns).
    val top = res.queryExecution.executedPlan
    val inner = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = inner.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScanExec in\n${inner.treeString}")
    val scan = scans.find(_.partitionFilters.nonEmpty)
      .getOrElse(fail(s"no partition-filtered scan in\n${inner.treeString}"))
    // the broadcast join adds a DYNAMIC pruning filter on top of the
    // static IN — list files under the static predicates only
    val staticFilters = scan.partitionFilters.filterNot(_.find(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
        .DynamicPruningExpression]).isDefined)
    assert(staticFilters.nonEmpty, scan.treeString.take(1000))
    val selected = scan.relation.location.listFiles(
      staticFilters, scan.dataFilters)
    assert(selected.length == TextAnalysis.Bm25Terms.length,
      s"expected ${TextAnalysis.Bm25Terms.length} pruned partitions, " +
        s"got ${selected.length}")
    // vocabulary is larger than the query — pruning is real
    val vocab = spark.read.parquet(s"$idxPath/postings")
      .select(col("term")).distinct().count()
    assert(vocab > TextAnalysis.Bm25Terms.length)

    val fromIndex = res.collect().map(_.toSeq)
    val expected = TextAnalysis.bm25TopKJoin(spark, dir)
      .filter(col("score") > 0).collect().map(_.toSeq)
      .take(TextAnalysis.Bm25TopN)
    assert(fromIndex.sameElements(expected),
      s"${fromIndex.toSeq} vs ${expected.toSeq}")
  }
}
