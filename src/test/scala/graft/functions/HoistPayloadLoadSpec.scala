package graft.functions

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.SparkSpec
import graft.functions.expressions.LoadBytes

/** The payload-load pushdown rule (SURVEY §4.2): `load_bytes(path)`
  * written BELOW joins/filters/sorts must execute ABOVE them — bytes
  * never ride an exchange, and rows discarded by a filter are never
  * read at all.
  */
class HoistPayloadLoadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    GraftFunctions.register(spark)
    val d = Files.createTempDirectory("graft-hoist").toFile
    Seq("a" -> 11, "b" -> 23, "c" -> 37).foreach { case (n, sz) =>
      Files.write(new File(d, s"$n.bin").toPath,
        Array.tabulate[Byte](sz)(_.toByte))
    }
    d.getAbsolutePath
  }

  // parquet-backed (a LocalRelation would short-circuit the plan:
  // ConvertToLocalRelation evaluates projections at plan time)
  private lazy val metaPath: String = {
    val p = s"$dir/meta.parquet"
    Seq(("a", 1, s"$dir/a.bin"), ("b", 2, s"$dir/b.bin"),
      ("c", 1, s"$dir/c.bin")).toDF("name", "key", "path")
      .write.mode("overwrite").parquet(p)
    p
  }
  private def meta: DataFrame = spark.read.parquet(metaPath)

  private def pathsDf(rows: Seq[(String, Boolean)]): DataFrame = {
    val p = s"$dir/paths_${rows.hashCode}.parquet"
    rows.toDF("path", "keep").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def containsLoad(p: LogicalPlan): Boolean =
    p.expressions.exists(_.exists(_.isInstanceOf[LoadBytes]))

  private def shuffleBinaryLeaks(plan: SparkPlan): (Seq[String], Int) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var visited = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: ShuffleExchangeLike =>
          visited += 1
          s.child.output.foreach { a =>
            if (a.dataType == BinaryType) out += a.name
          }
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    (out.toSeq, visited)
  }

  test("load written below a join+sort runs above them; no bytes in exchanges") {
    val dim = Seq((1, "odd"), (2, "even")).toDF("key", "parity")
    val q = meta
      .withColumn("bytes", GraftFunctions.loadBytes(col("path")))
      .join(dim, "key")
      .orderBy("name")
      .select(col("name"), col("parity"), length(col("bytes")).as("len"))

    // logical: the projection computing LoadBytes has the Join BELOW it
    val loadProj = q.queryExecution.optimizedPlan.collectFirst {
      case p: Project if containsLoad(p) => p
    }
    assert(loadProj.isDefined, q.queryExecution.optimizedPlan.treeString)
    assert(loadProj.get.exists(_.isInstanceOf[Join]),
      s"load not hoisted above the join:\n${q.queryExecution.optimizedPlan}")

    // physical: no BinaryType in any shuffle, with broadcast disabled
    // so the join genuinely exchanges both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (leaks, visited) = shuffleBinaryLeaks(q.queryExecution.executedPlan)
      val rows = q.collect().map(r =>
        (r.getString(0), r.getString(1), r.getInt(2)))
      assert(visited > 0, "walk went vacuous")
      assert(leaks.isEmpty, s"bytes rode a shuffle: $leaks")
      assert(rows.toSeq ==
        Seq(("a", "odd", 11), ("b", "even", 23), ("c", "odd", 37)))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("rows discarded by a filter are never loaded") {
    // the bogus path only survives if the strict load runs above the
    // metadata filter — eager evaluation would throw FileNotFound
    val df = pathsDf(Seq((s"$dir/a.bin", true), (s"$dir/missing.bin", false)))
      .withColumn("bytes", GraftFunctions.loadBytes(col("path")))
      .filter(col("keep"))
      .select(length(col("bytes")).as("len"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(11))
  }

  test("a consumer between load and filter blocks the hoist there") {
    // filter ON the bytes: the load must stay below it, and the bogus
    // path now genuinely fails the strict load
    val df = pathsDf(Seq((s"$dir/a.bin", true), (s"$dir/missing.bin", false)))
      .withColumn("bytes", GraftFunctions.loadBytes(col("path")))
      .filter(length(col("bytes")) > 5)
    val e = intercept[Exception](df.collect())
    assert(e.toString.contains("FileNotFound") ||
      Option(e.getCause).exists(_.toString.contains("FileNotFound")) ||
      e.getMessage.contains("missing.bin"))
  }

  test("try_load_bytes yields null on missing files") {
    val df = pathsDf(Seq((s"$dir/a.bin", true), (s"$dir/missing.bin", true)))
      .select("path")
      .withColumn("bytes", GraftFunctions.tryLoadBytes(col("path")))
      .select(col("path"), isnull(col("bytes")).as("miss"))
    val m = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!m(s"$dir/a.bin"))
    assert(m(s"$dir/missing.bin"))
  }

  test("load hoists above a limit (SQL surface)") {
    meta.createOrReplaceTempView("hoist_meta")
    val q = spark.sql(
      "SELECT name, length(load_bytes(path)) AS len " +
        "FROM hoist_meta ORDER BY name LIMIT 2")
    val loadProj = q.queryExecution.optimizedPlan.collectFirst {
      case p: Project if containsLoad(p) => p
    }
    assert(loadProj.isDefined)
    assert(loadProj.get.exists(p =>
      p.nodeName.contains("Limit") || p.nodeName.contains("Sort")),
      s"load not above limit/sort:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 11), ("b", 23)))
  }

  test("tar member paths are refused with an actionable error") {
    val df = pathsDf(Seq((s"$dir/shard.tar!member.jpg", true)))
      .select("path")
      .withColumn("bytes", GraftFunctions.loadBytes(col("path")))
    val e = intercept[Exception](df.collect())
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("applyDataFilter") || msg.contains("tar"),
      msg.take(500))
  }
}
