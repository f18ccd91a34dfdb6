package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.DatasetConfig

/** The pipeline-facing rank stages ([[Processor.topKPerGroup]] /
  * [[Processor.globalRank]]): a pipeline author writing the natural
  * window idiom gets the scale-safe plans (bounded heaps / two-pass
  * prefix offsets) with identical results — ranks included — and the
  * plan never contains the trap shape (corpus-sized window partition /
  * single-reducer window). */
class ProcessorRankSpec extends SparkSpec {

  import spark.implicits._

  private def proc() = Processor(
    (1 to 300).map { i =>
      (s"g${i % 5}", i.toLong, (i * 41 % 97).toDouble, s"p$i")
    }.toDF("g", "id", "score", "payload").repartition(7),
    DatasetConfig.filesImageText("/nonexistent.csv"))

  test("topKPerGroup == the row_number window idiom, ranks included") {
    val p = proc()
    val got = p.topKPerGroup(Seq("g"), Seq(("score", true), ("id", false)),
      k = 4).df.select("g", "rk", "id", "score", "payload")
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    val want = p.df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .select("g", "rk", "id", "score", "payload")
    assert(got.collect().toSet == want.collect().toSet)
    assert(got.count() == 5 * 4)
    // the scale guarantee: no Window operator in the physical plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("globalRank == row_number over the total order, no global window") {
    val p = proc()
    val got = p.globalRank(Seq(col("score").desc, col("id"))).df
      .select("id", "ord")
    val w = Window.orderBy(col("score").desc, col("id"))
    val want = p.df.withColumn("ord", row_number().over(w).cast("long"))
      .select("id", "ord")
    assert(got.collect().toSet == want.collect().toSet)
  }

  test("stages compose with the Processor surface and keep the config") {
    val p = proc()
    val out = p.filterRows(col("score") > 10)
      .topKPerGroup(Seq("g"), Seq(("score", true), ("id", false)), k = 2)
      .globalRank(Seq(col("score").desc, col("id")), rankCol = "overall")
    assert(out.config == p.config)
    assert(out.df.columns.toSeq.contains("rk"))
    assert(out.df.count() == 10)
    // the curriculum shape: global order over the per-group winners
    val ords = out.df.select("overall").as[Long].collect().sorted
    assert(ords.toSeq == (1L to 10L))
  }
}
