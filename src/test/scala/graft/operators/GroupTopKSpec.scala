package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[GroupTopK]] — exact equality with the row_number window idiom it
  * replaces (ranks included), plus the plan-shape guarantee that makes
  * it the scale path: a PARTIAL bounded-top-k aggregate below the
  * exchange, so the shuffle carries at most partitions·groups·k rows
  * instead of the full input. */
class GroupTopKSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic multi-group data with ties in the sort value (the
    * id tiebreak decides), string payload, and several input
    * partitions so partial/merge/serialize paths all run. */
  private def data(): DataFrame =
    (1 to 400).map { i =>
      val g = s"g${i % 7}"
      val v = (i * 37 % 50).toDouble // collisions on purpose
      (g, i.toLong, v, s"tag-$i")
    }.toDF("g", "id", "v", "tag").repartition(8)

  private def windowed(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id"))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("g", "rk", "id", "v", "tag")
  }

  test("matches the window formulation exactly, ranks included") {
    val df = data()
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", true), ("id", false)),
      k = 5)
      .select("g", "rk", "id", "v", "tag")
    val expected = windowed(df, 5)
    assert(got.collect().toSet == expected.collect().toSet)
    assert(got.count() == 7 * 5)
  }

  test("groups smaller than k return all their rows") {
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("b", 3L, 9.0))
      .toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", false), ("id", false)),
      k = 10).select("g", "rk", "id", "v").collect().toSet
    assert(got.map(r => (r.getString(0), r.getInt(1), r.getLong(2))) ==
      Set(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 3L)))
  }

  test("NULL sort values follow the window defaults (NULLS FIRST asc, " +
      "NULLS LAST desc)") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(1.0)))
      .toDF("g", "id", "v")
    val asc = GroupTopK.topK(df, Seq("g"), Seq(("v", false), ("id", false)),
      k = 2).select("rk", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(asc == Set((1, 2L), (2, 3L))) // null ranks first ascending
    val desc = GroupTopK.topK(df, Seq("g"), Seq(("v", true), ("id", false)),
      k = 2).select("rk", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(desc == Set((1, 1L), (2, 3L))) // null ranks last descending
  }

  test("plan shape: partial bounded-top-k below the exchange, no Window") {
    val df = data()
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", true), ("id", false)),
      k = 5)
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(2000))
    // TypedImperativeAggregate plans as ObjectHashAggregate: a partial
    // pass BELOW the exchange (bounded heap per task per group) and
    // the merge pass above — the exchange carries only the bounded
    // buffers, never the input rows
    val exchangeAt = p.indexOf("Exchange hashpartitioning")
    assert(exchangeAt >= 0, p.take(2000))
    val below = p.substring(exchangeAt)
    assert(below.contains("ObjectHashAggregate") &&
      below.contains("bounded_topk"), p.take(2000))
    assert(p.substring(0, exchangeAt).contains("ObjectHashAggregate"),
      p.take(2000))
  }

  test("bounded_topk survives WINDOW-aggregate usage — eval must not " +
      "drain the live buffer") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("a", 3L, 2.0))
      .toDF("g", "id", "v").createOrReplaceTempView("btk_win")
    // running top-2 per row: eval fires once per frame on the SAME
    // buffer that keeps receiving updates — a destructive eval would
    // return shrinking/empty arrays on later frames
    val rows = spark.sql(
      """SELECT id, transform(
           bounded_topk(struct(v, id), 2, 'a') OVER (
             PARTITION BY g ORDER BY id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           s -> s.id) AS top_ids
         FROM btk_win ORDER BY id""").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(rows(1L) == List(1L), rows)
    assert(rows(2L) == List(2L, 1L), rows) // v=1.0 now best
    assert(rows(3L) == List(2L, 3L), rows) // running top-2 of {3,1,2}
  }

  test("an unorderable ranking field fails at ANALYSIS, not as a " +
      "runtime task error in 2+-row groups") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "id")
      .withColumn("m", map(col("id"), col("id")))
    val e = intercept[Exception] {
      GroupTopK.topK(df, Seq("g"), Seq(("m", false), ("id", false)), 2)
        .collect()
    }
    assert(e.getMessage.contains("orderable"), e.getMessage)
  }

  test("multi-column group keys and ascending ranks") {
    val df = Seq(
      ("x", 1, 10L, 2.0), ("x", 1, 11L, 1.0), ("x", 2, 12L, 5.0),
      ("y", 1, 13L, 4.0), ("y", 1, 14L, 3.0))
      .toDF("a", "b", "id", "v")
    val got = GroupTopK.topK(df, Seq("a", "b"),
      Seq(("v", false), ("id", false)), k = 1)
      .select("a", "b", "rk", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(got == Set(("x", 1, 1, 11L), ("x", 2, 1, 12L), ("y", 1, 1, 14L)))
  }
}
