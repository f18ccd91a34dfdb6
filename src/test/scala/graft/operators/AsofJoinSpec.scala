package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the union+window as-of join against the naive pair-join on
  * adversarial data: zipf-hot keys, exact-timestamp ties (both
  * between right rows and across the two sides), and keys with no
  * prior right row. The operator must return exactly what the
  * quadratic formulation returns — same rows, same tie-breaks.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  // hot key 0 holds ~half the rows; times collide often (mod 50)
  private def mkRows(n: Int) = (0 until n).map { i =>
    val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(20).toLong
    (i.toLong, k, rnd.nextInt(50).toLong)
  }
  private val leftRows = mkRows(400)
  private val rightRows = mkRows(300).map { case (i, k, t) =>
    (i, k, t, s"v$i")
  }

  private val left = leftRows.toDF("l_id", "key", "lts")
  private val right = rightRows.toDF("r_id", "key", "rts", "payload")

  private def naive(strict: Boolean) = {
    val cond = if (strict) col("r.rts") < col("l.lts")
      else col("r.rts") <= col("l.lts")
    val joined = left.as("l").join(right.as("r"),
      col("l.key") === col("r.key") && cond, "left")
      .select(col("l.l_id"), col("l.key"), col("l.lts"),
        struct(col("r.r_id"), col("r.payload")).as("p"),
        col("r.rts"))
    val w = Window.partitionBy(col("l_id"))
      .orderBy(col("rts").desc_nulls_last, col("p").desc_nulls_last)
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("l_id"), col("key"), col("lts"),
        col("p.r_id").as("r_id"), col("p.payload").as("payload"))
  }

  private def run(strict: Boolean) =
    AsofJoin.asofJoin(left, right, Seq("key"), "lts", "rts",
      Seq("r_id", "payload"), strict = strict)
      .select("l_id", "key", "lts", "r_id", "payload")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

  test("strict as-of equals the naive pair-join (prior = <)") {
    val (got, want) = (canon(run(strict = true)), canon(naive(strict = true)))
    assert(got.length == leftRows.length)
    assert(got.sameElements(want))
  }

  test("inclusive as-of equals the naive pair-join (prior = <=)") {
    val (got, want) = (canon(run(strict = false)), canon(naive(strict = false)))
    assert(got.sameElements(want))
  }

  test("left rows with no prior right row carry nulls") {
    val noMatch = run(strict = true).filter(col("r_id").isNull).count()
    assert(noMatch > 0, "fixture should include unmatched left rows")
  }

  test("one shuffle, no pair blow-up: plan has no join of the two inputs") {
    val plan = run(strict = true).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"asofJoin must not pair-join:\n$plan")
  }
}
