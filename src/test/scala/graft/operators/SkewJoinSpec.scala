package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = (Seq.fill(500)("hot") ++ (1 to 50).map("k" + _))
    .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "lv")
  private lazy val right = (Seq("hot") ++ (1 to 50).map("k" + _))
    .map(k => (k, k.length)).toDF("key", "rv")

  test("saltedJoin equals the plain join result") {
    val plain = left.join(right, Seq("key"))
      .select("key", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(left, right, "key", factor = 8)
      .select("key", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == 550)
    assert(plain.sameElements(salted))
  }

  test("saltedJoinHotKeys equals the plain join result") {
    val hot = SkewJoin.hotKeyProfile(left, "key", threshold = 0.5)
    assert(hot == Seq("hot"))
    val plain = left.join(right, Seq("key"))
      .select("key", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    val mixed = SkewJoin.saltedJoinHotKeys(left, right, "key",
      hotKeys = hot, factor = 4)
      .select("key", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(plain.sameElements(mixed))
  }

  test("salting spreads a hot key across partitions") {
    val salted = left.filter(col("key") === "hot")
      .withColumn("__salt", (rand(42L) * 8).cast("int"))
    val distinctSalts = salted.select("__salt").distinct().count()
    assert(distinctSalts > 4, s"only $distinctSalts salt values used")
  }
}
