package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** Pins the native [[graft.functions.expressions.MinhashSignature]]
  * expression to the composable formula it fuses
  * (shingleHashes + minhashFromHashes per seed): bit-equality on real
  * docs and agreement on the null/empty edge cases. If either side
  * changes, this must fail.
  */
class MinhashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  test("native minhash_sig is bit-identical to the composable formula") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m n o p",
      "short",
      "repeat repeat repeat repeat repeat",
      "Punctuation, and CASE; should not   matter here!").toDF("t")
    val both = docs
      .withColumn("sh", shingles(col("t"), 3))
      .withColumn("native", GraftFunctions.minhashSig(col("sh"), K))
      .withColumn("hs", shingleHashes(col("sh")))
      .withColumn("composed",
        array((0 until K).map(s => minhashFromHashes(col("hs"), s)): _*))
    val rows = both.select(col("native"), col("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("null text and empty shingle set: all-null signature entries") {
    GraftFunctions.register(spark)
    val df = Seq(Some(""), None).toDF("t")
      .withColumn("sig",
        GraftFunctions.minhashSig(shingles(col("t"), 3), K))
    val rows = df.select(col("sig")).collect()
    // empty doc -> empty shingles -> array of K nulls
    assert(rows(0).getSeq[Any](0).length == K)
    assert(rows(0).getSeq[Any](0).forall(_ == null))
    // null text -> null shingles -> null signature
    assert(rows(1).isNullAt(0))
  }

  test("native word_shingles is bit-identical to the composable shingles") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "  Leading and   trailing whitespace\t mixed\nlines  ",
      "Русский Текст С Разными СЛОВАМИ здесь",
      "one two",
      "exactly three tokens",
      "a b c d e f g",
      "",
      "single").toDF("t")
    for (k <- Seq(1, 3, 8)) {
      val rows = docs
        .withColumn("native", GraftFunctions.wordShingles(col("t"), k))
        .withColumn("composed", shingles(col("t"), k))
        .select(col("native"), col("composed")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
      }
    }
  }

  test("SQL surface: minhash_sig callable after register") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 4) AS s")
      .selectExpr("size(s)").collect().head.getInt(0)
    assert(n == 4)
  }
}
