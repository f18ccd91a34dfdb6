package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** Parity of the native one-pass featurizer with the six composable
  * forms it fuses — [[graft.functions.expressions.TextFeatures]] must
  * stay bit-identical on every feature, and the formula helpers over
  * the struct must reproduce qualityScoreRaw / modelScoreRaw exactly
  * (same IEEE doubles, not approximately).
  */
class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val corpus = Seq(
    "a pleasant document with the usual words in it and a reasonable length",
    "ALL CAPS SHOUTING!!!",
    "!!! ??? ,,, ...",
    "short",
    "",
    "   ",
    "\t\n",
    "  leading and trailing  ",
    "punctuation, mixed; with words. and the occasional CAPS",
    "unicode: café naïve 你好 Straße ÆØÅ tokens",
    "the the the the the of of to to in",
    "x" * 30000)

  private def df = corpus.toDF("text")
    .withColumn("f", GraftFunctions.textFeatures(col("text")))

  test("all six features are bit-identical to the composable forms") {
    val checks = df.select(
      col("text"),
      col("f.ntok") === tokenCount(col("text")).cast("long"),
      col("f.nsubw") === subwordCount(col("text")).cast("long"),
      col("f.meanlen") === meanTokenLength(col("text")),
      col("f.punct") === punctRatio(col("text")),
      col("f.upper_r") === upperRatio(col("text")),
      col("f.stop_r") === stopwordRatio(col("text"), EnglishStopwords))
    checks.collect().foreach { r =>
      (1 to 6).foreach { i =>
        assert(r.getBoolean(i),
          s"feature $i diverges on '${r.getString(0).take(40)}'")
      }
    }
  }

  test("quality and model scores over the struct match the raw forms") {
    val checks = df.select(
      col("text"),
      qualityScoreFromFeatures(col("f")) === qualityScoreRaw(col("text")),
      modelScoreFromFeatures(col("f")) === modelScoreRaw(col("text")))
    checks.collect().foreach { r =>
      assert(r.getBoolean(1), s"quality diverges on '${r.getString(0).take(40)}'")
      assert(r.getBoolean(2), s"model diverges on '${r.getString(0).take(40)}'")
    }
  }

  test("null text yields a null struct") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(GraftFunctions.textFeatures(col("text"))).collect()
    assert(r.head.isNullAt(0))
  }
}
