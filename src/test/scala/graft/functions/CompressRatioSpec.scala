package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties of the deflate redundancy signal: deterministic,
  * ordered the way a quality gate needs (repetitive ≪ natural ≪
  * random), and edge-safe. No oracle — zlib is not reproducible in
  * SQL engines — so the spec carries the verification. */
class CompressRatioSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below natural text; random stays high") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val repetitive = "spam ham " * 200
    val natural = Seq.fill(200)(Seq("the", "quick", "brown", "fox",
      "lazy", "dog", "jumps", "over")(rnd.nextInt(8))).mkString(" ")
    val random = Seq.fill(1600)(rnd.nextPrintableChar()).mkString
    val rows = Seq(repetitive, natural, random, "", null)
      .toDF("t")
      .select(GraftFunctions.compressRatio(col("t")).as("r")).collect()
    val Seq(rep, nat, ran) = rows.take(3).map(_.getDouble(0)).toSeq
    assert(rep < 0.1, s"repetitive=$rep")
    assert(rep < nat && nat < ran, s"$rep < $nat < $ran expected")
    assert(rows(3).getDouble(0) == 0.0) // empty
    assert(rows(4).isNullAt(0))         // null
  }

  test("RedundancyFilter enriches through the Processor pipeline") {
    val df = Seq((1L, "spam ham " * 50), (2L, "all tokens unique here now"))
      .toDF("doc_id", "text")
    val p = graft.sources.DatasetReader.fromDataFrame(df,
      graft.core.FilesConfig("/unused",
        Seq(graft.core.ColumnPayload(graft.core.Modality.Text, "text"))))
      .applyColumnFilter(graft.operators.RedundancyFilter())
    val rows = p.df.orderBy(col("doc_id"))
      .select("compress_ratio", "distinct_token_ratio", "top_token_share")
      .collect()
    assert(rows(0).getDouble(0) < 0.15)  // repetitive compresses away
    assert(rows(0).getDouble(1) == 0.02) // 2 distinct / 100 tokens
    assert(rows(0).getDouble(2) == 0.5)
    assert(rows(1).getDouble(1) == 1.0)  // all-unique doc
    assert(rows(1).getDouble(2) == 0.2)
  }

  test("deterministic across invocations and SQL-callable") {
    GraftFunctions.register(spark)
    val a = spark.sql("SELECT compress_ratio('abcabcabcabc')").collect()
      .head.getDouble(0)
    val b = spark.sql("SELECT compress_ratio('abcabcabcabc')").collect()
      .head.getDouble(0)
    assert(a == b && a > 0.0)
  }
}
