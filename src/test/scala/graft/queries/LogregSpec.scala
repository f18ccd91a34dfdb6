package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gradient-step semantics beyond the oracle hash-gate: on a
  * linearly separable synthetic corpus the learned weights move the
  * class-indicative features apart in the right direction, the output
  * is capped at the hashed feature-space size, and the result is
  * independent of input partitioning (the gradient is a sum — order
  * free up to the pinned rounding).
  */
class LogregSpec extends SparkSpec {

  /** Write a documents table where English docs say `good` words and
    * the rest say `bad` words — separable by construction. */
  private def writeCorpus(dirSuffix: String): String = {
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "quality signal prose", "en")
      else (i.toLong, "ruido basura texto", "es")
    }
    val tmp = Files.createTempDirectory(s"graft-logreg-$dirSuffix").toString
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("src0").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("separable corpus: english features gain weight, others lose it") {
    val dir = writeCorpus("sep")
    val w = Curation.logregStep(spark, dir).collect()
      .map(r => r.getAs[Long]("f") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("w1"), r.getAs[Double]("w2")))
      .toMap
    // recover each word's feature id through the same hash pipeline
    def fOf(word: String): Long = {
      import spark.implicits._
      Seq(word).toDF("text")
        .select((graft.functions.TextFunctions.hash60(col("text"))
          % lit(Curation.LrFeatures)).as("f"))
        .head().getLong(0)
    }
    val en = Seq("quality", "signal", "prose").map(fOf)
    val es = Seq("ruido", "basura", "texto").map(fOf)
    en.foreach { f =>
      val (n, w1, w2) = w(f)
      assert(n == 20L)
      assert(w1 > 0 && w2 > w1,
        s"english feature $f should gain weight: w1=$w1 w2=$w2")
    }
    es.foreach { f =>
      val (n, w1, w2) = w(f)
      assert(n == 20L)
      assert(w1 < 0 && w2 < w1,
        s"non-english feature $f should lose weight: w1=$w1 w2=$w2")
    }
  }

  test("output never exceeds the hashed feature space") {
    val out = Curation.logregStep(spark, "/root/testdata/sf0.001")
    assert(out.count() <= Curation.LrFeatures)
  }

  test("result independent of input partitioning") {
    val dir = writeCorpus("parts")
    val a = Curation.logregStep(spark, dir).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val many = Files.createTempDirectory("graft-logreg-p7").toString
    spark.read.parquet(s"$dir/documents.parquet").repartition(7)
      .write.parquet(s"$many/documents.parquet")
    val b = Curation.logregStep(spark, many).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.sameElements(b))
  }
}
