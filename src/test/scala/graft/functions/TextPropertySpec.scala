package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** Seeded random-sweep properties for the sketch/text functions
  * (scalacheck-style; the scalatestplus bridge is not in the offline
  * cache, so sweeps use a fixed-seed generator). */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private def randDoc(maxTokens: Int = 80): String =
    Seq.fill(1 + rnd.nextInt(maxTokens))("w" + rnd.nextInt(200))
      .mkString(" ")

  /** Messy strings: mixed scripts, random whitespace runs, case,
    * punctuation — the adversarial input for normalize/tokenize
    * parity. */
  private def messyDoc(): String = {
    val alphabets = Seq("abcXYZ", "абвГДЕ", "äöüÉÑ", "中文字", "!?.,;:")
    val ws = Seq(" ", "  ", "\t", "\n", "", "\r\n", "\f")
    (0 until (1 + rnd.nextInt(40))).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      val tok = Seq.fill(1 + rnd.nextInt(6))(a(rnd.nextInt(a.length))).mkString
      tok + ws(rnd.nextInt(ws.length))
    }.mkString
  }

  test("property: native word_shingles/char_ngrams/minhash_sig match composable on messy unicode") {
    GraftFunctions.register(spark)
    val docs = Seq.fill(150)(messyDoc()) :+ "" :+ "\t\n " :+ "один"
    val df = docs.toDF("t")
      .withColumn("ns", GraftFunctions.wordShingles(col("t"), 3))
      .withColumn("cs", shingles(col("t"), 3))
      .withColumn("ng", GraftFunctions.charNgramsNative(col("t"), 4))
      .withColumn("cg", charNgrams(col("t"), 4))
      .withColumn("nh", GraftFunctions.ngramHashes(col("t"), 4))
      .withColumn("ch", shingleHashes(charNgrams(col("t"), 4)))
      .withColumn("nm", GraftFunctions.minhashSig(
        GraftFunctions.wordShingles(col("t"), 3), 8))
      .withColumn("cm", array((0 until 8).map(s =>
        minhashFromHashes(shingleHashes(shingles(col("t"), 3)), s)): _*))
    val rows = df.select(col("ns"), col("cs"), col("ng"), col("cg"),
      col("nh"), col("ch"), col("nm"), col("cm")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "word_shingles")
      assert(r.getSeq[String](2) == r.getSeq[String](3), "char_ngrams")
      assert(r.getSeq[Long](4).sorted == r.getSeq[Long](5).sorted,
        "ngram_hashes")
      assert(r.getSeq[Any](6) == r.getSeq[Any](7), "minhash_sig")
    }
  }

  test("property: word_gram_hashes and text_features match composable on messy unicode") {
    GraftFunctions.register(spark)
    val docs = Seq.fill(150)(messyDoc()) :+ "" :+ "\t\n " :+ "один два три"
    val df = docs.toDF("t")
      .withColumn("nw", GraftFunctions.wordGramHashes(col("t"), 3))
      .withColumn("cw", shingleHashes(wordNgrams(col("t"), 3)))
      .withColumn("f", GraftFunctions.textFeatures(col("t")))
      .withColumn("q1", qualityScoreFromFeatures(col("f")))
      .withColumn("q2", qualityScoreRaw(col("t")))
      .withColumn("m1", modelScoreFromFeatures(col("f")))
      .withColumn("m2", modelScoreRaw(col("t")))
    val rows = df.select(col("nw"), col("cw"), col("q1"), col("q2"),
      col("m1"), col("m2"), col("t")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"word_gram_hashes on '${r.getString(6).take(40)}'")
      assert(r.getDouble(2) == r.getDouble(3),
        s"quality on '${r.getString(6).take(40)}'")
      assert(r.getDouble(4) == r.getDouble(5),
        s"model on '${r.getString(6).take(40)}'")
    }
  }

  test("property: shingle count is max(1, n-k+1) for non-empty docs") {
    val docs = Seq.fill(100)(randDoc())
    val rows = docs.toDF("t").select(
      size(split(col("t"), " ")).as("n"),
      size(shingles(col("t"), 3)).as("s")).collect()
    rows.foreach { r =>
      val n = r.getInt(0)
      val s = r.getInt(1)
      assert(s == math.max(1, n - 2), s"n=$n s=$s")
    }
  }

  test("property: minhash signature of a doc with itself agrees fully") {
    val docs = Seq.fill(50)(randDoc())
    val df = docs.toDF("t")
      .withColumn("sig1", minhashSignature(col("t"), 8, 3))
      .withColumn("sig2", minhashSignature(col("t"), 8, 3))
    val agree = df.select(
      size(filter(zip_with(col("sig1"), col("sig2"),
        (a, b) => a === b), p => p))).collect()
    agree.foreach(r => assert(r.getInt(0) == 8))
  }

  test("property: jaccard is symmetric and within [0,1]") {
    val pairs = Seq.fill(50)((randDoc(30), randDoc(30)))
    val df = pairs.toDF("a", "b")
      .withColumn("ga", charNgrams(col("a"), 3))
      .withColumn("gb", charNgrams(col("b"), 3))
      .select(jaccard(col("ga"), col("gb")).as("j1"),
        jaccard(col("gb"), col("ga")).as("j2"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
    }
  }

  test("property: hamming(simhash(x), simhash(x)) = 0; bounded by bits") {
    val docs = Seq.fill(50)(randDoc())
    val df = docs.toDF("t")
      .withColumn("h1", simhash(col("t")))
      .withColumn("h2", simhash(col("t")))
      .withColumn("other", simhash(reverse(col("t"))))
    df.select(
      hammingDistance(col("h1"), col("h2")).as("self"),
      hammingDistance(col("h1"), col("other")).as("cross")).collect()
      .foreach { r =>
        assert(r.getInt(0) == 0)
        assert(r.getInt(1) >= 0 && r.getInt(1) <= 32)
      }
  }

  test("property: fingerprint is whitespace-insensitive, content-sensitive") {
    val docs = Seq.fill(50)(randDoc(20))
    val df = docs.toDF("t").select(
      fingerprint(col("t")).as("f1"),
      fingerprint(concat(lit("  "), regexp_replace(col("t"), " ", "   "),
        lit(" "))).as("f2"),
      fingerprint(concat(col("t"), lit(" extra"))).as("f3"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getString(0) != r.getString(2))
    }
  }
}
