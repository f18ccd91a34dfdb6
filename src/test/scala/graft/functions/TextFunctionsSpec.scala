package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).collect().head.get(0)

  test("tokens drops empties and splits on any whitespace") {
    assert(one(tokenCount(col("t")), "  a\t b\n  c  ") == 3)
    assert(one(tokenCount(col("t")), "") == 0)
    assert(one(tokenCount(col("t")), "   ") == 0)
  }

  test("meanTokenLength of empty doc is 0") {
    assert(one(meanTokenLength(col("t")), "") == 0.0)
    assert(one(meanTokenLength(col("t")), "ab abcd") == 3.0)
  }

  test("punct and upper ratios") {
    assert(one(punctRatio(col("t")), "abcd") == 0.0)
    assert(one(punctRatio(col("t")), "a!b!") == 0.5)
    assert(one(upperRatio(col("t")), "AaBb") == 0.5)
    assert(one(upperRatio(col("t")), "1234") == 0.0)
  }

  test("normalize collapses whitespace and lowercases") {
    assert(one(normalize(col("t")), "  Foo   BAR\tbaz ") == "foo bar baz")
  }

  test("fingerprint equals md5 of normalized text") {
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("foo bar".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(one(fingerprint(col("t")), " Foo   Bar ") == expected)
  }

  test("shingles: n<=k yields one shingle, n>k yields n-k+1") {
    assert(one(size(shingles(col("t"), 3)), "a b") == 1)
    assert(one(size(shingles(col("t"), 3)), "a b c d e") == 3)
    assert(one(element_at(shingles(col("t"), 3), 1), "a b c d") == "a b c")
    assert(one(size(shingles(col("t"), 3)), "") == 0)
  }

  test("langId picks marker language, script overrides, und fallback") {
    assert(one(langId(col("t")), "the cat and the dog is here") == "en")
    assert(one(langId(col("t")), "der hund und die katze ist nicht da") == "de")
    assert(one(langId(col("t")), "xyzzy qwerty") == "und")
    assert(one(langId(col("t")), "你好 world") == "zh")
    assert(one(langId(col("t")), "привет") == "ru")
  }

  test("simhash is order-insensitive and set-sensitive") {
    val a = one(simhash(col("t")), "alpha beta gamma delta")
    val b = one(simhash(col("t")), "delta gamma beta alpha")
    val c = one(simhash(col("t")), "alpha beta gamma epsilon zeta")
    assert(a == b)
    assert(a != c)
    assert(a.asInstanceOf[Long] >= 0L)
  }

  test("hammingDistance counts differing bits") {
    val df = Seq((0L, 7L)).toDF("a", "b")
    val d = df.select(hammingDistance(col("a"), col("b")).as("d"))
      .collect().head.get(0)
    assert(d.toString.toInt == 3)
  }

  test("minhash signature: identical docs agree, signature length k") {
    val df = Seq("w1 w2 w3 w4 w5 w6", "w1 w2 w3 w4 w5 w6", "zz yy xx ww vv uu")
      .toDF("t")
      .select(minhashSignature(col("t"), 8, 3).as("sig"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).length == 8)
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val r = df.select(jaccard(col("a"), col("b")).as("j")).collect()
      .map(_.getDouble(0))
    assert(r.sameElements(Array(1.0, 0.0, 0.0)))
  }

  test("qualityScore stays in [0,1] on varied inputs") {
    val docs = Seq("", "ALL CAPS SHOUTING!!!", "a pleasant document with " +
      "the usual words in it and a reasonable length",
      "!!! ??? ,,, ...", "short")
    val scores = docs.toDF("t")
      .select(qualityScore(col("t")).as("q")).collect().map(_.getDouble(0))
    scores.foreach(s => assert(s >= 0.0 && s <= 1.0, s"score $s"))
  }

  test("wordNgrams: positional grams, short docs yield empty array") {
    def grams(n: Int, text: String): Seq[String] =
      one(wordNgrams(col("t"), n), text)
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(grams(2, "A b c") == Seq("a b", "b c"))
    assert(grams(3, "a b c") == Seq("a b c"))
    assert(grams(4, "a b c").isEmpty)
    assert(grams(2, "").isEmpty)
  }

  test("topItemShare: most frequent element's occurrence share") {
    assert(one(topItemShare(wordNgrams(col("t"), 2)), "x y x y x y")
      == 3.0 / 5.0) // bigrams: x y, y x, x y, y x, x y
    assert(one(topItemShare(wordNgrams(col("t"), 2)), "a b c d")
      == 1.0 / 3.0) // all distinct
    assert(one(topItemShare(wordNgrams(col("t"), 2)), "a") == 0.0)
  }
}
