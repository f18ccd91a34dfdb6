package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** Parity of the native one-pass language ID with the composable fold
  * it replaces — [[graft.functions.expressions.LangId]] must return
  * exactly what `TextFunctions.langId` returns on every script, tie,
  * and whitespace shape (the q_text_langid oracle mirrors the fold's
  * semantics in SQL, so native == fold keeps the oracle meaningful).
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val corpus = Seq(
    // clear marker wins
    "the cat and the hat is on the mat with it",
    "der hund und die katze ist nicht ein tier mit",
    "le chat et la maison est que une des",
    "el perro los gatos es una por para con",
    // scripts dominate markers
    "the and of 你好 world",            // CJK wins over en markers
    "привет the and of to is that",     // Cyrillic wins
    "你好",                              // CJK only
    "ёлка",                             // U+0451 inside 0400-04ff
    // ties and zero hits
    "xyzzy plugh quux",                 // no markers -> und
    "",                                 // empty -> und
    "   \t\n ",                         // whitespace only -> und
    "the der",                          // 1-1 tie -> first list order (en)
    "le el le el",                      // 2-2 fr/es tie -> fr
    "und",                              // 'und' is a de marker!
    "is ist est es",                    // four-way 1-tie -> en
    // case + whitespace robustness
    "THE AND OF TO IS THAT IT WITH",
    "  the\tand\nof  to ",
    // supplementary plane chars (surrogate pairs) must NOT hit the
    // BMP-only script classes
    "😀 the and of emoji",
    "𠀀 xyzzy",               // U+20000 (CJK ext B): NOT in 4e00-9fff
    "multi the und und der die word")   // de outnumbers en

  test("native lang_id == composable langId fold on every shape") {
    val df = corpus.toDF("text").select(
      col("text"),
      GraftFunctions.langIdNative(col("text")).as("native"),
      langId(col("text")).as("composable"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"mismatch on '${r.getString(0)}': " +
          s"native=${r.getString(1)} composable=${r.getString(2)}")
    }
  }

  test("null text yields null") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(GraftFunctions.langIdNative(col("text"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("expected labels on the canonical cases") {
    val got = Seq(
      "the cat and the hat is on the mat with it",
      "der hund und die katze ist nicht ein tier mit",
      "привет мир", "你好 world", "xyzzy", "the der", "le el le el")
      .toDF("text")
      .select(GraftFunctions.langIdNative(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "de", "ru", "zh", "und", "en", "fr"))
  }
}
