package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text featurizer: the six deterministic per-document
  * features every scoring query consumes, computed from ONE
  * tokenization + one lowercase + the three character-class regex
  * passes —
  *
  *   ntok      whitespace token count
  *   nsubw     BPE-ish subword count (ceil(len/4) per word chunk)
  *   meanlen   mean token length in code points (0.0 when empty)
  *   punct     non-alphanumeric non-space character ratio
  *   upper_r   uppercase-letter / letter ratio (0.0 when no letters)
  *   stop_r    stopword-token fraction of the lowercased tokens
  *
  * Bit-identical to the composable forms in
  * [[graft.functions.TextFunctions]] (`tokenCount`, `subwordCount`,
  * `meanTokenLength`, `punctRatio`, `upperRatio`,
  * `stopwordRatio(_, EnglishStopwords)`) — same Java `\s+` split the
  * built-in `split` compiles, same `UTF8String.toLowerCase` as the
  * built-in `lower`, same Java regexes `regexp_replace` runs, code
  * points counted the way `length` counts them; parity specs pin all
  * six. The composable forms re-tokenize per feature through
  * interpreted HOF lambdas (stopwordRatio alone walks a 20-element
  * array per token) — ~0.5 ms/doc at the 100× corpus, which made the
  * corpus-decile quality gate aggregation-bound on a projection.
  *
  * Null text → null struct (every downstream formula null-propagates
  * exactly as the composable forms do).
  */
case class TextFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"text_features requires string, got $t")
    }

  override def dataType: DataType = TextFeatures.Schema

  override def prettyName: String = "text_features"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val raw = u.toString

    // whitespace tokens of the RAW text: count + summed code points
    var ntok = 0L
    var sumLen = 0L
    val rawToks = TextFeatures.Ws.split(raw)
    var i = 0
    while (i < rawToks.length) {
      val t = rawToks(i)
      if (t.nonEmpty) {
        ntok += 1
        sumLen += t.codePointCount(0, t.length)
      }
      i += 1
    }
    val meanlen = if (ntok == 0) 0.0 else sumLen.toDouble / ntok.toDouble

    // subwords: word/non-word chunks, ceil(len/4) per chunk
    var nsubw = 0L
    val words = TextFeatures.NonWord.split(raw)
    i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) nsubw += (w.codePointCount(0, w.length) + 3L) / 4L
      i += 1
    }

    // character-class ratios on the raw text
    val totalChars = raw.codePointCount(0, raw.length)
    val punct =
      if (totalChars == 0) 0.0
      else {
        val kept = TextFeatures.PunctKill.matcher(raw).replaceAll("")
        (totalChars - kept.codePointCount(0, kept.length)).toDouble /
          totalChars.toDouble
      }
    val letters = TextFeatures.NonLetter.matcher(raw).replaceAll("")
    val nLetters = letters.codePointCount(0, letters.length)
    val upperR =
      if (nLetters == 0) 0.0
      else {
        val uppers = TextFeatures.NonUpper.matcher(raw).replaceAll("")
        uppers.codePointCount(0, uppers.length).toDouble /
          nLetters.toDouble
      }

    // stopword fraction over tokens of the LOWERED text (same
    // UTF8String.toLowerCase the built-in `lower` applies)
    val lowToks = TextFeatures.Ws.split(u.toLowerCase.toString)
    var nLow = 0L
    var hits = 0L
    i = 0
    while (i < lowToks.length) {
      val t = lowToks(i)
      if (t.nonEmpty) {
        nLow += 1
        if (TextFeatures.Stopwords.contains(t)) hits += 1
      }
      i += 1
    }
    val stopR = if (nLow == 0) 0.0 else hits.toDouble / nLow.toDouble

    new GenericInternalRow(
      Array[Any](ntok, nsubw, meanlen, punct, upperR, stopR))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textFeatures", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
          $ref.nullSafeEval($a);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TextFeatures = copy(child = newChild)
}

object TextFeatures {
  /** Field order is load-bearing: queries read by name, but the eval
    * fills positionally. */
  val Schema: StructType = StructType(Seq(
    StructField("ntok", LongType, nullable = false),
    StructField("nsubw", LongType, nullable = false),
    StructField("meanlen", DoubleType, nullable = false),
    StructField("punct", DoubleType, nullable = false),
    StructField("upper_r", DoubleType, nullable = false),
    StructField("stop_r", DoubleType, nullable = false)))

  private val Ws: Pattern = Pattern.compile("\\s+")
  /** Same patterns the composable forms pass to split/regexp_replace. */
  private val NonWord: Pattern = Pattern.compile("[^\\p{L}\\p{N}]+")
  private val PunctKill: Pattern = Pattern.compile("[^\\p{L}\\p{N}\\s]")
  private val NonLetter: Pattern = Pattern.compile("[^\\p{L}]")
  private val NonUpper: Pattern = Pattern.compile("[^\\p{Lu}]")

  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFunctions.EnglishStopwords.foreach(s.add)
    s
  }
}
