package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass heuristic language ID — the fused form of
  * [[graft.functions.TextFunctions.langId]]:
  *
  *  - any CJK code point (U+4E00–U+9FFF)      → "zh"
  *  - any Cyrillic code point (U+0400–U+04FF) → "ru"
  *  - else argmax of marker-word hit counts over
  *    [[graft.functions.TextFunctions.LangMarkers]] (first-wins ties,
  *    zero hits → "und")
  *
  * Bit-identical to the composable fold (the parity spec pins it):
  * script checks run as code-point range scans over the ORIGINAL text
  * — the same code-point semantics as the composable `rlike` char
  * classes — and marker counting lowercases via the same
  * `UTF8String.toLowerCase` as the built-in `lower`, tokenizes on the
  * same Java `\s+` as the built-in `split`, and counts every
  * occurrence (not distinct hits), exactly like
  * `size(filter(tokens, t => array_contains(markers, t)))`.
  *
  * Why native: the composable argmax is a fold of nested CASEs whose
  * branches each re-reference the per-language score expressions;
  * interpreted projection (HOFs disable whole-stage codegen) has no
  * common-subexpression elimination, so each duplicated reference
  * re-tokenizes the document — measured ~0.5 ms/row at sf0.1. One JVM
  * pass is ~µs/row. Same rationale as [[WordShingles]] (NOTES.md
  * interpreted-HOF rule).
  *
  * Null text → null.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lang_id requires string, got $t")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any = {
    val original = input.asInstanceOf[UTF8String].toString
    // script checks on the original text, code-point-wise (Java regex
    // char classes match per code point; surrogate pairs never match a
    // BMP-only class, so supplementary code points correctly miss)
    var i = 0
    val n = original.length
    while (i < n) {
      val cp = original.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) return LangId.Zh
      i += Character.charCount(cp)
    }
    i = 0
    while (i < n) {
      val cp = original.codePointAt(i)
      if (cp >= 0x0400 && cp <= 0x04ff) return LangId.Ru
      i += Character.charCount(cp)
    }
    // marker counts over whitespace tokens of the lowercased text
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val raw = WordShingles.Ws.split(lowered)
    val counts = new Array[Int](LangId.Langs.length)
    var t = 0
    while (t < raw.length) {
      if (raw(t).nonEmpty) {
        val li = LangId.MarkerLang.get(raw(t))
        if (li != null) counts(li) += 1
      }
      t += 1
    }
    // first-wins argmax (strictly-greater replaces, list order wins)
    var best = 0
    var bestScore = counts(0)
    var l = 1
    while (l < counts.length) {
      if (counts(l) > bestScore) { best = l; bestScore = counts(l) }
      l += 1
    }
    if (bestScore == 0) LangId.Und else LangId.Langs(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
          $ref.nullSafeEval($a);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangId = copy(child = newChild)
}

object LangId {
  import graft.functions.TextFunctions.LangMarkers

  private val Langs: Array[UTF8String] =
    LangMarkers.map(m => UTF8String.fromString(m._1)).toArray
  private val Zh = UTF8String.fromString("zh")
  private val Ru = UTF8String.fromString("ru")
  private val Und = UTF8String.fromString("und")

  /** marker word → language index; marker sets are disjoint across
    * languages (asserted), so one flat map suffices. */
  private val MarkerLang: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for (((_, ms), li) <- LangMarkers.zipWithIndex; w <- ms) {
      val prev = m.put(w, li)
      assert(prev == null,
        s"marker '$w' appears in two languages — flat map invalid")
    }
    m
  }
}
