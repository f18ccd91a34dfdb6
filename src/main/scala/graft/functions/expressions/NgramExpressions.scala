package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character-n-gram set of a text column: normalize
  * (lowercase, collapse whitespace, trim) → all length-n code-point
  * substrings, first-occurrence order — one JVM pass.
  *
  * Bit-identical to the composable `TextFunctions.charNgrams(text, n)`
  * (`array_distinct(transform(sequence(...), i -> substr(t, i, n)))`
  * over the normalized text): substrings go through the same
  * `UTF8String.substringSQL` the built-in `substr` uses (code-point
  * counting), and `array_distinct` keeps first occurrences in
  * encounter order, as the LinkedHashSet here does. Parity spec pins
  * the equality. Null text → null; empty normalized text → empty
  * array; shorter than n → the whole text as the single element.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "char_ngrams requires n > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires string, got $t")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val grams = CharNgrams.distinctGrams(input.asInstanceOf[UTF8String], n)
    val out = new Array[Any](grams.size())
    val it = grams.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgrams", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($a);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharNgrams = copy(child = newChild)
}

object CharNgrams {
  /** Same pattern the composable normalize passes to regexp_replace. */
  private[expressions] val Ws: Pattern = Pattern.compile("\\s+")

  /** Space-only trim — the built-in `trim` (and DuckDB's) strips ' '
    * only, while Java's String.trim strips every char ≤ U+0020; using
    * the latter would break bit-parity on control-char input. */
  private def trimSpaces(s: String): String = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi)
  }

  /** The shared normalize→distinct-n-gram walk of [[CharNgrams]] and
    * [[NgramHashes]] (single source of truth for the parity-critical
    * recipe): lowercase via UTF8String.toLowerCase, collapse \s+ runs
    * to single spaces, space-trim, then all length-n code-point
    * substrings in first-occurrence order; shorter-than-n text is a
    * single whole-text gram; empty text yields the empty set. */
  private[expressions] def distinctGrams(input: UTF8String, n: Int)
      : java.util.LinkedHashSet[UTF8String] = {
    val lowered = input.toLowerCase.toString
    val norm = UTF8String.fromString(
      trimSpaces(Ws.matcher(lowered).replaceAll(" ")))
    val len = norm.numChars()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (len < n) {
      if (len > 0) seen.add(norm)
    } else {
      var i = 1
      while (i <= len - n + 1) {
        seen.add(norm.substringSQL(i, n))
        i += 1
      }
    }
    seen
  }
}

/** Native distinct character-n-gram 60-bit hash set: the same
  * normalize → length-n substrings walk as [[CharNgrams]], but each
  * distinct gram leaves as its md5-prefix hash (the
  * [[MinhashSignature]] base-hash recipe: first 8 digest bytes
  * big-endian, logically shifted right 4 — equal to parsing the
  * first 15 hex chars base-16, so DuckDB reproduces every value).
  *
  * This is the scale representation for n-gram verify joins: a long
  * array costs a flat memcpy through join row-writers where a string
  * array pays per-element offset bookkeeping, and set intersection
  * over primitive longs needs no hashing or boxing at all
  * ([[JaccardSim]]'s sorted-merge path). Bit-identical to the
  * composable `shingleHashes(charNgrams(text, n))` modulo element
  * order (both produce the same SET; jaccard is order-blind — the
  * parity spec compares sorted).
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "ngram_hashes requires n > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes requires string, got $t")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val grams = CharNgrams.distinctGrams(input.asInstanceOf[UTF8String], n)
    val out = new Array[Long](grams.size())
    val it = grams.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = MinhashSignature.hash60(it.next()); j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashes", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($a);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashes = copy(child = newChild)
}

/** Native Jaccard similarity of two arrays treated as sets:
  * |A∩B| / |A∪B| in one pass instead of the interpreted
  * `array_intersect` + `array_union` (which allocate both result
  * arrays only to take their sizes). String arrays go through a
  * hash-set; long arrays (hashed feature sets, [[NgramHashes]]) take
  * a sort+merge path with no boxing at all.
  *
  * Bit-identical to `TextFunctions.jaccard`: distinct semantics on
  * both sides, null elements count as one distinct value (as the
  * built-in set ops treat them), empty union → 0.0, null array →
  * null. The division is exact-same-operand double division, so the
  * value is reproducible to the bit.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim requires two array<string> or two array<long>, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaccard_sim"

  private lazy val longInputs: Boolean = left.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (longInputs) evalLongs(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else evalStrings(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** Sorted-merge set overlap of two long arrays (dedups both sides
    * while merging); null elements count as one distinct value per
    * side, like the built-in set ops. */
  private def evalLongs(a: ArrayData, b: ArrayData): Any = {
    def nonNulls(arr: ArrayData): (Array[Long], Boolean) = {
      val m = arr.numElements()
      val out = new Array[Long](m)
      var k = 0; var hasNull = false
      var i = 0
      while (i < m) {
        if (arr.isNullAt(i)) hasNull = true
        else { out(k) = arr.getLong(i); k += 1 }
        i += 1
      }
      (java.util.Arrays.copyOf(out, k), hasNull)
    }
    val (xs, nullA) = nonNulls(a)
    val (ys, nullB) = nonNulls(b)
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0
    var common = 0; var distinctA = 0; var distinctB = 0
    while (i < xs.length || j < ys.length) {
      val takeA = j >= ys.length || (i < xs.length && xs(i) <= ys(j))
      val takeB = i >= xs.length || (j < ys.length && ys(j) <= xs(i))
      if (takeA && takeB) common += 1
      if (takeA) { val v = xs(i); distinctA += 1
        while (i < xs.length && xs(i) == v) i += 1 }
      if (takeB) { val v = ys(j); distinctB += 1
        while (j < ys.length && ys(j) == v) j += 1 }
    }
    val inter = common + (if (nullA && nullB) 1 else 0)
    val union = distinctA + distinctB - common +
      (if (nullA || nullB) 1 else 0)
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  private def evalStrings(a: ArrayData, b: ArrayData): Any = {
    val setA = new java.util.HashSet[UTF8String]()
    var nullA = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String]()
    var nullB = false
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) nullB = true
      else setB.add(b.getUTF8String(j))
      j += 1
    }
    var common = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) common += 1
    val inter = common + (if (nullA && nullB) 1 else 0)
    val union = setA.size() + setB.size() - common +
      (if (nullA || nullB) 1 else 0)
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardSim", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (Double) $ref.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}
