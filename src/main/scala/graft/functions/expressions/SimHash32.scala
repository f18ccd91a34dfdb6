package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd 32-bit SimHash over a pre-hashed feature array
  * (`array<long>` of 32-bit hashes, as produced by
  * [[graft.functions.TextFunctions.simhashHashes]]).
  *
  * Semantics identical to the composable
  * `TextFunctions.simhashOfHashes(hs, 32)`:
  * bit_b(out) = 1 iff Σ over items of (+1 if bit_b(h) else -1) > 0,
  * i.e. iff strictly more than half the items have bit b set. The
  * composable form is 32 interpreted `aggregate` passes over the
  * array (one per bit); this is ONE fused loop maintaining 32
  * counters inside whole-stage codegen.
  *
  * Null array → null; null element → null. (The composable form
  * counts a null element as a -1 vote via when/otherwise; hashes from
  * simhashHashes are never null, so the two agree on all real
  * inputs — the parity spec pins this.)
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  // a null ELEMENT yields null even when the array itself is
  // non-nullable (see the class doc) — without this the codegen
  // would assign to a constant-false isNull
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash32 requires array<long>, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) != 0L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      // votes = 2*set - n > 0  ⇔  set*2 > n
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
      final int $n = $a.numElements();
      final int[] $counts = new int[32];
      for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
        if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        final long $h = $a.getLong($i);
        for (int $b = 0; $b < 32; $b++) {
          if ((($h >>> $b) & 1L) != 0L) $counts[$b]++;
        }
      }
      if (!${ev.isNull}) {
        long $out = 0L;
        for (int $b = 0; $b < 32; $b++) {
          if ($counts[$b] * 2 > $n) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash32 = copy(child = newChild)
}
