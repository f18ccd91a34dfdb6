package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a text column:
  * `compressed_bytes / raw_utf8_bytes` at a FIXED level, the
  * classic redundancy signal of training-data quality gates (highly
  * repetitive or templated documents compress far below natural
  * text; random noise sits near or above 1).
  *
  * Deflate with fixed level/strategy is deterministic, so the value
  * is reproducible run-to-run and across JVMs — but no SQL engine
  * mirrors zlib, so this expression is SPEC-verified (ordering and
  * determinism properties), not oracle-checked; it intentionally
  * lives outside the DuckDB-gated catalog.
  *
  * Empty text → 0.0 (flagged cheap); null → null.
  */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"compress_ratio requires string, got $t")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "compress_ratio"

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 0.0
    val d = CompressRatio.deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](256)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("compressRatio", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (Double) $ref.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CompressRatio = copy(child = newChild)
}

object CompressRatio {
  /** Fixed level ⇒ deterministic output; thread-local reuse avoids
    * per-row native-resource churn. The Deflater's native zlib buffer
    * is intentionally never end()ed — it lives for the thread's
    * lifetime, which on long-lived executor task threads is the right
    * trade (one ~256 KiB native block per thread vs a malloc/free per
    * row). Thread-churning hosts would leak; if that ever matters,
    * wrap in a ThreadLocal subclass whose remove() calls end(). */
  private val deflater: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6))
}
