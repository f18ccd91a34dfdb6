package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over a shingle array (`array<string>`):
  * ONE md5 per shingle, then `numHashes` affine maps
  * `(a_k·h + b_k) mod P` (P = 2^31−1) whose minima form the
  * signature — all in a single fused JVM loop.
  *
  * Bit-identical to the composable formula
  * (TextFunctions.shingleHashes + minhashFromHashes): the base hash
  * is the first 15 hex chars of md5(shingle) parsed base-16, which
  * equals the big-endian unsigned value of the digest's first 8
  * bytes logically shifted right 4 bits. The parity spec pins the
  * equality.
  *
  * The composable form costs 1 + numHashes interpreted
  * higher-order-function passes per document (boxed lambda eval per
  * element, an intermediate array per pass, hex-string + conv parse
  * per shingle); this expression walks the shingle array once with
  * primitive arithmetic — the difference is ~10× on the sketch
  * stage of the dedup pipelines.
  *
  * Null semantics mirror `array_min(transform(...))`: null array →
  * null; null elements skipped; no (non-null) elements → every
  * signature entry null.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "minhash_sig requires numHashes > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(MinhashSignature.a)
  private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(MinhashSignature.b)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = numHashes
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = MinhashSignature.md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var u = 0L
        var j = 0
        while (j < 8) { u = (u << 8) | (d(j) & 0xffL); j += 1 }
        val hm = (u >>> 4) % MinhashSignature.P
        var s = 0
        while (s < k) {
          val v = (as(s) * hm + bs(s)) % MinhashSignature.P
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k)) // all-null entries
    else new GenericArrayData(mins)
  }

  /** Codegen keeps the surrounding whole-stage span; the body is the
    * compiled eval above via a bound reference (the work is the JVM
    * loop, not expression-tree dispatch, so nothing is lost). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.nullSafeEval($a);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)
}

object MinhashSignature {
  /** Mersenne prime 2^31−1: `h mod P < 2^31` and multipliers < 2^31
    * keep every product inside a signed 64-bit long — the same
    * arithmetic is reproducible in any engine with BIGINT math. */
  val P: Long = 2147483647L

  /** Knuth multiplicative constant spreads the seed; any fixed
    * nonzero multipliers work — the md5 base hash is already
    * uniform. */
  def a(seed: Int): Long = ((2L * seed + 1L) * 2654435761L) % P
  def b(seed: Int): Long = (seed * 2654435761L + 40503L) % P

  private[expressions] val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** This thread's digest instance (shared across the expressions). */
  private[expressions] def md5Digest: MessageDigest = md5.get()

  /** 60-bit md5-prefix hash of a UTF8String: first 8 digest bytes
    * big-endian, logically shifted right 4 — equal to parsing the
    * first 15 hex chars base-16, so any engine with md5 reproduces
    * the value (the shared base-hash recipe of every sketch here). */
  private[functions] def hash60(
      s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Digest
    md.reset()
    val d = md.digest(s.getBytes)
    var u = 0L
    var j = 0
    while (j < 8) { u = (u << 8) | (d(j) & 0xffL); j += 1 }
    u >>> 4
  }
}
