package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Per-partition accumulator for [[VectorGram]]: row count, per-dim
  * sums, and the UPPER-TRIANGULAR second-moment sums (row-major,
  * `d·(d+1)/2` cells) — the symmetric half is materialized only at
  * [[VectorGram.eval]]. */
final class GramBuffer(val dim: Int) {
  var n: Long = 0L
  val sums: Array[Double] = new Array[Double](dim)
  val prods: Array[Double] = new Array[Double](dim * (dim + 1) / 2)
}

/** One-pass Gram / second-moment accumulator over an `array<double>`
  * column — the covariance-estimation kernel behind PCA whitening,
  * OPQ-style rotations, and embedding-drift statistics.
  *
  * The aggregation state is O(d²) and INDEPENDENT of the corpus: each
  * task folds its rows into `d` sums + `d·(d+1)/2` upper-triangular
  * product sums (2 080 doubles at d = 64), and the exchange carries
  * one such buffer per partition — the canonical "big data × small
  * model state" shape. Contrast the declarative formulation
  * (posexplode twice + groupBy (i, j) sum): same map-side compression
  * by hash aggregation, but it pays a hash-table probe per (i, j)
  * pair per row where this buffer pays one fused multiply-add.
  *
  * Result: struct `(n, sums, prods)` with `prods` expanded to the
  * FULL row-major d×d matrix (the upper triangle mirrored), so
  * downstream plans index `prods[i*d + j]` without triangular
  * arithmetic. Null vectors are skipped (SQL aggregate convention);
  * a vector of the wrong length or with null elements fails the job
  * loudly — a ragged embedding column is a data-contract violation,
  * not a row to silently drop (same discipline as the ONNX filters'
  * model-error contract).
  *
  * Reference anchor: DPF computes embedding statistics single-node
  * with numpy (`DPF/validators/format_validators`-adjacent tooling);
  * the distributed one-pass moment buffer is the Spark-first
  * re-expression.
  */
case class VectorGram(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer] {

  require(dim > 0 && dim <= 4096, s"vector_gram dim must be in [1, 4096], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_gram requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"vector_gram(dim=$dim): row has ${arr.numElements()} elements — " +
            "ragged embedding column")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"vector_gram(dim=$dim): null element at position $i")
        x(i) = arr.getDouble(i)
        i += 1
      }
      buf.n += 1L
      var k = 0
      i = 0
      while (i < dim) {
        val xi = x(i)
        buf.sums(i) += xi
        var j = i
        while (j < dim) {
          buf.prods(k) += xi * x(j)
          j += 1
          k += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.n += other.n
    var i = 0
    while (i < dim) { buf.sums(i) += other.sums(i); i += 1 }
    i = 0
    while (i < buf.prods.length) { buf.prods(i) += other.prods(i); i += 1 }
    buf
  }

  override def eval(buf: GramBuffer): Any = {
    // expand upper triangle to the full row-major d×d matrix
    val full = new Array[Double](dim * dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = buf.prods(k)
        full(i * dim + j) = v
        full(j * dim + i) = v
        j += 1
        k += 1
      }
      i += 1
    }
    InternalRow(buf.n,
      new GenericArrayData(buf.sums.clone()),
      new GenericArrayData(full))
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < dim) { out.writeDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < buf.prods.length) { out.writeDouble(buf.prods(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new GramBuffer(dim)
    buf.n = in.readLong()
    var i = 0
    while (i < dim) { buf.sums(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < buf.prods.length) { buf.prods(i) = in.readDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("prods", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_gram"

  override def withNewMutableAggBufferOffset(off: Int): VectorGram =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorGram =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorGram =
    copy(child = newChildren.head)
}
