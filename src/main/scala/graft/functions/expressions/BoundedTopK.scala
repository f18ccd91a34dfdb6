package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k buffer: at most k rows, worst-first heap
  * so a better row evicts the current worst in O(log k). */
final class TopKBuffer(val heap: java.util.PriorityQueue[UnsafeRow])

/** Native exact per-group top-k aggregate — the scale-path
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY …)
  * <= k` when a group's partition is corpus-sized (ANN coarse scans:
  * every query's window partition is the whole corpus, so the
  * exchange carries N·Q rows to rank and immediately discard all but
  * k·Q).
  *
  * As a [[TypedImperativeAggregate]] it gets the aggregation
  * machinery's map-side combine: each task keeps one bounded heap of
  * at most `k` rows per group (the TakeOrdered discipline), so the
  * exchange carries at most partitions·groups·k rows — the data-size
  * term drops out of the shuffle entirely. Results are EXACT, not
  * approximate: a group's true top-k within a partition is a superset
  * of its contribution to the global top-k.
  *
  * Input is a struct whose FIRST `sortSpec.length` fields are the
  * ranking key ('a' = ascending, 'd' = descending per char, NULLS
  * FIRST asc / NULLS LAST desc — Spark's window-ORDER BY defaults);
  * remaining fields are carried payload. The result is the group's
  * rows as an array of structs in rank order (callers `posexplode`
  * and add 1 for a row_number-identical rank). Callers MUST make the
  * ranking key total (include a unique tiebreak field) or merge order
  * decides survivors among ties — same contract as the row_number
  * formulation it replaces.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    sortSpec: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"bounded_topk needs k > 0, got $k")
  require(sortSpec.nonEmpty && sortSpec.forall(c => c == 'a' || c == 'd'),
    s"sortSpec must be one 'a'/'d' char per ranking field, got '$sortSpec'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length >= sortSpec.length =>
      // unorderable ranking fields (maps) would otherwise fail at the
      // first heap comparison in a 2+-row group — a runtime task
      // error deep in the aggregate instead of an analysis error
      val bad = s.fields.take(sortSpec.length).filterNot(f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType))
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bounded_topk ranking fields must be orderable; " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}")
            .mkString(", ") + " are not")
    case s: StructType => TypeCheckResult.TypeCheckFailure(
      s"bounded_topk struct has ${s.length} fields but sortSpec " +
        s"'$sortSpec' names ${sortSpec.length} ranking fields")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_topk requires a struct input, got $other")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** Rank order over the leading sort fields (bound by position, so
    * it applies to both fresh and deserialized rows). */
  private lazy val ordering = new InterpretedOrdering(
    sortSpec.zipWithIndex.map { case (c, i) =>
      val f = structType(i)
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (c == 'd') Descending else Ascending)
    })

  /** Heap comparator is the REVERSE rank order: peek() is the worst
    * retained row — the eviction candidate. */
  private def newHeap() = new java.util.PriorityQueue[UnsafeRow](
    k + 1, (a: UnsafeRow, b: UnsafeRow) => ordering.compare(b, a))

  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(newHeap())

  private def insert(buf: TopKBuffer, row: UnsafeRow): Unit =
    if (buf.heap.size < k) buf.heap.add(row)
    else if (ordering.compare(row, buf.heap.peek) < 0) {
      buf.heap.poll()
      buf.heap.add(row)
    }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // reject-first: once the heap is full almost every row loses to
      // the current worst, so compare the raw struct row BEFORE
      // paying the UnsafeRow projection + copy (the ordering binds by
      // position and works on any InternalRow). Only accepted rows
      // materialize.
      if (buf.heap.size < k) buf.heap.add(toUnsafe(row).copy())
      else if (ordering.compare(row, buf.heap.peek) < 0) {
        buf.heap.poll()
        buf.heap.add(toUnsafe(row).copy())
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  // NON-destructive (no poll-drain): the registry makes this function
  // usable as a window aggregate (`bounded_topk(...) OVER (...)`),
  // where the engine calls eval repeatedly on a LIVE buffer that will
  // still receive updates — draining it would silently corrupt every
  // later frame.
  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.heap.toArray(new Array[UnsafeRow](buf.heap.size))
    java.util.Arrays.sort(rows,
      (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b))
    new GenericArrayData(rows.asInstanceOf[Array[AnyRef]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(newHeap())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.heap.add(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bounded_topk"

  override def withNewMutableAggBufferOffset(off: Int): BoundedTopK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BoundedTopK =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}
