package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions.hash60
import graft.functions.expressions.PqCodes.round6
import graft.queries.Dedup

/** Streaming twins of the sketch operators — monitoring shapes for a
  * document feed (how many distinct documents has this pipeline seen,
  * without storing them?).
  *
  * The KMV sketch is MERGEABLE: the k smallest distinct hashes of a
  * union are computable from each part's k smallest distinct hashes,
  * so the streaming state is exactly the batch sketch folded over
  * micro-batches — the equality spec pins stream == batch on the
  * same corpus, bit-for-bit.
  */
object SketchStreams {

  /** One estimate per micro-batch; `batch` increments per trigger so
    * a consumer (and the spec) can pick the latest. */
  final case class KmvEstimate(batch: Long, n_kept: Long, kth_hash: Long,
      est_distinct: Double)

  /** State: triggers seen so far + the k smallest distinct hashes. */
  final case class KmvState(batch: Long, kept: Array[Long])

  /** Streaming KMV distinct-count over a document stream (schema must
    * contain `text`): per batch, a per-partition bounded heap caps
    * what shuffles to the single state key at ≤ k rows per partition
    * (the [[graft.queries.Dedup.kmvDistinct]] discipline — the state
    * group sees sketch-sized input, never the corpus), and the state
    * itself is the k-element sorted set. Emits the running estimate
    * after every trigger (Update mode).
    *
    * The single group key is not a bottleneck BY CONSTRUCTION: its
    * input is pre-capped to k·P longs per batch — the same reason the
    * batch TakeOrdered merge is driver-safe. */
  def kmvDistinctStream(docs: DataFrame, k: Int = Dedup.KmvK)
      : Dataset[KmvEstimate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val h = docs.select(hash60(col("text")).as("h"))
      .filter(col("h").isNotNull)
    val capped = h.as[Long].mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { v =>
        set.add(v)
        if (set.size > k) set.pollLast()
      }
      import scala.jdk.CollectionConverters._
      set.iterator().asScala.map(_.longValue())
    }
    capped.groupByKey(_ => 0)
      .flatMapGroupsWithState[KmvState, KmvEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Long], state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(0L, Array.empty))
          val set = new java.util.TreeSet[java.lang.Long]()
          prev.kept.foreach(v => set.add(v))
          it.foreach { v =>
            set.add(v)
            if (set.size > k) set.pollLast()
          }
          import scala.jdk.CollectionConverters._
          val kept = set.iterator().asScala.map(_.longValue()).toArray
          state.update(KmvState(prev.batch + 1, kept))
          val n = kept.length.toLong
          if (n == 0) Iterator.empty
          else {
            val kth = kept.last
            val est =
              if (n < k) n.toDouble
              else (k - 1.0) / (kth / Dedup.KmvScale)
            // r6 like the batch query, so stream == batch bit-for-bit
            Iterator(KmvEstimate(prev.batch + 1, n, kth, round6(est)))
          }
      }
  }

  /** One estimate per (key, micro-batch IN WHICH THE KEY RECEIVED
    * DATA) — `batch` is a per-key data-batch counter, not a global
    * trigger index (flatMapGroupsWithState does not invoke groups
    * with no input), so "latest per key" means each key's OWN max
    * batch. */
  final case class HllEstimate(batch: Long, key: String, n_present: Long,
      z_int: Long, est_distinct: Double)

  /** State: triggers seen + the 256 registers (ranks ≤ 53 fit a
    * byte — 256 bytes per key, the bounded-state HLL selling point). */
  final case class HllState(batch: Long, regs: Array[Byte])

  /** Streaming HLL distinct-count per key (the
    * [[graft.operators.HllSketch]] twin): registers merge by
    * elementwise max, so the state fold over micro-batches equals the
    * batch sketch bit-for-bit — [[HllStreamSpec]] pins it. The
    * per-partition pre-aggregation caps what shuffles to each state
    * key at ≤ 256 rows per partition per batch (the [[kmvDistinctStream]]
    * discipline — the state group sees sketch-sized input, never the
    * stream); estimate arithmetic is shared with the batch side
    * (integer harmonic sum, `round6` ≡ `r6`). */
  def hllDistinctStream(docs: DataFrame,
      key: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column)
      : Dataset[HllEstimate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.HllSketch
    import graft.operators.HllSketch.{M, MaxRank}
    val rows = HllSketch.bucketRhoRows(docs.filter(id.isNotNull)
        .select(key.cast("string").as("key"), hash60(id).as("h")))
      .select(col("key"), col("bucket").cast("int"),
        col("rho").cast("int"))
      .as[(String, Int, Int)]
    val capped = rows.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Array[Byte]]
      it.foreach { case (k, b, r) =>
        val regs = m.getOrElseUpdate(k, new Array[Byte](M))
        if (r > regs(b)) regs(b) = r.toByte
      }
      m.iterator.flatMap { case (k, regs) =>
        regs.iterator.zipWithIndex.collect {
          case (r, b) if r > 0 => (k, b, r.toInt)
        }
      }
    }
    capped.groupByKey(_._1)
      .flatMapGroupsWithState[HllState, HllEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Int, Int)],
            state: GroupState[HllState]) =>
          val prev = state.getOption.getOrElse(
            HllState(0L, new Array[Byte](M)))
          val regs = prev.regs.clone()
          it.foreach { case (_, b, r) =>
            if (r > regs(b)) regs(b) = r.toByte
          }
          state.update(HllState(prev.batch + 1, regs))
          var nPresent = 0L
          var z = 0L
          regs.foreach { r =>
            if (r > 0) { nPresent += 1; z += 1L << (MaxRank - r) }
            else z += 1L << MaxRank
          }
          if (nPresent == 0) Iterator.empty
          else Iterator(HllEstimate(prev.batch + 1, k, nPresent, z,
            round6(HllSketch.estimateScalar(nPresent, z))))
      }
  }

  /** One (row, bucket) counter cell per micro-batch in which the cell
    * received data — counters are ADDITIVE, so the running value is
    * the batch grid folded over triggers. */
  final case class CmsCell(batch: Long, r: Int, bucket: Long, cnt: Long)

  final case class CmsCellState(batch: Long, cnt: Long)

  /** Streaming count-min grid over a `term` stream — the additive
    * third of the streaming sketch trio (KMV and HLL above merge by
    * set-union and register-max; CMS counters merge by SUM, so the
    * state is one long per touched cell and the fold equals the
    * batch [[graft.queries.TextAnalysis.cmsCounters]] grid exactly —
    * [[CmsStreamSpec]] pins it). Per-batch traffic into each state
    * cell is pre-collapsed by the same d-fold projection + partial
    * count the batch side uses: the state group key is the (row,
    * bucket) cell, of which there are at most d·w. */
  def cmsCountersStream(terms: DataFrame): Dataset[CmsCell] = {
    val spark = terms.sparkSession
    import spark.implicits._
    import graft.queries.TextAnalysis.{CmsD, CmsW}
    val cells = terms.select(hash60(col("term")).as("h"))
      .filter(col("h").isNotNull)
      .select(posexplode(array((0 until CmsD).map(i =>
        graft.queries.TextAnalysis.cmsBucket(col("h"), i)): _*))
        .as(Seq("r", "bucket")))
      .as[(Int, Long)]
    // per-partition pre-aggregation: each partition contributes at
    // most d·w cells per batch, so the state shuffle is grid-sized,
    // never stream-sized (the kmv/hll twin discipline)
    val capped = cells.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
      it.foreach { rb => m.update(rb, m.getOrElse(rb, 0L) + 1L) }
      m.iterator.map { case ((r, b), c) => (r, b, c) }
    }
    capped.groupByKey { case (r, b, _) => (r, b) }
      .flatMapGroupsWithState[CmsCellState, CmsCell](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[(Int, Long, Long)],
            state: GroupState[CmsCellState]) =>
          val prev = state.getOption.getOrElse(CmsCellState(0L, 0L))
          var add = 0L
          it.foreach { case (_, _, one) => add += one }
          val next = CmsCellState(prev.batch + 1, prev.cnt + add)
          state.update(next)
          Iterator(CmsCell(next.batch, key._1, key._2, next.cnt))
      }
  }
}
