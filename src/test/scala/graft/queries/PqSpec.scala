package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product-quantization semantics beyond the oracle hash-gates:
  * codes stay in the codebook range, an exact copy of a codebook
  * seed encodes to the seed's own codes with zero quantized
  * distance, ADC ranks an exact duplicate first with distance 0,
  * and the encode plan is a pure map — no join and no aggregate
  * touches the corpus (the codebook rides as a literal).
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Deterministic unit-ish vector for seed `i`. */
  private def vec(i: Int): Seq[Float] =
    (0 until Similarity.Dim).map(j => ((i * 31 + j * 7) % 13 - 6) / 6.0f)

  /** Controlled corpus: [[Similarity.PqK]] distinct seeds, one exact
    * copy of seed 3 (id 100), one far outlier (id 101). */
  private def controlled(): String = {
    val rows =
      (0 until Similarity.PqK).map(i => (i.toLong, vec(i), 0)) ++
        Seq((100L, vec(3), 0),
          (101L, (0 until Similarity.Dim).map(_ => 50.0f), 0))
    val tmp = Files.createTempDirectory("graft-pq-spec").toString
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("codes in range; copy of a seed shares the seed's codes") {
    val tmp = controlled()
    val codes = Similarity.pqEncode(spark, tmp).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    assert(codes.size == Similarity.PqK + 2)
    codes.values.foreach(_.foreach(c =>
      assert(c >= 0 && c < Similarity.PqK)))
    // seed 3's segments are distance 0 from codeword 3 — its copy
    // must quantize identically (dd tie-break cannot diverge: both
    // rows run the same argmin over the same literal codebook)
    assert(codes(100L) == codes(3L))
    // seed 3's own-code distance is zero and no EARLIER codeword
    // shares any of its segments (vec aliases repeat mod 13 — seeds
    // 13..15 duplicate seeds 0..2 and tie-break DOWN to them — but
    // 5k≡2 (mod 13) has no solution below 3), so code == id
    assert(codes(3L) == Seq.fill(Similarity.PqM)(3L))
    assert(codes(13L) == codes(0L), "aliased seed must tie-break down")
  }

  test("ADC: exact duplicate ranks first with distance 0") {
    val tmp = controlled()
    // copy id 100 is outside the query set (vec_id < NumQueries), so
    // query 3 must find it at rank 1 with adist 0 (all 8 subspace
    // distances quantize to the same codeword at distance 0)
    val top = Similarity.annPqAdc(spark, tmp)
      .filter(col("query_id") === 3 && col("rk") === 1).collect().head
    assert(top.getAs[Long]("neighbor_id") == 100L)
    assert(top.getAs[Double]("adist") == 0.0)
  }

  test("encode plan: no join, no aggregate — codebook is a literal") {
    val plan = Similarity.pqEncode(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in encode plan:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"unexpected aggregate in encode plan:\n$plan")
  }

  test("native encoder is bit-identical to the HOF formulation") {
    val native = Similarity.pqEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hof = Similarity.pqEncodeHof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(native.nonEmpty && native == hof)
  }

  test("round6 matches Spark's Round on boundary values") {
    import spark.implicits._
    val xs = Seq(0.0, 1.0000005, 0.1234565, 0.1234575, 2.5e-7,
      4.999999e-7, 5.000001e-7, 123.4567895, 1e-9, -0.0000005,
      0.9999995, 17.250000499999, 17.2500005)
    val sparkSide = xs.toDF("x")
      .selectExpr("round(x + 1e-9, 6) r").collect().map(_.getDouble(0))
    val nativeSide =
      xs.map(graft.functions.expressions.PqCodes.round6)
    assert(sparkSide.toSeq == nativeSide,
      s"spark=${sparkSide.toSeq} native=$nativeSide")
    // non-finite values pass through like Spark's Round (BigDecimal
    // would throw)
    assert(graft.functions.expressions.PqCodes.round6(Double.NaN).isNaN)
    assert(graft.functions.expressions.PqCodes
      .round6(Double.PositiveInfinity).isPosInfinity)
  }

  // ---- driver-side ADC recomputation helpers (real-data tests) ----

  private lazy val eVecs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
  private lazy val cbVecs: Seq[Array[Double]] =
    (0 until Similarity.PqK).map(k => eVecs(k.toLong))

  private def r6(x: Double): Double =
    math.floor((x + 1e-9) * 1e6 + 0.5) / 1e6
  private def sub(v: Array[Double], c: Array[Double], m: Int): Double =
    r6((0 until Similarity.PqSubDim).map { j =>
      val d = v(m * Similarity.PqSubDim + j) - c(m * Similarity.PqSubDim + j)
      d * d
    }.sum)
  private def codesOf(v: Array[Double]): Seq[Int] =
    (0 until Similarity.PqM).map(m =>
      (0 until Similarity.PqK).minBy(k => (sub(v, cbVecs(k), m), k)))
  private def adist(q: Array[Double], v: Array[Double]): Double =
    r6(codesOf(v).zipWithIndex.map { case (c, m) => sub(q, cbVecs(c), m) }.sum)

  test("native ADC walk equals the composable walk; nulls explicit") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // parity on well-formed input (real codes never leave [0, K) —
    // the HOF form THROWS on out-of-range under ANSI element_at, so
    // the native's null there is strictly more defensive)
    val ok = Seq(
      (Seq(Seq(0.1, 0.2), Seq(0.3, 0.4)), Seq(1, 0)),
      (Seq(Seq(1.5, -2.25), Seq(0.0, 4.5)), Seq(0, 1)))
      .toDF("lut", "codes")
    ok.select(
      Similarity.pqAdcDistHof(col("lut"), col("codes")).as("h"),
      Num.r6(graft.functions.GraftFunctions
        .adcDist(col("lut"), col("codes"))).as("n")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"$r"))
    // native null semantics: out-of-range code, length mismatch
    val bad = Seq(
      (Seq(Seq(0.1, 0.2), Seq(0.3, 0.4)), Seq(5, 0)),
      (Seq(Seq(0.1, 0.2)), Seq(0, 1))).toDF("lut", "codes")
    bad.select(graft.functions.GraftFunctions
      .adcDist(col("lut"), col("codes")).as("n")).collect()
      .foreach(r => assert(r.isNullAt(0), s"expected null: $r"))
  }

  test("ADC agrees with driver-side recomputation on real data") {
    val got = Similarity.annPqAdc(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(math.abs(r.getAs[Double]("adist") - adist(eVecs(q), eVecs(n))) < 1e-9,
        s"adist mismatch for query $q neighbor $n")
    }
  }

  test("pqTrainStep: refined codeword is the mean of its voters") {
    val tmp = controlled()
    val refined = Similarity.pqTrainStep(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    refined.keys.foreach { case (m, k, j) =>
      assert(m >= 0 && m < Similarity.PqM)
      assert(k >= 0 && k < Similarity.PqK)
      assert(j >= 0 && j < Similarity.PqSubDim)
    }
    // every populated cell equals the driver-side mean of its voters
    // (voters recomputed with the same rounded-argmin rule)
    val vecs: Seq[(Long, Array[Double])] =
      ((0 until Similarity.PqK).map(i => i.toLong -> vec(i).map(_.toDouble).toArray) ++
        Seq(100L -> vec(3).map(_.toDouble).toArray,
          101L -> Array.fill(Similarity.Dim)(50.0))).toSeq
    val cbc = vecs.take(Similarity.PqK).map(_._2)
    def subC(v: Array[Double], c: Array[Double], m: Int): Double =
      r6((0 until Similarity.PqSubDim).map { j =>
        val d = v(m * Similarity.PqSubDim + j) - c(m * Similarity.PqSubDim + j)
        d * d
      }.sum)
    val want = (for {
      (_, v) <- vecs
      m <- 0 until Similarity.PqM
      k = (0 until Similarity.PqK).minBy(k => (subC(v, cbc(k), m), k))
      j <- 0 until Similarity.PqSubDim
    } yield ((m.toLong, k.toLong, j.toLong), v(m * Similarity.PqSubDim + j)))
      .groupBy(_._1).view
      .mapValues(xs => r6(xs.map(_._2).sum / xs.size)).toMap
    assert(refined.keySet == want.keySet)
    want.foreach { case (cell, w) =>
      assert(math.abs(refined(cell) - w) < 1e-9,
        s"cell $cell: got ${refined(cell)}, want $w")
    }
  }

  test("IVF+PQ: neighbors confined to the query's cluster, adist exact") {
    val assign = Similarity.ivfAssign(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val got = Similarity.annIvfPq(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(assign(n) == assign(q),
        s"neighbor $n of query $q not in the query's cluster")
      assert(math.abs(r.getAs[Double]("adist") - adist(eVecs(q), eVecs(n))) < 1e-9,
        s"adist mismatch for query $q neighbor $n")
    }
  }
}
