package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Tables

/** HLL sketch semantics beyond the oracle hash-gate: the estimate
  * lands within the estimator's error band, sketches of corpus halves
  * merge (elementwise register max) to exactly the whole-corpus
  * sketch, the result is independent of input partitioning, and the
  * register arithmetic honors its documented edges (w = 0 rank,
  * saturated vs linear-counting branch).
  */
class HllSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def events = Tables.t(spark, dir, "events")

  test("estimate within the error band of the exact distinct count") {
    val out = graft.queries.TimeSeries.eventsHllUsers(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val est = row.getAs[Double]("est_users")
      val exact = row.getAs[Long]("exact_users")
      // std error ≈ 1.04/√m ≈ 6.5% at m=256; 3.5σ band
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.23, f"relative error $rel%.3f (est $est%.1f vs $exact)")
    }
  }

  test("merge of disjoint halves equals the whole-corpus sketch") {
    val whole = HllSketch.registers(events, col("event_type"),
      col("user_id").cast("string"))
    val lo = HllSketch.registers(events.filter(col("user_id") % 2 === 0),
      col("event_type"), col("user_id").cast("string"))
    val hi = HllSketch.registers(events.filter(col("user_id") % 2 =!= 0),
      col("event_type"), col("user_id").cast("string"))
    val merged = HllSketch.merge(lo, hi)
    assert(HllSketch.estimate(merged).exceptAll(
      HllSketch.estimate(whole)).isEmpty)
    assert(HllSketch.estimate(whole).exceptAll(
      HllSketch.estimate(merged)).isEmpty)
  }

  test("merge is idempotent on overlapping inputs") {
    val regs = HllSketch.registers(events, col("event_type"),
      col("user_id").cast("string"))
    val twice = HllSketch.merge(regs, regs)
    assert(twice.exceptAll(regs).isEmpty && regs.exceptAll(twice).isEmpty)
  }

  test("result independent of input partitioning") {
    val a = HllSketch.estimate(HllSketch.registers(
      events.coalesce(1), col("event_type"),
      col("user_id").cast("string"))).collect().sortBy(_.getString(0))
    val b = HllSketch.estimate(HllSketch.registers(
      events.repartition(7), col("event_type"),
      col("user_id").cast("string"))).collect().sortBy(_.getString(0))
    assert(a.sameElements(b), s"partitioning changed the sketch")
  }

  test("rank edges: w = 0 scores MaxRank; small corpus takes linear counting") {
    import spark.implicits._
    // three distinct ids in one key: n_present ≤ 3 of 256 registers,
    // raw estimate far below 2.5m ⇒ the ln(m/V) branch must fire and
    // land within one of 3 (exactly 3 when buckets don't collide)
    val tiny = Seq("a", "b", "c").toDF("id").select(lit("k").as("k"), $"id")
    val est = HllSketch.estimate(
      HllSketch.registers(tiny, col("k"), col("id"))).collect().head
    val n = est.getAs[Long]("n_present")
    assert(n >= 1 && n <= 3)
    val e = est.getAs[Double]("est_distinct")
    val expected = 256.0 * math.log(256.0 / (256 - n))
    assert(math.abs(e - expected) < 1e-5, s"$e vs $expected")
  }

  test("rank of an all-zero window clamps to MaxRank (un-hittable by hashing)") {
    import spark.implicits._
    // feed literal hashes through the shared projection: a hash whose
    // low 52 bits are zero (probability 2^-52 through md5 — so this
    // path is pinned directly), plus the 1 and top-bit extremes
    val h0 = 5L << 52          // w = 0  -> rho = 53
    val h1 = (5L << 52) | 1L   // w = 1  -> rho = 52
    val h2 = (5L << 52) | (1L << 51) // top window bit -> rho = 1
    val regs = HllSketch.registersOfHashes(
        Seq(h0, h1, h2).toDF("h").select(lit("k").as("key"), col("h")))
      .collect()
    assert(regs.length == 1) // same bucket 5
    assert(regs.head.getAs[Int]("mj") == 53)
    val rhos = HllSketch.bucketRhoRows(
        Seq(h0, h1, h2).toDF("h").select(lit("k").as("key"), col("h")))
      .orderBy(col("rho")).collect().map(_.getAs[Int]("rho"))
    assert(rhos.toSeq == Seq(1, 52, 53))
  }

  test("null ids are ignored") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b")).toDF("id")
      .select(lit("k").as("k"), $"id")
    val regs = HllSketch.registers(df, col("k"), col("id"))
    val withNulls = regs.count()
    val without = HllSketch.registers(
      df.filter($"id".isNotNull), col("k"), col("id")).count()
    assert(withNulls == without)
  }
}
