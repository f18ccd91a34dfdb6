package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60
import graft.queries.Num.r6

/** Deterministic HyperLogLog (Flajolet et al. 2007) on the md5
  * fingerprint die — the mergeable distinct-count sketch the catalog's
  * exact `count(DISTINCT ...)` aggregates relax into once uniques stop
  * being affordable (the gap noted at
  * [[graft.queries.TimeSeries.eventsHourlyUsers]]: Spark's own
  * `approx_count_distinct` is HLL++ with a JVM-internal xxhash, so no
  * external oracle can re-derive its registers; this sketch derives
  * bucket and rank from the same 60-bit md5 prefix the rest of the
  * sketch family uses — [[graft.queries.Dedup.kmvDistinct]], minhash,
  * simhash — so a DuckDB oracle reproduces every register and the
  * estimate bit-for-bit).
  *
  * Layout: m = 256 registers (b = 8). For each value's 60-bit hash
  * `h`, bucket = top 8 bits (`h >> 52`), and the rank is the leading-
  * zero count of the remaining 52-bit window plus one, computed as
  * `53 - bitlength(w)` via the engine-portable `length(bin(w))` (both
  * Spark and DuckDB print minimal binary strings). A register is the
  * max rank seen in its bucket — max is associative, commutative and
  * idempotent, which is the whole scale story: partial aggregation
  * combines map-side, the shuffle carries at most `groups × m` rows
  * regardless of corpus size, and sketches of disjoint corpora merge
  * by elementwise max ([[HllSketchSpec]] pins both properties).
  *
  * Estimate determinism: the harmonic sum is kept in INTEGER
  * arithmetic — `Z = Σ 2^(53 − M_j)` over all m registers (absent
  * register ⇒ rank 0 ⇒ 2^53) is an exact BIGINT < 2^62, so no
  * floating-point re-association can perturb it; the estimate is then
  * a single IEEE division `alphaZ / Z` of a literal by that exact
  * integer. The small-range branch (E ≤ 2.5m with empty registers ⇒
  * linear counting `m·ln(m/V)`, Flajolet §4) is one `ln` whose
  * cross-libm ulp wiggle the catalog's epsilon-round absorbs.
  *
  * Reference context: DPF's duplicate accounting is exact pandas
  * `duplicated()` over in-memory frames (DPF/processors/
  * helpers.py-level dedup); a 100 TB monitoring pass needs the
  * mergeable-sketch form instead.
  */
object HllSketch {

  /** Register count m = 2^8. */
  val M = 256

  /** Rank ceiling: 52 usable bits below the bucket field, +1. */
  val MaxRank = 53

  /** alpha_m · m² · 2^53 for m = 256 — the numerator of the raw
    * estimate, pre-scaled so the runtime computes ONE division by the
    * exact integer Z. The 2^53 factor is a power of two, so this
    * literal is the exact scaling of alpha_m·m². */
  val AlphaZ: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0

  /** Linear-counting threshold 2.5·m (Flajolet §4). */
  val SmallRangeCeiling: Double = 2.5 * 256.0

  /** Low 52 bits of the 60-bit hash — the rank window. */
  private val WindowMask = (1L << 52) - 1

  /** (key, bucket, rho) rows of a (key, h) frame — the SHARED
    * projection of batch and streaming sketches (one copy of the
    * bucket split and the `length(bin(w))` rank, so the bit-for-bit
    * stream == batch contract has a single derivation to drift). */
  def bucketRhoRows(hashed: DataFrame): DataFrame =
    hashed
      .select(col("key"), expr("h >> 52").as("bucket"),
        (col("h").bitwiseAND(lit(WindowMask))).as("w"))
      .select(col("key"), col("bucket"),
        when(col("w") === 0L, lit(MaxRank))
          .otherwise(lit(MaxRank) - length(bin(col("w")))).as("rho"))

  /** Registers of a pre-hashed (key, h) frame. */
  def registersOfHashes(hashed: DataFrame): DataFrame =
    bucketRhoRows(hashed)
      .groupBy(col("key"), col("bucket"))
      .agg(max(col("rho")).as("mj"))

  /** Per-key HLL registers of `id`: one row per (key, bucket) with the
    * max rank `mj`. `id` must be a string column (the md5 die is over
    * its UTF-8 bytes); null ids are ignored, hashless keys vanish
    * (count 0 ⇒ no row, as with exact distinct). */
  def registers(df: DataFrame, key: Column, id: Column): DataFrame =
    registersOfHashes(df.filter(id.isNotNull)
      .select(key.as("key"), hash60(id).as("h")))

  /** The estimator as a pure scalar — the streaming fold's twin of
    * the Column arithmetic in [[estimate]] (java.lang.Math.log is
    * what Catalyst's `log` evaluates, so the branches agree
    * bit-for-bit; [[graft.streaming.HllStreamSpec]] pins it). */
  def estimateScalar(nPresent: Long, zInt: Long): Double = {
    val raw = AlphaZ / zInt
    if (raw <= SmallRangeCeiling && nPresent < M)
      M.toDouble * math.log(M.toDouble / (M - nPresent))
    else raw
  }

  /** Merge register sets of disjoint (or overlapping — max is
    * idempotent) corpora: elementwise max per (key, bucket). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("key"), col("bucket"))
      .agg(max(col("mj")).as("mj"))

  /** Estimate per key from registers: (key, n_present, z_int,
    * est_distinct). `z_int` is the exact integer harmonic sum — the
    * oracle-hashable anchor that pins the full register state. */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        (sum(expr("shiftleft(1L, 53 - mj)")) +
          (lit(M.toLong) - count(lit(1))) * lit(1L << MaxRank)).as("z_int"))
      .select(col("key"), col("n_present"), col("z_int"),
        r6(when(lit(AlphaZ) / col("z_int") <= lit(SmallRangeCeiling) &&
            col("n_present") < lit(M.toLong),
          lit(M.toDouble) * log(lit(M.toDouble) /
            (lit(M.toLong) - col("n_present"))))
          .otherwise(lit(AlphaZ) / col("z_int"))).as("est_distinct"))
}
