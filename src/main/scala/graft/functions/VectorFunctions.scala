package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` / `array<double>`
  * embedding columns. All math is done in double precision regardless
  * of storage type, with index-order summation, so an independent
  * engine computing the same formula agrees to ~1 ulp.
  *
  * Built entirely from `functions._` (zip_with / aggregate /
  * transform) — codegen'd, no UDF, no shuffle.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Dot product Σ a_i * b_i (index-order left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean (L2) norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(d(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Squared L2 distance. */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** L2 distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Squared(a, b))

  /** L2-normalized copy of the vector (zero vector returned as-is). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, d(a)).otherwise(transform(d(a), x => x / n))
  }

  /** Deterministic random-hyperplane LSH bucket id in [0, 2^planes).
    * Plane p's component for dimension i is derived from
    * md5("p|i") — uniform in [-0.5, 0.5), reproducible in any engine
    * with md5. bit_p = 1 iff Σ_i v_i * plane_p_i >= 0.
    *
    * This is the scale path for ANN: bucket embeddings once (one
    * narrow shuffle on an int key), then search within buckets —
    * turning a 100 TB cross join into per-bucket joins.
    */
  def hyperplaneBucket(vec: Column, planes: Int, dim: Int,
      planeOffset: Int = 0): Column = {
    require(planes <= 16, "at most 16 hyperplanes (bucket id fits an int)")
    val v = d(vec)
    val bitCols = (0 until planes).map { p =>
      // component_{p,i} = (md5_32("p|i") / 2^32) - 0.5  (deterministic)
      val proj = (0 until dim).map { i =>
        val comp = planeComponent(planeOffset + p, i)
        element_at(v, i + 1) * lit(comp)
      }.reduce(_ + _)
      when(proj >= 0.0, lit(1 << p)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

  /** Deterministic pseudo-random plane component in [-0.5, 0.5),
    * computed on the driver (plain Scala md5 — same value any engine
    * derives from md5 hex). */
  def planeComponent(plane: Int, dim: Int): Double = {
    val mdd = java.security.MessageDigest.getInstance("MD5")
    val hex = mdd.digest(s"$plane|$dim".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
  }
}
