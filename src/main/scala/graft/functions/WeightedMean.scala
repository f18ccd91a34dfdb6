package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed two-accumulator weighted mean — the `Aggregator[IN,BUF,OUT]`
  * surface (Dataset-typed custom aggregation with partial/merge
  * phases handled by Spark). Register with
  * `udaf(WeightedMean)` / `functions.udaf` for untyped use.
  *
  * Merge is order-insensitive up to float association; callers round
  * results before oracle comparison like every double metric.
  */
object WeightedMean
    extends Aggregator[(Double, Double), (Double, Double), Double] {

  /** (value, weight) in; (Σ v·w, Σ w) buffer. */
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double),
      in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double),
      b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) 0.0 else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
