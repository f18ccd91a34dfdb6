package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split cannot apply (e.g. the skew is in a persisted/
  * cached input, or the join is a self-join over LSH buckets where
  * one bucket dwarfs the rest, as happens with near-dup banding on
  * head-heavy corpora at 100 TB).
  *
  * Left rows get a random salt in [0, factor); right rows are
  * replicated `factor` times, one per salt value, so the join key
  * becomes (key, salt) and one hot key spreads across `factor`
  * reducers. Replication cost is bounded: use it for a moderate-size
  * right side or pre-filter to the known-hot keys and union with the
  * unsalted join of the rest (the helper [[saltedJoinHotKeys]]).
  */
object SkewJoin {

  /** Full salted inner equi-join (right side replicated xfactor). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, seed: Long = 42L): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    val salted = left.withColumn("__salt",
      (rand(seed) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt ONLY the listed hot keys; everything else joins unsalted.
    * The standard production shape: hot keys come from a cheap
    * groupBy-count profile of the left side. */
  def saltedJoinHotKeys(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any], factor: Int, seed: Long = 42L): DataFrame = {
    require(hotKeys.nonEmpty, "no hot keys — use a plain join")
    val isHot = col(key).isin(hotKeys: _*)
    val hot = saltedJoin(left.filter(isHot), right.filter(isHot),
      key, factor, seed)
    val cold = left.filter(!isHot).join(right.filter(!isHot), Seq(key))
    // align column order before union (join column ordering differs)
    hot.select(cold.columns.toIndexedSeq.map(col): _*).unionByName(cold)
  }

  /** Profile helper: the keys holding more than `threshold` of the
    * rows (collected — callers bound the group count). */
  def hotKeyProfile(df: DataFrame, key: String,
      threshold: Double = 0.01): Seq[Any] = {
    val total = df.count().toDouble
    df.groupBy(col(key)).count()
      .filter(col("count") > total * threshold)
      .collect().map(_.get(0)).toSeq
  }
}
