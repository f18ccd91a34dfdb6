package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join as a reusable operator: every left row
  * is paired with the single latest right row whose time is prior to
  * the left row's time, per key — the lookup shape of feature stores,
  * slowly-changing dimensions, and event attribution.
  *
  * A direct self-join (`l JOIN r ON l.key = r.key AND r.ts < l.ts`
  * + max-window) shuffles both inputs AND explodes into one row per
  * candidate pair before the window prunes — quadratic on hot keys,
  * hopeless at 100 TB. This operator instead UNIONS the two sides,
  * tagged, into one stream: one shuffle on the key, one ordered
  * window pass, and a running ignore-nulls `last()` carries the most
  * recent right payload forward to each left row — O(n log n) per
  * key for the sort, O(n) for the carry, no pair blow-up.
  * `q_events_asof` is this operator inlined; the spec pins equality
  * to the naive pair-join on adversarial data (hot keys, ties,
  * keys with no prior right row).
  *
  * Ordering at equal times: `strict = true` (prior = `<`) sorts left
  * rows BEFORE right rows of the same timestamp so an equal-time
  * right row is not visible; `strict = false` (prior = `<=`) sorts
  * them after, making it visible. Ties beyond (time, side) get a
  * total order from `tieBreak` (pass e.g. an event id; defaults to
  * the right payload struct so the result is still deterministic).
  */
object AsofJoin {

  /** Join `left` to the latest prior row of `right`.
    *
    * @param keys      equality columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to carry (null when no prior row)
    * @param strict    prior means `<` (true) or `<=` (false)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(payload.forall(!left.columns.contains(_)),
      "payload column names must not collide with left columns")
    val t = "__asof_t"
    val side = "__asof_side"
    val p = "__asof_p"
    // left rows sort at side 0 under strict (same-time right rows
    // come after → invisible to the carry), side 1 under <=
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val lTagged = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(leftSide))
      .withColumn(p, lit(null).cast(
        right.select(struct(payload.map(col): _*)).schema.head.dataType))
    val rTagged = right
      .select((keys.map(col) :+
        col(rightTime).as(t) :+
        lit(rightSide).as(side) :+
        struct(payload.map(col): _*).as(p)): _*)
    // align: right rows carry nulls for the left-only columns
    val leftOnly = lTagged.columns.filterNot(rTagged.columns.contains)
    val rAligned = leftOnly.foldLeft(rTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(
        lTagged.schema(c).dataType))
    }
    val unioned = lTagged.unionByName(rAligned.select(
      lTagged.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t), col(side), col(p))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(p,
      last(when(col(side) === rightSide, col(p)), ignoreNulls = true)
        .over(w))
    val isLeft = col(side) === leftSide
    val payloadCols: Seq[Column] =
      payload.map(c => col(p).getField(c).as(c))
    carried.filter(isLeft)
      .select(left.columns.toIndexedSeq.map(col) ++ payloadCols: _*)
  }
}
