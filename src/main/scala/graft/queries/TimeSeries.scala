package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Num._

/** Event-stream analytics over the `events` table (`event_id, ts,
  * user_id, event_type, value, props`) — batch mirrors of the
  * Structured Streaming pipeline in [[graft.streaming]]: the same
  * tumbling-window and sessionization semantics, verifiable against a
  * SQL oracle (the streaming path reuses these groupings with a
  * watermark on `ts`).
  *
  * Time handling: all emitted times are epoch seconds (long) — the
  * source column is nanosecond-precision parquet, and floor-to-second
  * agrees across engines while raw timestamp precision does not.
  */
object TimeSeries {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  val SessionGapSec = 1800L // 30 min inactivity ends a session

  /** `ts` arrives as a nanosecond-epoch long (see [[Tables.t]]);
    * microsecond timestamp for Spark's window(), integer-division
    * seconds elsewhere. */
  private def tsMicros: org.apache.spark.sql.Column =
    timestamp_micros(expr("ts div 1000"))
  private def tsSec: org.apache.spark.sql.Column = expr("ts div 1000000000")

  /** Tumbling 1-hour window aggregation per event type — the
    * windowed-aggregation shape (map-side partial agg, one shuffle on
    * (bucket, type); at scale the window key is derivable from a
    * partition column for pruning). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(tsMicros, "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  val eventsHourlySql: String =
    s"""SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT AS bucket_start,
       event_type, count(*) AS n_events,
       ${sqlR("sum(value)", 2)} AS sum_value
       FROM events GROUP BY 1, 2"""

  /** Sessionization: per user, a new session starts after
    * [[SessionGapSec]] of inactivity; emit per-session stats. The
    * lag/cumsum windows shuffle once on user_id; the follow-up
    * session aggregation reuses the same partitioning (no second
    * shuffle of the full data). This is the batch twin of
    * `flatMapGroupsWithState` sessionization in the streaming module. */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("sec", tsSec)
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("sec") - col("prev") > SessionGapSec, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        r2(sum(col("value"))).as("sum_value"),
        min(col("sec")).as("session_start"),
        max(col("sec")).as("session_end"))
  }

  val eventsSessionizeSql: String =
    s"""WITH x AS (SELECT user_id, event_id, ts, value,
         floor(epoch(ts))::BIGINT AS sec,
         lag(floor(epoch(ts))::BIGINT) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       FROM events),
       s AS (SELECT user_id, value, sec,
         sum(CASE WHEN prev IS NULL OR sec - prev > $SessionGapSec
             THEN 1 ELSE 0 END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       FROM x)
       SELECT user_id, session_idx, count(*) AS n_events,
         ${sqlR("sum(value)", 2)} AS sum_value,
         min(sec) AS session_start, max(sec) AS session_end
       FROM s GROUP BY user_id, session_idx"""

  /** Sessionization via Spark's NATIVE session_window operator (the
    * exact engine path the streaming module uses) — semantics pinned
    * against a µs-exact oracle: a new session starts when
    * ts_next - ts_prev ≥ gap in MICROSECONDS (session_window merges
    * while next.start < current.end), and window.end is
    * last-event + gap. */
  def eventsSessionWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(tsMicros, "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end_gap"),
        col("n_events"), col("sum_value"))

  val eventsSessionWindowSql: String =
    s"""WITH x AS (SELECT user_id, event_id, ts, value,
         epoch_us(ts)::BIGINT AS us,
         lag(epoch_us(ts)::BIGINT) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       FROM events),
       s AS (SELECT user_id, value, us,
         sum(CASE WHEN prev IS NULL OR us - prev >= ${SessionGapSec}000000
             THEN 1 ELSE 0 END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       FROM x)
       SELECT user_id,
         min(us) // 1000000 AS session_start,
         (max(us) + ${SessionGapSec}000000) // 1000000 AS session_end_gap,
         count(*) AS n_events, ${sqlR("sum(value)", 2)} AS sum_value
       FROM s GROUP BY user_id, session_idx"""

  /** Pivot: per-user event-type counts as columns (pandas
    * crosstab-style reshaping; explicit value list keeps the plan a
    * single pass with no distinct-values pre-job). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .count()
    pivoted.select(col("user_id") +:
      EventTypes.map(e => coalesce(col(e), lit(0L)).as(s"n_$e")): _*)
  }

  val eventsPivotSql: String = {
    val cols = EventTypes.map(e =>
      s"count(*) FILTER (WHERE event_type = '$e') AS n_$e").mkString(", ")
    s"SELECT user_id, $cols FROM events GROUP BY user_id"
  }

  val queries: Map[String, Q] = Map(
    "q_events_hourly" -> (eventsHourly _),
    "q_events_sessionize" -> (eventsSessionize _),
    "q_events_session_window" -> (eventsSessionWindow _),
    "q_events_pivot" -> (eventsPivot _),
  )

  val oracles: Map[String, String] = Map(
    "q_events_hourly" -> eventsHourlySql,
    "q_events_sessionize" -> eventsSessionizeSql,
    "q_events_session_window" -> eventsSessionWindowSql,
    "q_events_pivot" -> eventsPivotSql,
  )
}
