package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: keep-latest-per-key via the order-independent
  * max(struct) aggregate vs the textbook row_number window, on the
  * same events dir — the CDC-compaction plan comparison behind
  * TimeSeries.eventsCompact. Usage: `graft.CompactProbe [dir]`. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("compact-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Tables.t handles the NANOS timestamp encoding (ts as long)
    def events = graft.queries.Tables.t(spark, dir, "events")

    // checksum over the ELECTED ids, not the row count — both plans
    // return one row per key by construction, so only the content
    // can reveal a wrong-latest divergence
    def time(label: String)(df: => org.apache.spark.sql.DataFrame)
        : (Long, Long) = {
      val t0 = System.nanoTime()
      val row = df
        .agg(count(lit(1)),
          org.apache.spark.sql.functions.sum(col("last_id")).cast("long"))
        .collect().head
      val (n, idSum) = (row.getLong(0), row.getLong(1))
      println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"($n%,d rows, idsum=$idSum%,d)")
      (n, idSum)
    }
    val agg = time("agg") {
      events.groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("m.event_id").as("last_id"))
    }
    val win = time("window") {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("event_id").as("last_id"))
    }
    require(agg == win, s"elected-row mismatch: $agg vs $win")

    // the aggregate's claimed regime: versions CO-LOCATED per key in
    // the input partitions (time-ordered CDC ingest) — the partial
    // step should collapse each partition to one row per key
    val coloc = events
      .repartition(64, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("event_type"))
      .localCheckpoint(true)
    val aggC = time("agg-coloc") {
      coloc.groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("m.event_id").as("last_id"))
    }
    val winC = time("win-coloc") {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      coloc.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("event_id").as("last_id"))
    }
    require(aggC == agg && winC == agg,
      s"co-located runs diverge: $aggC / $winC vs $agg")
    coloc.unpersist()
    spark.stop()
  }
}
