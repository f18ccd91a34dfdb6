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

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s ($n%,d rows)")
      n
    }
    val nAgg = time("agg") {
      events.groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
    }
    val nWin = time("window") {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
    }
    require(nAgg == nWin, s"row mismatch: $nAgg vs $nWin")
    spark.stop()
  }
}
