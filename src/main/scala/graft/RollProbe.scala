package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object RollProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_1000")
    val spark = SparkSession.builder().master("local[32]")
      .appName("roll-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s checksum=$r")
    }
    def events = graft.queries.Tables.t(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rangeBetween(-6, 0)
    def finish(daily: org.apache.spark.sql.DataFrame): Long =
      daily
        .withColumn("roll_cents", sum(col("day_cents")).over(w))
        .withColumn("n_days7", count(lit(1)).over(w))
        .agg(sum(hash(col("user_id"), col("day"), col("day_cents"),
          col("roll_cents"), col("n_days7"))).cast("long"))
        .head().getLong(0)
    timed("current (groupBy then window: two exchanges)") {
      finish(events.groupBy(col("user_id"),
          expr("ts div 86400000000000").as("day"))
        .agg(sum(expr("cast(round(value * 100) as long)")).as("day_cents"),
          count(lit(1)).as("n_events")))
    }
    timed("repartition(user) first (one exchange serves both)") {
      finish(events.repartition(col("user_id"))
        .groupBy(col("user_id"), expr("ts div 86400000000000").as("day"))
        .agg(sum(expr("cast(round(value * 100) as long)")).as("day_cents"),
          count(lit(1)).as("n_events")))
    }
    spark.stop()
  }
}
