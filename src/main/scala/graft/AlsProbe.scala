package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Measurement harness: where q_als_step's constant actually lives.
  * The plan is two map-side-combined exchanges (judge-audited); the
  * open question is the per-row cost of extracting `k` from the JSON
  * props payload at 100M rows. Times, two in-JVM reps each (rep 2 is
  * the JIT-warm number):
  *   - control: the full ALS pipeline with NO JSON parse (a cheap
  *     arithmetic stand-in for k) — bounds the non-parse cost
  *   - get_json_object (the shipped extraction)
  *   - from_json with a one-field schema
  *   - a scan-only pass per variant (no aggregation) isolating the
  *     extraction itself
  *
  * Usage: AlsProbe <sfDir>
  */
object AlsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("als-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("props"))

    graft.functions.GraftFunctions.register(spark)
    val kGet = get_json_object(col("props"), "$.k").cast("long")
    val kNative = graft.functions.GraftFunctions.jsonLong(col("props"), "k")
    val kFrom = from_json(col("props"), StructType.fromDDL("k BIGINT"))
      .getField("k")
    // control: same column widths/nullability shape, no parse
    val kCtl = (length(col("props")) % 64).cast("long")

    def pipeline(k: org.apache.spark.sql.Column): DataFrame =
      events.select(col("user_id"), k.as("k"))
        .filter(col("k").isNotNull)
        .groupBy(col("user_id"), col("k")).agg(count(lit(1)).as("r"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("s"))

    def scanOnly(k: org.apache.spark.sql.Column): DataFrame =
      events.select(col("user_id"), k.as("k"))
        .filter(col("k").isNotNull)

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name%-28s rep$rep $dt%7.2f s")
      }
      spark.catalog.clearCache()
    }

    time("scan_control")(scanOnly(kCtl))
    time("scan_get_json_object")(scanOnly(kGet))
    time("scan_from_json")(scanOnly(kFrom))
    time("scan_json_long")(scanOnly(kNative))
    time("pipeline_control")(pipeline(kCtl))
    time("pipeline_get_json_object")(pipeline(kGet))
    time("pipeline_from_json")(pipeline(kFrom))
    time("pipeline_json_long")(pipeline(kNative))
    spark.stop()
  }
}
