package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.TextFunctions.hash60
import graft.queries.Layout

/** Measurement harness: the bloom build's hash-die cost. The catalog
  * query keeps the md5-based hash60 die because the DuckDB oracle
  * must reproduce it symbolically; a production deployment has no
  * such constraint and can feed [[GraftFunctions.bloomOrAgg]] any
  * non-negative 63-bit die — Spark's codegen'd xxhash64 is the
  * natural choice. This probe times both builds on the same corpus,
  * two in-JVM reps each (rep 2 is the JIT-warm number).
  *
  * Usage: BloomProbe <sfDir>
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("bloom-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val ev = graft.queries.Tables.t(spark, dir, "events")
      .select(col("event_id"))
    val n = ev.count()
    val tFiles = math.max(1L,
      math.ceil(n / Layout.BloomFileRows.toDouble).toLong)

    def build(die: org.apache.spark.sql.Column): DataFrame =
      ev.withColumn("h", die)
        .withColumn("fid", pmod(col("h"), lit(tFiles)))
        .groupBy(col("fid"))
        .agg(GraftFunctions.bloomOrAgg(col("h"),
          Layout.BloomWords, Layout.BloomBits, Layout.BloomK).as("warr"))

    def time(label: String, df: => DataFrame): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    println(s"n=$n files=$tFiles")
    time("md5-die    ", build(hash60(col("event_id").cast("string"))))
    time("xxhash-die ", build(
      xxhash64(col("event_id")).bitwiseAND(lit(Long.MaxValue))))
    spark.stop()
  }
}
