package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for the sequence-packing cumsum: cache-the-projection
  * vs recompute-the-narrow-scan for the bucket-offsets branch, at
  * `nDocs` synthetic documents. The projection the old plan persisted
  * is (doc_id, source, toks, bucket, lcum) — corpus-sized, i.e.
  * multi-TB at 100 TB input; the recompute plan pays a second
  * scan + tokenize instead. Usage: `graft.PackingProbe [nDocs]`.
  */
object PackingProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .appName("packing-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions.tokenCount

    val dir = java.nio.file.Files
      .createTempDirectory("graft-packing-probe").toString
    // synthetic docs: 7 sources, text of 5-100 repeated words so
    // tokenCount does real regex work per row
    spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        concat(lit("s"), (col("id") % 7).cast("string")).as("source"),
        concat_ws(" ", array_repeat(lit("token west ridge"),
          (pmod(col("id"), lit(32)) + 2).cast("int"))).as("text"))
      .write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
    val budget = 4096L
    val width = {
      val maxId = docs.agg(coalesce(max(col("doc_id")), lit(0L)))
        .head().getLong(0)
      math.max(1L, maxId / 256L + 1)
    }
    def narrow: DataFrame = docs.select(col("doc_id"), col("source"),
      tokenCount(col("text")).cast("long").as("toks"))
      .withColumn("bucket", expr(s"doc_id div $width"))
    val local = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)

    def finish(withLocal: DataFrame, offsets: DataFrame): Long =
      withLocal.join(broadcast(offsets), Seq("source", "bucket"))
        .withColumn("cum", col("off") + col("lcum"))
        .withColumn("pack_id", expr(s"greatest(cum - 1, 0L) div $budget"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .count()

    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n packs)")
    }

    timed("recompute (current)") {
      val offsets = narrow.groupBy(col("source"), col("bucket"))
        .agg(sum(col("toks")).as("btoks"))
        .withColumn("off", coalesce(sum(col("btoks")).over(offW), lit(0L)))
        .select(col("source"), col("bucket"), col("off"))
      finish(narrow.withColumn("lcum", sum(col("toks")).over(local)), offsets)
    }

    timed("persist (old)") {
      val withLocal = narrow.withColumn("lcum", sum(col("toks")).over(local))
        .persist()
      val offsets = withLocal.groupBy(col("source"), col("bucket"))
        .agg(max(col("lcum")).as("btoks"))
        .withColumn("off", coalesce(sum(col("btoks")).over(offW), lit(0L)))
        .select(col("source"), col("bucket"), col("off"))
      val n = finish(withLocal, offsets)
      withLocal.unpersist()
      n
    }
    spark.stop()
  }
}
