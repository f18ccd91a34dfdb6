package graft

import java.io.{File, FileOutputStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Dev probe for the payload-load pushdown rule: a metadata table
  * over `n` payload files (`bytesEach` bytes), a 10%-selective
  * filter, and a forced-shuffle join — timed with the hoist rule on
  * vs off. With the rule on, only surviving rows' files are read and
  * no payload bytes enter an exchange; with it off, every file loads
  * and the bytes ride the join shuffle. Usage:
  * `graft.PayloadHoistProbe [nFiles] [bytesEach]`.
  */
object PayloadHoistProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val each = args.lift(1).map(_.toInt).getOrElse(50 * 1024)
    val spark = SparkSession.builder().master("local[32]")
      .appName("payload-hoist-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("hoist-probe").toFile
    val payload = new Array[Byte](each)
    (0 until n).foreach { i =>
      payload(0) = i.toByte
      val os = new FileOutputStream(new File(dir, s"f_$i.bin"))
      os.write(payload); os.close()
    }
    val metaPath = s"$dir/meta.parquet"
    (0 until n).map(i => (s"$dir/f_$i.bin", i % 7, i % 10 == 0))
      .toDF("path", "key", "keep")
      .write.mode("overwrite").parquet(metaPath)
    val dim = spark.range(0, 7).select(col("id").cast("int").as("key"),
      concat(lit("g"), col("id")).as("grp"))
    dim.write.mode("overwrite").parquet(s"$dir/dim.parquet")

    def run(label: String, enabled: Boolean): Long = {
      spark.conf.set("spark.graft.payloadHoist.enabled", enabled.toString)
      val t0 = System.nanoTime()
      val out = spark.read.parquet(metaPath)
        .withColumn("bytes", GraftFunctions.loadBytes(col("path")))
        .join(spark.read.parquet(s"$dir/dim.parquet"), "key")
        .filter(col("keep"))
        .groupBy(col("grp"))
        .agg(sum(length(col("bytes"))).as("payload_bytes"))
        .collect().map(_.getLong(1)).sum
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s ${secs}%.2f s (sum=$out)")
      out
    }
    val a = run("hoisted (rule on)", enabled = true)
    val b = run("eager (rule off)", enabled = false)
    val c = run("hoisted again", enabled = true)
    println(s"results agree=${a == b && b == c}")
    spark.stop()
  }
}
