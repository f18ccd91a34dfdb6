package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.TableLog

/** Dev probe: STRING-keyed table mutations at corpus scale — the
  * claim to verify is that the prefix-encoding manifest stats prune
  * a string-keyed MERGE / DELETE / point-lookup exactly like the
  * integral path: candidates and wall track the touched slice, not
  * the table.
  *
  * Usage: `graft.StringKeyProbe [dir] [files]`.
  */
object StringKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_100")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("stringkey-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val out = java.nio.file.Files
      .createTempDirectory("graft_skprobe").toString
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .withColumn("skey", concat(col("source"), lit("#"),
        lpad(col("doc_id").cast("string"), 10, "0")))
    val n = docs.count()
    println(s"table: $n docs -> $nFiles files, string statsKey")
    timed("writeBase (statsKey=skey)")(TableLog.writeBase(spark,
      docs.repartitionByRange(nFiles, col("skey"))
        .sortWithinPartitions(col("skey")), out,
      statsKey = Some("skey")))

    // one-source-prefix batch of 1k keys: the encodings must bound
    // the candidate list to that source's cluster. The keys are
    // COLLECTED once — a lazy limit() re-evaluates per action and
    // can pick different rows for the touch-scan vs the write
    val firstSrc = docs.agg(min(col("source"))).head.getString(0)
    val batchKeys = docs.filter(col("source") === firstSrc)
      .select(col("skey"), col("doc_id")).limit(1000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import spark.implicits._
    val batch = batchKeys.toSeq
      .toDF("skey", "doc_id")
      .withColumn("source", lit(firstSrc))
      .withColumn("n_chars", lit(9L))
    val total = TableLog.liveFiles(spark, out).size
    println(s"stats candidates for a 1-source 1k batch: " +
      s"${TableLog.statsCandidates(spark, out, batch, "skey")} " +
      s"of $total files")
    val before = TableLog.liveFiles(spark, out).toSet
    timed("upsert (1-source 1k batch)")(
      TableLog.upsert(spark, out, batch, "skey"))
    println(s"touched files rewritten: ${before.diff(
      TableLog.liveFiles(spark, out).toSet).size} of $total")

    val lookup = batch.select("skey").limit(10)
    timed("point lookup (10 keys)")(
      println(s"  rows: ${TableLog.readVersionKeys(spark, out,
        lookup, "skey").count()}"))
    timed("range read (one source)")(
      println(s"  rows: ${TableLog.readVersionRangeString(spark, out,
        firstSrc + "#", firstSrc + "#~").count()}"))

    val doomed = docs.filter(col("source") === firstSrc)
      .select(col("skey")).limit(500)
    timed("delete (500 keys, 1 source)")(
      TableLog.delete(spark, out, doomed, "skey"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    spark.stop()
  }
}
