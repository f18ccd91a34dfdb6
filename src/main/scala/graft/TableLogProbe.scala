package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.TableLog

/** Dev probe: the versioned table's mutation costs at corpus scale —
  * the claim to verify is that COW MERGE cost tracks the TOUCHED
  * FILES (batch keys × file sizes), not the table size, and that the
  * touch-scan itself is one column-pruned pass. Base the table on the
  * scale corpus' documents, range-partitioned on doc_id into many
  * files so a narrow key batch touches few of them.
  *
  * Usage: `graft.TableLogProbe [dir] [files]`.
  */
object TableLogProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_100")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("tablelog-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val tdir = java.nio.file.Files
      .createTempDirectory("graft_tlprobe").toString
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val n = docs.count()
    println(s"table: $n docs -> $nFiles files")
    timed("writeBase (statsKey=doc_id)")(TableLog.writeBase(spark,
      docs.repartitionByRange(nFiles, col("doc_id"))
        .sortWithinPartitions(col("doc_id")), tdir,
      statsKey = Some("doc_id")))

    // narrow batch: 1000 keys in one doc_id range → few touched files
    import spark.implicits._
    val batch = (0 until 1000)
      .map(i => (100000L + i, s"updated $i", 9L))
      .toDF("doc_id", "text", "n_chars")
    val before = TableLog.liveFiles(spark, tdir).toSet
    println(s"stats candidates for the batch: " +
      s"${TableLog.statsCandidates(spark, tdir, batch, "doc_id")} " +
      s"of ${before.size} files")
    timed("upsert (narrow 1k batch)")(
      TableLog.upsert(spark, tdir, batch, "doc_id"))
    val after = TableLog.liveFiles(spark, tdir).toSet
    println(s"touched files rewritten: ${before.diff(after).size} " +
      s"of ${before.size}")

    // delete arm: a narrow doomed-key set must touch (rewrite) only
    // the files whose stats ranges contain it — COW retraction cost
    // tracks touched files, not table size
    val doomed = (0 until 1000)
      .map(i => 200000L + i).toDF("doc_id")
    val beforeDel = TableLog.liveFiles(spark, tdir).toSet
    timed("delete (narrow 1k keys)")(
      TableLog.delete(spark, tdir, doomed, "doc_id"))
    println(s"delete touched ${beforeDel.diff(
      TableLog.liveFiles(spark, tdir).toSet).size} of ${beforeDel.size}")

    timed("compactZorder 32")(TableLog.compactZorder(spark, tdir,
      pmod(col("doc_id"), lit(256L)),
      least(col("n_chars"), lit(255L)).cast("long"), nFiles = 32))
    timed("read latest count")(
      println(s"rows: ${TableLog.readVersion(spark, tdir).count()}"))
    timed("vacuum")(println(s"deleted: ${TableLog.vacuum(spark, tdir)}"))
    val fs = new org.apache.hadoop.fs.Path(tdir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tdir), true)
    spark.stop()
  }
}
