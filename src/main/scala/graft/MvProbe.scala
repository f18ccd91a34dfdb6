package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{MaterializedAgg, TableLog}

/** Dev probe: incremental materialized-view maintenance at corpus
  * scale — the claim to verify is that a maintain after a NARROW
  * mutation costs the CHURN (changed files read + touched groups
  * upserted), not the table: the full build scales with the corpus,
  * the incremental maintains should stay ~flat across corpus decades.
  *
  * Usage: `graft.MvProbe [dir] [files]`.
  */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_100")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("mv-probe")
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
      .createTempDirectory("graft_mvprobe").toString
    val src = s"$out/src"; val view = s"$out/view"
    val docs = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .withColumn("bkt", (col("doc_id") / lit(4096)).cast("long"))
    val n = docs.count()
    println(s"table: $n docs -> $nFiles files")
    timed("writeBase (statsKey=doc_id)")(TableLog.writeBase(spark,
      docs.repartitionByRange(nFiles, col("doc_id"))
        .sortWithinPartitions(col("doc_id")), src,
      statsKey = Some("doc_id")))
    def maintain() = MaterializedAgg.maintain(spark, src, "doc_id",
      view, Seq("source", "bkt"), Seq("n_chars"))
    val full = timed("maintain (full build)")(maintain())
    println(s"  groups: ${full.groupsTotal}")

    import spark.implicits._
    // narrow MERGE: 1k keys in one doc_id range MID-DOMAIN (derived
    // from the data so they are genuine updates at every scale) ->
    // few churned files, few touched groups; the maintain must cost
    // the churn
    val mid = n / 2
    val batch = (0 until 1000)
      .map(i => (mid + i, "s0", 9L, (mid + i) / 4096L))
      .toDF("doc_id", "source", "n_chars", "bkt")
    timed("upsert (narrow 1k batch)")(
      TableLog.upsert(spark, src, batch, "doc_id"))
    val s2 = timed("maintain (after narrow MERGE)")(maintain())
    println(s"  touched ${s2.groupsTouched} of ${s2.groupsTotal} groups")

    val doomed = (0 until 1000).map(i => n / 4 + i).toDF("doc_id")
    timed("delete (narrow 1k keys)")(
      TableLog.delete(spark, src, doomed, "doc_id"))
    val s3 = timed("maintain (after narrow DELETE)")(maintain())
    println(s"  touched ${s3.groupsTouched} of ${s3.groupsTotal} groups")

    timed("readView count")(
      println(s"  view rows: ${MaterializedAgg.readView(spark, view)
        .count()}"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    spark.stop()
  }
}
