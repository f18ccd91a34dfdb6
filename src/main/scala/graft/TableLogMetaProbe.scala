package graft.queries

import org.apache.spark.sql.SparkSession



/** Dev probe: TableLog LOG-METADATA cost as a table accrues commits
  * — the round-8 claim to verify is that snapshot resolution
  * ([[TableLog.currentVersion]] + [[TableLog.liveFileStats]]),
  * replay cost, and [[TableLog.vacuum]] stay ~FLAT as the version
  * count grows 10 → 10⁴ (the streaming-sink "manifest per
  * micro-batch forever" workload), because every path is bounded by
  * commits-since-checkpoint via the `_last_checkpoint` pointer and
  * the orphan-sweeping vacuum, never by table age.
  *
  * The sweep drives the LOG layer directly (synthetic one-file
  * add/remove manifests, checkpoint every 16 — a steady micro-batch
  * table's shape after compaction) so the measurement is metadata,
  * not parquet writes.
  *
  * Usage: `graft.queries.TableLogMetaProbe [versions...]` (default
  * 10 100 1000 10000; the object lives in graft.queries for
  * [[TableLog.commit]] access).
  */
object TableLogMetaProbe {
  def main(args: Array[String]): Unit = {
    val sweeps = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(10, 100, 1000, 10000)
    val spark = SparkSession.builder().master("local[2]")
      .appName("tablelog-meta-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timedMs[A](reps: Int)(f: => A): Double = {
      f // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => f)
      (System.nanoTime() - t0) / 1e6 / reps
    }

    println(f"${"versions"}%9s ${"build(s)"}%9s ${"curVer(ms)"}%11s " +
      f"${"liveSet(ms)"}%12s ${"replayCost"}%11s ${"vac1(ms)"}%9s " +
      f"${"vac2(ms)"}%9s ${"log files"}%10s")
    sweeps.foreach { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_tlmeta_$n").toString
      val t0 = System.nanoTime()
      TableLog.writeBase(spark,
        Seq((0L, "base")).toDF("id", "body"), dir)
      var prev: Option[String] = None
      (1 to n).foreach { v =>
        val rel = f"data/v$v%05d-synth/part-0.parquet"
        TableLog.commit(spark, dir, v,
          adds = Seq(TableLog.AddEntry(rel, Some((v.toLong, v.toLong)))),
          removes = prev.toSeq, txn = Some(s"probe#$v"))
        prev = Some(rel)
        if (v % 16 == 0) TableLog.checkpoint(spark, dir)
      }
      val buildS = (System.nanoTime() - t0) / 1e9
      val curMs = timedMs(20)(TableLog.currentVersion(spark, dir))
      val liveMs = timedMs(20)(TableLog.liveFileStats(spark, dir))
      val rc = TableLog.replayCost(spark, dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def logFiles() = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir, "_log")).length
      val v1 = System.nanoTime()
      TableLog.vacuum(spark, dir) // first: truncates the dead log tail
      val vac1 = (System.nanoTime() - v1) / 1e6
      val v2 = System.nanoTime()
      TableLog.vacuum(spark, dir) // steady state
      val vac2 = (System.nanoTime() - v2) / 1e6
      println(f"$n%9d $buildS%9.1f $curMs%11.2f $liveMs%12.2f " +
        f"$rc%11d $vac1%9.1f $vac2%9.1f ${logFiles()}%10d")
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
