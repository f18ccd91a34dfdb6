package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Layout

/** Dev probe: the compaction fragmentation sweep the round-6 verdict
  * asked for — wall time of [[Layout.compactFiles]] must grow ≪
  * linearly in BIN COUNT (the round-6 implementation executed one
  * serial Spark job per bin; a fragmented 100 TB table yields 10³–10⁵
  * bins, so bins × job latency serialized the cluster). The rewrite
  * executes every bin in ONE distributed job.
  *
  * Fragment the documents table into many small files, then compact
  * at target sizes yielding ~N/20 and ~N/2 bins, timing each.
  * Usage: `graft.CompactFilesProbe [dir] [files]`.
  */
object CompactFilesProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_10")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(800)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("compact-files-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val frag = java.nio.file.Files
      .createTempDirectory("graft_frag").toString
    graft.queries.Tables.t(spark, dir, "documents")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(frag)
    val fs = new org.apache.hadoop.fs.Path(frag)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(frag))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    println(s"fragmented: ${files.length} files, $total bytes")

    def sweep(bins: Int): Unit = {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_compact_$bins").toString
      val target = math.max(total / bins, 1L)
      val t0 = System.nanoTime()
      val (before, after, gotBins) =
        Layout.compactFiles(spark, frag, out, target)
      val dt = (System.nanoTime() - t0) / 1e9
      // row-multiset parity — the sweep must not trade correctness
      val a = spark.read.parquet(frag).count()
      val b = spark.read.parquet(s"$out/bin_*").count()
      require(a == b, s"row count drifted: $a -> $b")
      println(f"target=$bins%4d bins: got $gotBins%4d bins " +
        f"($before -> $after files)  $dt%6.1f s")
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
    }
    // warm the JVM on a small pass first, then the sweep points
    sweep(10)
    sweep(40)
    sweep(400)
    fs.delete(new org.apache.hadoop.fs.Path(frag), true)
    spark.stop()
  }
}
