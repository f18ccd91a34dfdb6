package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the splittable tar source: times full-content reads
  * and pruned listings of one large archive, split vs unsplit, and
  * checks the results agree. Usage:
  * `graft.TarSplitProbe <archive.tar> [splitMB]`.
  */
object TarSplitProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/bigtar/huge.tar")
    val splitBytes = (args.lift(1).map(_.toLong).getOrElse(64L) << 20)
    val spark = SparkSession.builder().master("local[32]")
      .appName("tar-split-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def read(split: Boolean) = {
      val r = spark.read.format("tar")
      (if (split) r.option("splitBytes", splitBytes.toString)
       else r.option("split", "false")).load(path)
    }
    val u = time("unsplit full-read") {
      read(false).agg(count(lit(1)), sum(length(col("content")))).collect()(0)
    }
    val s = time("split full-read") {
      read(true).agg(count(lit(1)), sum(length(col("content")))).collect()(0)
    }
    println(s"full: unsplit=$u split=$s agree=${u == s}")
    val lu = time("unsplit pruned listing") {
      read(false).agg(count(lit(1)), sum(col("size"))).collect()(0)
    }
    val ls = time("split pruned listing") {
      read(true).agg(count(lit(1)), sum(col("size"))).collect()(0)
    }
    println(s"list: unsplit=$lu split=$ls agree=${lu == ls}")
    spark.stop()
  }
}
