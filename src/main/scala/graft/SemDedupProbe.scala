package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the SemDeDup N²/C rule
  * ([[graft.queries.Similarity.semDedupAt]]): total pair work is
  * Σ|cluster|² ≈ N²/C, so the centroid count must scale with the
  * corpus — a fixed C turns the within-cluster block quadratic.
  * Runs the catalog operator unchanged against a gen_scale.py corpus
  * at a caller-chosen C and reports drop count + wall time.
  * Usage: `graft.SemDedupProbe <scaleDir> <numCentroids>`.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SemDedupProbe <scaleDir> <numCentroids>")
    val dir = args(0)
    val c = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .appName("semdedup-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.queries.Similarity.semDedupAt(spark, dir, c).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"semdedup: dir=$dir C=$c -> $n%d dropped in $secs%.2f s")
    spark.stop()
  }
}
