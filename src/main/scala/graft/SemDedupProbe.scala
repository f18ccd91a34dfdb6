package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe for the SemDeDup N²/C rule
  * ([[graft.queries.Similarity.semDedupAt]]): total pair work is
  * Σ|cluster|² ≈ N²/C, so the centroid count must scale with the
  * corpus — a fixed C turns the within-cluster block quadratic. And
  * once C is corpus-scaled, the flat N·C assignment becomes the next
  * bottleneck — mode `two` runs the factorized
  * [[graft.queries.Similarity.assignTwoLevel]] coarse→fine assign
  * (G ≈ √C) in front of the same pruning stage.
  * Usage: `graft.SemDedupProbe <scaleDir> <numCentroids> [flat|two]`.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SemDedupProbe <scaleDir> <numCentroids> [flat|two]")
    val dir = args(0)
    val c = args(1).toInt
    val mode = if (args.length > 2) args(2) else "flat"
    val spark = SparkSession.builder().master("local[32]")
      .appName("semdedup-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.{Similarity, Tables}
    val t0 = System.nanoTime()
    val n = mode match {
      case "flat" => Similarity.semDedupAt(spark, dir, c).count()
      case "two" =>
        val e = Tables.fanOut(Tables.t(spark, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v")))
        val g = math.max(1, math.round(math.sqrt(c.toDouble)).toInt)
        Similarity.semDedupFromAssign(
          Similarity.assignTwoLevel(e, c, g)).count()
      case other => sys.error(s"unknown mode $other")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"semdedup: dir=$dir C=$c mode=$mode -> $n%d dropped in $secs%.2f s")
    spark.stop()
  }
}
