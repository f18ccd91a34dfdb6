package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of catalog queries —
  * `java -cp ... graft.Explain q_join_star ...` — used to verify
  * pushdown (PushedFilters/ReadSchema), broadcast choices, and
  * WholeStageCodegen spans per query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
