package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.GroupTopK

/** Controlled A/B for the per-group top-k strategies on the ANN
  * coarse-scan shape: Q queries × N-vector corpus of L2 distances,
  * top-k per query. Compares
  *  - the row_number window (Spark plans a WindowGroupLimit partial
  *    pass: per-map-task SORT of all its pair rows, then k per group
  *    cross the exchange), vs
  *  - [[GroupTopK]] (bounded per-partition HEAPS: O(n log k) per
  *    task, same exchange volume).
  * The pair table is persisted and pre-forced so only the top-k plan
  * differs; each variant runs twice and both timings print (second
  * run = warm JIT). Checksums must match — same election, same
  * ranks. */
object GroupTopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_1000")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .appName("group-topk-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val e = graft.queries.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.l2DistSq(col("qv"), col("v")).as("d2"))
      .filter(col("d2").isNotNull)
      .persist()
    println(s"pairs: ${pairs.count()} (dir=$dir, k=$k, q=$nQueries)")

    def checksum(df: DataFrame): Long =
      df.agg(sum(hash(col("query_id"), col("vec_id"), col("rk")))
        .cast("long")).head().getLong(0)
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s checksum=$r")
    }

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("vec_id"))
    def windowTop: DataFrame = pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("rk"))
    def heapTop: DataFrame = GroupTopK.topK(pairs, Seq("query_id"),
        Seq(("d2", false), ("vec_id", false)), k)
      .select(col("query_id"), col("vec_id"), col("rk"))

    for (round <- 1 to 2) {
      timed(s"window row_number (run $round)")(checksum(windowTop))
      timed(s"GroupTopK heaps   (run $round)")(checksum(heapTop))
    }
    spark.stop()
  }
}
