package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Dev probe for the connected-components operator at scale:
  * synthesizes a dedup-shaped graph — `nCliques` 5-node star
  * clusters (the near-dup cluster shape, diameter 2) plus
  * `nChains` 10-node chains (the worst case, diameter 9) — and
  * times the closure. Usage:
  * `graft.ComponentsProbe [nCliques] [nChains]`.
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val nCliques = args.headOption.map(_.toInt).getOrElse(2000000)
    val nChains = args.lift(1).map(_.toInt).getOrElse(100000)
    val chainLen = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .appName("components-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // star edges (base -> base+k); node ids 0 .. 5*nCliques
    val cliques = spark.range(0, nCliques.toLong * 5)
      .filter(col("id") % 5 =!= 0)
      .select(((col("id") / 5).cast("long") * 5).as("a"), col("id").as("b"))
    // chain edges offset far above the cliques
    val base = nCliques.toLong * 5 + 1000
    val chains = spark.range(0, nChains.toLong * chainLen)
      .filter(col("id") % chainLen =!= (chainLen - 1))
      .select((col("id") + base).as("a"), (col("id") + base + 1).as("b"))
    val edges = cliques.union(chains)
    val nEdges = edges.count()

    val t0 = System.nanoTime()
    val sizes = ConnectedComponents.componentSizes(edges, "a", "b")
      .groupBy(col("n_docs")).agg(count(lit(1)).as("n_components"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"edges=$nEdges%,d cliques=$nCliques%,d chains=$nChains%,d " +
      f"closure=$secs%.1f s sizes=$sizes")
    val ok = sizes.get(5L).contains(nCliques.toLong) &&
      sizes.get(chainLen.toLong).contains(nChains.toLong)
    println(s"structure-correct=$ok")
    spark.stop()
  }
}
