package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{MaterializedAgg, TableLog, Tables}

/** Scratch diagnostics for the optimization round (not part of the
  * driver contract): replays q_incr_agg's table mutations and prints
  * per-version file counts + sizes, to attribute the query's job
  * count. */
object IncrAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = Files.createTempDirectory("graft_incragg_probe").toString
    val src = s"$out/src"; val view = s"$out/view"
    val docs = Tables.t(spark, sfDir, "documents")
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val w = math.max(1L, (mx - mn + 1L) / 32L)
    val lo = mn + math.floor((mx - mn) / 3.0).toLong
    val hi = mn + math.floor((mx - mn) / 2.0).toLong
    def withBkt(d: DataFrame) = d.withColumn("bkt",
      floor(col("doc_id") / lit(w.toDouble)).cast("long"))
    def report(tag: String): Unit = {
      for (t <- Seq(src, view)) {
        val d = new java.io.File(t, "")
        if (d.isDirectory) {
          val files = new scala.collection.mutable.ArrayBuffer[(String, Long)]
          def walk(f: java.io.File): Unit =
            if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
            else if (f.getName.endsWith(".parquet")) files += ((f.getPath, f.length))
          walk(d)
          val live = try TableLog.liveFiles(spark, t).size catch { case _: Throwable => -1 }
          println(f"[$tag] $t on-disk=${files.size} live=$live " +
            f"bytes=${files.map(_._2).sum}")
        }
      }
    }
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("writeBase")(TableLog.writeBase(spark,
      withBkt(docs).repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions(col("doc_id")),
      src, statsKey = Some("doc_id")))
    report("base")
    def maintain() = MaterializedAgg.maintain(spark, src, "doc_id",
      view, Seq("source", "bkt"), Seq("n_chars"))
    time("maintain1")(maintain())
    report("m1")
    val updates = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
        col("lang"), (col("n_chars") + 3).as("n_chars"), col("source"))
    val inserts = docs.filter(pmod(col("doc_id"), lit(11)) === 5)
      .select((col("doc_id") + lit(mx + 1L)).as("doc_id"),
        concat(lit("new "), col("text")).as("text"),
        col("lang"), (col("n_chars") + 4).as("n_chars"), col("source"))
    time("upsert")(TableLog.upsert(spark, src,
      withBkt(updates.unionByName(inserts)), "doc_id"))
    report("upsert")
    time("maintain2")(maintain())
    report("m2")
    time("delete")(TableLog.delete(spark, src,
      docs.filter(col("doc_id").between(lo, hi)).select("doc_id"),
      "doc_id"))
    report("delete")
    time("maintain3")(maintain())
    report("m3")
    val res = time("readView")(
      MaterializedAgg.readView(spark, view).collect())
    println(s"view rows: ${res.length}")
    spark.stop()
  }
}
