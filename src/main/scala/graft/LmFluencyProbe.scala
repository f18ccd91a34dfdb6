package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the bigram-LM fluency score at scale — the round-4
  * verdict's unbounded-broadcast finding. Synthesizes a corpus whose
  * VOCABULARY grows with size (hash-drawn word ids), so the bigram
  * type table grows near-linearly like a real corpus (the fixed
  * 31-word gen_scale vocabulary caps bigrams at 961 and would hide
  * the problem). Prints the bigram type count, which side of the
  * [[graft.queries.Curation.LmBigramBroadcastMaxTypes]] gate the run
  * lands on, and the wall time — the decade sweep that documents the
  * gate keeping driver memory bounded while the shuffle-join path
  * absorbs the growth. Usage: `graft.LmFluencyProbe [nDocs] [vocab]`.
  */
object LmFluencyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val vocab = args.lift(1).map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder().master("local[32]")
      .appName("lmfluency-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files
      .createTempDirectory("graft-lmfluency-probe").toString
    // 40 hash-drawn words per doc (a LINEAR word sequence would make
    // every bigram (w, w+c) and cap types at vocab — hash() draws
    // spread bigrams across ~vocab² space so types scale with the
    // corpus, the shape that killed the unbounded broadcast)
    spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        expr(s"""concat_ws(' ', transform(sequence(0, 39),
          i -> concat('w', pmod(hash(id * 40 + i), $vocab))))""")
          .as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        lit(200L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val nBig = spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), " ").as("a"))
      .select(explode(expr(
        """zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
           (x, y) -> struct(x AS w1, y AS w2))""")).as("z"))
      .select("z.w1", "z.w2").distinct().count()
    val gate = graft.queries.Curation.LmBigramBroadcastMaxTypes
    // mirror lmFluency's actual rule: broadcast iff v² <= gate, with
    // v the MEASURED distinct-unigram count (the generator parameter
    // overstates it when few draws land; nBig printed for the growth
    // evidence)
    val vMeasured = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").select("w").distinct().count()
    val path =
      if (vMeasured <= math.sqrt(gate.toDouble).toLong) "broadcast"
      else "shuffle-join"

    val t0 = System.nanoTime()
    val out = graft.queries.Curation.lmFluency(spark, dir)
    val checksum = out.agg(sum(hash(col("doc_id"),
      col("lm_score"))).cast("long")).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"docs=$nDocs%,d vocab=$vMeasured%,d bigramTypes=$nBig%,d " +
      f"gate=$gate%,d path=$path secs=$secs%.1f checksum=$checksum")
    spark.stop()
  }
}
