package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for n-gram decontamination at scale: a FIXED-size eval
  * suite (the real-world shape — benchmark suites do not grow with
  * the train corpus) probed by an ever-larger train side. 1% of
  * train docs embed a verbatim eval passage (26 shared 5-grams
  * each); the rest are id-salted unique text, so the flagged set
  * stays ~1% while the exploded gram volume scales linearly.
  * Measures the [[graft.queries.Curation.decontaminateNgram]] plan:
  * fused gram hashing, broadcast eval gram set, map-side probe, one
  * shuffle over flagged docs only. Usage: `graft.DecontamProbe
  * [nTrain] [nEval]`.
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val nTrain = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nEval = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder().master("local[32]")
      .appName("decontam-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val dir = java.nio.file.Files
      .createTempDirectory("graft-decontam-probe").toString
    // eval: nEval docs of 30-word passages; every word unique to its
    // passage so suites don't self-collide
    spark.range(0, nEval)
      .select(col("id"),
        expr("concat_ws(' ', transform(sequence(0, 29)," +
          " i -> concat('p', id, '_', i)))").as("text"))
      .write.mode("overwrite").parquet(s"$dir/eval.parquet")
    // train: 1% contaminated (a full eval passage + unique tail),
    // 99% clean id-salted words
    spark.range(0, nTrain)
      .select(col("id"),
        when(col("id") % 100 === 1,
          expr(s"concat_ws(' ', concat_ws(' ', transform(sequence(0, 29)," +
            s" i -> concat('p', (id div 100) % $nEval, '_', i)))," +
            " concat_ws(' ', transform(sequence(0, 9)," +
            " i -> concat('u', id, '_', i))))"))
          .otherwise(expr("concat_ws(' ', transform(sequence(0, 39)," +
            " i -> concat('u', id, '_', i)))")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/train.parquet")

    def grams(df: DataFrame): DataFrame = df.select(col("id"),
      explode(graft.functions.GraftFunctions
        .wordGramHashes(col("text"), graft.queries.Curation.DecontamN))
        .as("gh"))

    val t0 = System.nanoTime()
    val evalGrams = grams(spark.read.parquet(s"$dir/eval.parquet"))
      .select(col("gh")).distinct()
    val flagged = grams(spark.read.parquet(s"$dir/train.parquet"))
      .join(broadcast(evalGrams), Seq("gh"))
      .groupBy(col("id"))
      .agg(countDistinct(col("gh")).as("n_shared"))
    val n = flagged.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"decontam: $nTrain%d train x $nEval%d eval -> " +
      f"$n%d flagged in $secs%.2f s")
    spark.stop()
  }
}
