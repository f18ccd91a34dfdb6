package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColumnPayload, Modality, ShardsConfig}
import graft.operators.Processor
import graft.sources.{DatasetReader, ShardWriters, Validators}

/** Format-conversion round-trip through the driver gate: the documents
  * table becomes a text-modality dataset, exports to tar+csv shards
  * (`ShardWriters`), reads back (`DatasetReader.readShards`), and
  * validates (`Validators`) — the reference's write→read→validate
  * golden loop (tests/test_writers.py:12-145) as a harness-visible
  * query. No SQL oracle (filesystem side effects aren't
  * SQL-expressible); the driver records the rows-only check, and the
  * returned summary row makes silent data loss visible (counts +
  * checksum over n_chars + validator error count must survive the
  * trip). */
object RoundTrip {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  def roundtripShards(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_roundtrip").toString
    val config = ShardsConfig(out,
      Seq(ColumnPayload(Modality.Text, "text")))
    val src = Processor(t(spark, dir, "documents"), config)
    ShardWriters.saveToShards(src, out, maxFilesInShard = 200)
    val back = DatasetReader.readShards(spark, config)
    val errors = Validators.validate(back).totalErrors
    back.df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars").cast("long")).as("total_chars"),
      lit(errors).as("validation_errors"))
  }

  val queries: Map[String, Q] = Map(
    "q_roundtrip_shards" -> (roundtripShards _))

  /** deliberately no oracle — side-effecting op, rows-only check */
  val oracles: Map[String, String] = Map.empty
}
