package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColumnPayload, Modality, ShardsConfig}
import graft.operators.Processor
import graft.sources.{DatasetReader, ShardWriters, Validators}

/** Format-conversion round-trip through the driver gate: the documents
  * table becomes a text-modality dataset, exports to tar+csv shards
  * (`ShardWriters`), reads back (`DatasetReader.readShards`), and
  * validates (`Validators`) — the reference's write→read→validate
  * golden loop (tests/test_writers.py:12-145) as a harness-visible
  * query.
  *
  * The filesystem side effect is not SQL-expressible, but the
  * *identity* of the round trip is: the query returns content
  * fingerprints of the re-read dataset (row count, distinct langs,
  * char sum, md5-derived per-row fingerprint xor + sum over every
  * metadata column AND the payload text), and the oracle computes the
  * same aggregates straight from the source parquet. Any dropped,
  * duplicated, cross-row-scrambled, or byte-mangled value flips a
  * fingerprint and fails the hash gate.
  */
object RoundTrip {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Canonical per-row string: every engine renders BIGINTs and UTF-8
    * text identically, so md5 over it is engine-portable. */
  private def rowKey: Column = concat_ws("|",
    col("doc_id").cast("long").cast("string"),
    col("lang"), col("source"),
    col("n_chars").cast("long").cast("string"),
    col("text"))

  /** First `hexDigits` of md5(rowKey) as an unsigned long — 15 digits
    * (60 bits) for the xor fingerprint (overflow-free under xor),
    * 8 digits (32 bits) for the sum fingerprint (duplicate-sensitive;
    * a sum of 32-bit values stays inside a long up to ~2^31 rows). */
  private def fp(hexDigits: Int): Column =
    conv(substring(md5(rowKey.cast("binary")), 1, hexDigits), 16, 10)
      .cast("long")

  def roundtripShards(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_roundtrip").toString
    val config = ShardsConfig(out,
      Seq(ColumnPayload(Modality.Text, "text")))
    val src = Processor(t(spark, dir, "documents"), config)
    ShardWriters.saveToShards(src, out, maxFilesInShard = 200)
    val back = DatasetReader.readShards(spark, config)
    val errors = Validators.validate(back).totalErrors
    back.df
      .withColumn("fp60", fp(15))
      .withColumn("fp32", fp(8))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        expr("bit_xor(fp60)").as("fp_xor"),
        sum(col("fp32")).as("fp_sum"),
        lit(errors).cast("int").as("validation_errors"))
  }

  val queries: Map[String, Q] = Map(
    "q_roundtrip_shards" -> (roundtripShards _))

  /** The oracle recomputes the identical fingerprints from the SOURCE
    * parquet — equality proves the tar+csv trip preserved every byte
    * of every row (the reference's write→read→validate invariant). */
  val oracles: Map[String, String] = Map(
    "q_roundtrip_shards" ->
      """SELECT count(*) AS n_docs,
         count(DISTINCT lang) AS n_langs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         bit_xor(CAST(concat('0x', substring(md5(
           concat_ws('|', doc_id::VARCHAR, lang, source,
                     n_chars::VARCHAR, text)), 1, 15)) AS BIGINT))
           AS fp_xor,
         CAST(sum(CAST(concat('0x', substring(md5(
           concat_ws('|', doc_id::VARCHAR, lang, source,
                     n_chars::VARCHAR, text)), 1, 8)) AS BIGINT))
           AS BIGINT) AS fp_sum,
         CAST(0 AS INT) AS validation_errors
         FROM documents""")
}
