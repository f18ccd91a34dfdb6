package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver's synthetic testdata
  * (TESTDATA.md): one parquet file per table under the sf dir. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Spread a compute-heavy stage across all cores: small tables
    * arrive as one input split (one small parquet file ⇒ one task),
    * which serializes expensive per-row work like sketching. The
    * narrow round-robin exchange costs ~nothing on metadata-sized
    * rows and unlocks full parallelism; at production scale the scan
    * has many splits and this becomes a no-op knob. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default; read it as a nanosecond-epoch long (queries derive
    // seconds/buckets with integer arithmetic — ns values overflow
    // double precision, so no float math on raw ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
