package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver's synthetic testdata
  * (TESTDATA.md): one parquet file per table under the sf dir. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default; read it as a nanosecond-epoch long (queries derive
    // seconds/buckets with integer arithmetic — ns values overflow
    // double precision, so no float math on raw ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
