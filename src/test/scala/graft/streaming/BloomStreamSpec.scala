package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** [[VectorStreams.bloomStream]]: the streaming per-file blooms must
  * equal the batch build BIT-EXACTLY — OR-merge is order- and
  * duplication-insensitive, so this holds on any input (unlike the
  * gram twin's float caveat) and an at-least-once replay cannot
  * corrupt the filter. The replay property is pinned by feeding one
  * batch's rows TWICE. */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Words = 16
  private val Bits = 62
  private val K = 4

  test("streaming blooms over 3 micro-batches == batch build, bit-exact") {
    val rows = (0L until 900L).map { i =>
      // non-negative 60-bit-ish hashes, several per file
      (i % 7, (i * 2654435761L) & 0xFFFFFFFFFFFFFFL)
    }
    val src = rows.toDF("fid", "h")
    val flat = Files.createTempDirectory("bloomstream").toString
    (0 until 3).foreach { b =>
      val part = Files.createTempDirectory(s"bloompart$b").toString
      src.filter(pmod(col("h"), lit(3)) === b).coalesce(1)
        .write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"b$b.parquet"))
    }
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = VectorStreams.bloomStream(stream, Words, Bits, K)
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("bloom_stream").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batch = VectorStreams.bloomStream(src, Words, Bits, K).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (fid, w) =>
      assert(w == batch(fid), s"file $fid bloom diverged")
    }
  }

  test("at-least-once replay THROUGH THE STREAM: a re-delivered " +
      "micro-batch leaves the state-store blooms unchanged") {
    val rows = (0L until 200L).map(i => (i % 3, i * 977L))
    val src = rows.toDF("fid", "h")
    // three files where the third REPLAYS the first's rows — the
    // streaming aggregation must fold the duplicate delivery into
    // existing state without changing any bloom word
    val flat = Files.createTempDirectory("bloomreplay").toString
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val part = Files.createTempDirectory(s"brp$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"$name.parquet"))
    }
    val firstHalf = src.filter(col("h") % 2 === 0)
    dump(firstHalf, "b0")
    dump(src.filter(col("h") % 2 === 1), "b1")
    dump(firstHalf, "b2_replay")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = VectorStreams.bloomStream(stream, Words, Bits, K)
      .writeStream.format("memory").queryName("bloom_replay")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("bloom_replay").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batch = VectorStreams.bloomStream(src, Words, Bits, K).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == batch,
      "replayed micro-batch changed the bloom state")
  }
}
