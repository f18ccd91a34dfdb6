package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** [[VectorStreams.gramStream]]: the streaming Gram state folded over
  * micro-batches must equal the batch aggregate over the same corpus.
  * Fixture vectors are INTEGER-valued so every fold order sums
  * exactly — the equality is bitwise, proving the aggregate's
  * serialize/merge path under the streaming state store. */
class GramStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming gram over 3 micro-batches == batch vector_gram") {
    val dim = 4
    val data = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(dim)(d => ((i * 7 + d * 3) % 11).toDouble))
    }
    val src = data.toDF("vec_id", "v")
    val flat = Files.createTempDirectory("gramstream").toString
    (0 until 3).foreach { b =>
      val part = Files.createTempDirectory(s"grampart$b").toString
      src.filter(pmod(col("vec_id"), lit(3)) === b).coalesce(1)
        .write.mode("overwrite").parquet(part)
      val f = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, s"b$b.parquet"))
    }
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val q = VectorStreams.gramStream(stream, dim)
      .writeStream.format("memory").queryName("gram_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("gram_stream").collect()
    assert(got.length == 1, s"complete mode must hold one global row, got ${got.length}")
    val g = got.head
    val batch = VectorStreams.gramStream(src, dim).collect().head

    assert(g.getLong(0) == 60L && batch.getLong(0) == 60L)
    assert(g.getSeq[Double](1) == batch.getSeq[Double](1),
      "per-dim sums diverged between stream and batch")
    assert(g.getSeq[Double](2) == batch.getSeq[Double](2),
      "second moments diverged between stream and batch")
    // spot-check one hand value: sum of dim-0 entries
    val expected0 = data.map(_._2.head).sum
    assert(g.getSeq[Double](1).head == expected0)
  }
}
