package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Pins the incremental near-dup plumbing: the band store
  * accumulates admitted documents' bands across batches, an exact
  * re-send collides with certainty (J = 1 ⇒ every band equal), and
  * distinct documents pass. Recall for PARTIAL overlaps is the
  * banding math pinned by the Dedup specs — here we pin the
  * cross-batch state machine.
  */
class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog while " +
    "the indexer watches carefully from the warm server room"
  private val docB = "completely different content about spark shuffles " +
    "partitions and the adaptive query execution planner at scale"
  private val docC = "a third unrelated document mentioning parquet row " +
    "groups column pruning and predicate pushdown behavior"

  private def df(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("cross-batch admission: duplicates of admitted docs are dropped") {
    val store = Files.createTempDirectory("graft-bandstore").toString + "/s"
    val b1 = EventStreams.dedupBatchAgainstStore(
      df(1L -> docA, 2L -> docB), store)
    assert(b1.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
    // batch 2: exact dup of A (dropped), new doc C (admitted)
    val b2 = EventStreams.dedupBatchAgainstStore(
      df(3L -> docA, 4L -> docC), store)
    assert(b2.select("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(4L))
    // batch 3: dups of everything admitted so far → empty
    val b3 = EventStreams.dedupBatchAgainstStore(
      df(5L -> docB, 6L -> docC), store)
    assert(b3.count() == 0)
  }

  test("streaming wrapper runs the same admission per micro-batch") {
    val in = Files.createTempDirectory("graft-inddocs").toString
    val store = Files.createTempDirectory("graft-bandstore2").toString + "/s"
    df(1L -> docA, 2L -> docB).coalesce(1)
      .write.parquet(s"$in/f0.parquet")
    df(3L -> docA, 4L -> docC).coalesce(1)
      .write.parquet(s"$in/f1.parquet")
    // flatten part files so maxFilesPerTrigger sees one file per batch
    val flat = Files.createTempDirectory("graft-inddocs-flat").toString
    var n = 0
    def copy(d: java.io.File): Unit = d.listFiles().sortBy(_.getName)
      .foreach { f =>
        if (f.isDirectory) copy(f)
        else if (f.getName.endsWith(".parquet")) {
          Files.copy(f.toPath,
            java.nio.file.Paths.get(flat, s"p$n.parquet"))
          n += 1
        }
      }
    copy(new java.io.File(in))
    val schema = df(0L -> "").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(flat)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventStreams.incrementalNearDup(stream, store) { (out, _) =>
      admitted.synchronized {
        admitted ++= out.select("doc_id").collect().map(_.getLong(0))
      }
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // order within a batch is not defined; across batches it is
    assert(admitted.sorted.toSeq == Seq(1L, 2L, 4L),
      s"admitted: $admitted")
  }
}
