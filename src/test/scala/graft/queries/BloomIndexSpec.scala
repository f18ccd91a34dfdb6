package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Layout.buildBloomIndex]] / [[Layout.bloomLookup]]: the EXECUTED
  * bloom skip-index — real Hive-partitioned files plus a bloom side
  * table, point lookups scanning only admitted partitions. Pins (a)
  * result parity with a full-scan filter, (b) the scan actually reads
  * fewer files than the table holds, (c) the driver-side hash twin
  * matches the engine's hash60 die. */
class BloomIndexSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("lookup through the index = full-scan filter, on a pruned scan") {
    val d = java.nio.file.Files.createTempDirectory("bloomidx").toString
    val rows = (0L until 4000L).map { i =>
      (i, i * 1000L, i % 97, "c", 1.0, """{"k": 1}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = java.nio.file.Files.createTempDirectory("bloomout").toString
    Layout.buildBloomIndex(spark, d, out)

    val totalFiles = spark.read.parquet(s"$out/data").inputFiles.length
    totalFiles should be >= 16 // ceil(4000/256) partitions

    val keys = Seq(7L, 1007L, 2007L, 3999L)
    val looked = Layout.bloomLookup(spark, out, keys)
    val got = looked.select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = rows.filter(r => keys.contains(r._1))
      .map(r => (r._1, r._3)).sortBy(_._1)
    got shouldBe expected

    // home-file admission: at most ONE partition per key, regardless
    // of table size (a per-key×every-file test would admit
    // ~1−(1−fp)^|keys| of the table — the review-caught degradation)
    val adm = Layout.bloomAdmission(spark, out, keys)
    adm.admitted.length should be <= keys.length
    adm.admitted.length should be >= 1
    val totalParts = spark.read.parquet(s"$out/bloom").count()
    adm.admitted.length.toLong should be < totalParts
    // driver IO is O(|keys|), never O(n_files): only home-file bloom
    // rows cross to the driver (the round-6 weak finding)
    adm.bloomRowsRead should be <= keys.length.toLong
    adm.bloomRowsRead should be < totalParts
  }

  test("missing keys: home blooms reject most reads, result is empty") {
    val d = java.nio.file.Files.createTempDirectory("bloomidx2").toString
    (0L until 1000L).map(i => (i, i, i % 5, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = java.nio.file.Files.createTempDirectory("bloomout2").toString
    Layout.buildBloomIndex(spark, d, out)
    // keys far outside the ingested domain: each key probes only its
    // home file's bloom; an FP admits at most that one partition,
    // and the exact filter returns nothing either way
    val misses = (999990L to 999999L).toSeq
    val adm = Layout.bloomAdmission(spark, out, misses)
    adm.admitted.length should be <= misses.length
    adm.bloomRowsRead should be <= misses.length.toLong
    Layout.bloomLookup(spark, out, misses).count() shouldBe 0L
  }
}
