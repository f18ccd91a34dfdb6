package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[TableLog]] — the manifest-log versioned table: snapshot
  * isolation under mutation (v0 files byte-stable and readable after
  * MERGE + OPTIMIZE), file-level COW (untouched files carried by
  * reference, only key-containing files rewritten), the
  * manifest-last crash discipline (orphan data files don't change
  * the table), and the single-writer commit check. */
class TableLogSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def base() = (0L until 2000L)
    .map(i => (i, s"body $i", i % 13)).toDF("id", "body", "grp")

  private def snapshot(dir: String, v: Option[Int] = None) =
    TableLog.readVersion(spark, dir, v)
      .select("id", "body", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

  test("base -> upsert -> compact: every version stays readable") {
    val dir = Files.createTempDirectory("tablelog").toString
    // several base files so COW has untouched files to carry
    TableLog.writeBase(spark, base().repartition(8), dir)
    TableLog.currentVersion(spark, dir) shouldBe 0
    val v0 = snapshot(dir)
    v0.size shouldBe 2000

    // MERGE: update ids 0/100/200, insert 9001
    val batch = Seq((0L, "updated 0", 99L), (100L, "updated 100", 99L),
      (200L, "updated 200", 99L), (9001L, "fresh", 99L))
      .toDF("id", "body", "grp")
    val v0Files = TableLog.liveFiles(spark, dir)
    TableLog.upsert(spark, dir, batch, "id")
    TableLog.currentVersion(spark, dir) shouldBe 1
    val v1 = snapshot(dir)
    v1.size shouldBe 2001
    assert(!v1.contains((0L, "body 0", 0L)))
    assert(v1.contains((9001L, "fresh", 99L)))
    assert(v1.contains((0L, "updated 0", 99L)))
    // COW: untouched base files are carried BY REFERENCE
    val v1Files = TableLog.liveFiles(spark, dir)
    val carried = v0Files.toSet.intersect(v1Files.toSet)
    assert(carried.nonEmpty, "no base file carried — COW rewrote everything")
    assert(v0Files.toSet != v1Files.toSet)

    // OPTIMIZE: content-identical, fewer files, prior versions intact
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    TableLog.currentVersion(spark, dir) shouldBe 2
    snapshot(dir) shouldBe v1
    TableLog.liveFiles(spark, dir).size should be <
      v1Files.size
    // TIME TRAVEL: v0 and v1 still read exactly
    snapshot(dir, Some(0)) shouldBe v0
    snapshot(dir, Some(1)) shouldBe v1
  }

  test("upsert rewrites ONLY files containing batch keys") {
    val dir = Files.createTempDirectory("tablelog-cow").toString
    // range-partitioned files → each id lives in a known file
    TableLog.writeBase(spark,
      base().repartitionByRange(8, col("id")), dir)
    val before = TableLog.liveFiles(spark, dir)
    // one batch key → at most one data file contains it
    TableLog.upsert(spark, dir,
      Seq((42L, "updated", 0L)).toDF("id", "body", "grp"), "id")
    val after = TableLog.liveFiles(spark, dir)
    val removed = before.toSet.diff(after.toSet)
    removed.size shouldBe 1 // exactly the file holding id 42
    snapshot(dir).size shouldBe 2000
  }

  test("manifest key stats prune the MERGE touch-scan to overlapping " +
      "files, and survive every mutation") {
    val dir = Files.createTempDirectory("tablelog-stats").toString
    TableLog.writeBase(spark,
      base().repartitionByRange(10, col("id"))
        .sortWithinPartitions(col("id")),
      dir, statsKey = Some("id"))
    TableLog.statsKeyOf(spark, dir) shouldBe Some("id")
    // every live file carries its key range in the LOG
    val stats = TableLog.liveFileStats(spark, dir)
    stats.size shouldBe 10
    all(stats.map(_.keyRange.isDefined)) shouldBe true
    // a narrow batch's candidate set is the overlapping file(s), not
    // the table — the decision comes from the manifest alone
    val narrow = Seq((42L, "u", 0L), (43L, "u", 0L)).toDF("id", "body", "grp")
    TableLog.statsCandidates(spark, dir, narrow, "id") shouldBe 1
    // a cross-range batch overlaps two files
    val wide = Seq((42L, "u", 0L), (1999L, "u", 0L)).toDF("id", "body", "grp")
    TableLog.statsCandidates(spark, dir, wide, "id") should be <= 2

    // the upsert itself stays correct AND the new file gets stats too
    TableLog.upsert(spark, dir, narrow, "id")
    snapshot(dir).size shouldBe 2000
    val after = TableLog.liveFileStats(spark, dir)
    all(after.map(_.keyRange.isDefined)) shouldBe true
    // compaction carries stats through as well
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    all(TableLog.liveFileStats(spark, dir).map(_.keyRange.isDefined)) shouldBe
      true
    snapshot(dir).size shouldBe 2000
    // a non-stats key falls back to every file (no wrong pruning)
    TableLog.statsCandidates(spark, dir, narrow, "body") shouldBe
      TableLog.liveFileStats(spark, dir).size
  }

  test("a SECOND compact over a prior compact's output keeps exact " +
      "content (bin-dir part files share basenames across directories)") {
    val dir = Files.createTempDirectory("tablelog-cc").toString
    TableLog.writeBase(spark, base().repartition(8), dir)
    val v0 = snapshot(dir)
    // first compact: small target → many bins, so one task writes the
    // SAME part-file basename into several _graft_bin= directories
    TableLog.compact(spark, dir, targetBytes = 8L << 10)
    snapshot(dir) shouldBe v0
    // second compact reads those same-basename files — a
    // basename-keyed bin join would fan rows out and duplicate them
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    snapshot(dir) shouldBe v0
    TableLog.readVersion(spark, dir).count() shouldBe 2000L
  }

  test("manifest-last crash discipline: orphan data files change nothing") {
    val dir = Files.createTempDirectory("tablelog-crash").toString
    TableLog.writeBase(spark, base(), dir)
    val v0 = snapshot(dir)
    // a crashed writer: data files landed, the manifest never did
    Seq((777777L, "orphan", 0L)).toDF("id", "body", "grp")
      .write.parquet(s"$dir/data/v00001")
    TableLog.currentVersion(spark, dir) shouldBe 0
    snapshot(dir) shouldBe v0
  }

  test("OPTIMIZE ZORDER: content-identical, and a 2-D box prunes " +
      "z-clustered files where the 1-D sort layout keeps nearly all") {
    def minMax(dir: String): Seq[(Long, Long, Long, Long)] =
      TableLog.liveFiles(spark, dir).map { rel =>
        val r = spark.read.parquet(s"$dir/$rel")
          .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b")))
          .head
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    def keptBy(stats: Seq[(Long, Long, Long, Long)]): Int =
      stats.count { case (alo, ahi, blo, bhi) =>
        ahi >= 64 && alo <= 79 && bhi >= 64 && blo <= 79 // a ~1/16 box
      }
    // two independent uniform dims in [0, 256)
    val rows = (0L until 60000L).map { i =>
      val h = i * 2654435761L
      (i, (h >>> 7) % 256L, (h >>> 17) % 256L)
    }.toDF("id", "a", "b")

    val zdir = Files.createTempDirectory("tablelog-z").toString
    TableLog.writeBase(spark, rows.repartition(4), zdir)
    val before = snapshotAb(zdir)
    TableLog.compactZorder(spark, zdir, col("a"), col("b"), nFiles = 32)
    TableLog.currentVersion(spark, zdir) shouldBe 1
    snapshotAb(zdir) shouldBe before // content identity through the log
    TableLog.liveFiles(spark, zdir).size shouldBe 32
    val zKept = keptBy(minMax(zdir))

    // the baseline: ingestion order (sorted by id) — neither
    // dimension correlates with file boundaries, so min/max stats
    // keep ~every file for the 2-D box
    val sdir = Files.createTempDirectory("tablelog-s").toString
    TableLog.writeBase(spark,
      rows.repartitionByRange(32, col("id")).sortWithinPartitions(col("id")),
      sdir)
    val sKept = keptBy(minMax(sdir))

    zKept should be < 12 // the z layout's whole point
    sKept should be >= 28 // ingest order keeps ~every file
    zKept.toDouble should be < sKept / 2.0
  }

  private def snapshotAb(dir: String) =
    TableLog.readVersion(spark, dir)
      .select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("schema evolution: an upsert batch adds a column; old versions " +
      "keep their schema, the latest null-fills old rows") {
    val dir = Files.createTempDirectory("tablelog-evo").toString
    TableLog.writeBase(spark,
      base().repartitionByRange(4, col("id")), dir)
    // batch carries a NEW column `score`
    val batch = Seq((5L, "updated 5", 0L, 0.9),
      (9005L, "fresh", 0L, 0.5)).toDF("id", "body", "grp", "score")
    // without the opt-in, a differing column set fails LOUDLY — a
    // typo'd column must never silently null real data
    intercept[IllegalArgumentException] {
      TableLog.upsert(spark, dir, batch, "id")
    }
    // a type conflict on a shared column is refused even WITH the
    // opt-in: such files would commit but never schema-merge on read
    intercept[IllegalArgumentException] {
      TableLog.upsert(spark, dir,
        Seq((5L, "u", "not-a-long")).toDF("id", "body", "grp"), "id",
        allowSchemaEvolution = true)
    }
    TableLog.isEvolved(spark, dir) shouldBe false
    TableLog.upsert(spark, dir, batch, "id", allowSchemaEvolution = true)
    TableLog.isEvolved(spark, dir) shouldBe true

    val latest = TableLog.readVersion(spark, dir)
    latest.columns.toSet shouldBe Set("id", "body", "grp", "score")
    latest.count() shouldBe 2001
    // evolved rows carry the value; pre-evolution rows read null
    latest.filter(col("id") === 5L).select("score")
      .head.getDouble(0) shouldBe 0.9
    latest.filter(col("id") === 6L).select("score")
      .head.isNullAt(0) shouldBe true
    // untouched carried files never rewrote: most rows still null
    latest.filter(col("score").isNull).count() shouldBe 1999
    // time travel: v0 has the ORIGINAL schema
    TableLog.readVersion(spark, dir, Some(0)).columns.toSet shouldBe
      Set("id", "body", "grp")
    // a second upsert with the OLD schema (missing `score`) works
    // under the opt-in (REPLACE semantics: the replaced row's score
    // null-fills)
    TableLog.upsert(spark, dir,
      Seq((7L, "updated 7", 0L)).toDF("id", "body", "grp"), "id",
      allowSchemaEvolution = true)
    val v2 = TableLog.readVersion(spark, dir)
    v2.count() shouldBe 2001
    v2.columns.toSet shouldBe Set("id", "body", "grp", "score")
    // COMPACTION of an evolved table must carry the evolved column —
    // a single-footer schema inference would silently drop it and a
    // vacuum would then delete its only copies (review-caught)
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    val compacted = TableLog.readVersion(spark, dir)
    compacted.columns.toSet shouldBe Set("id", "body", "grp", "score")
    compacted.filter(col("id") === 5L).select("score")
      .head.getDouble(0) shouldBe 0.9
    compacted.count() shouldBe 2001
  }

  test("checkpoint bounds replay cost; snapshots and time travel " +
      "read identically through it") {
    val dir = Files.createTempDirectory("tablelog-ckpt").toString
    TableLog.writeBase(spark,
      base().repartitionByRange(2, col("id"))
        .sortWithinPartitions(col("id")),
      dir, statsKey = Some("id"))
    (0 until 6).foreach { i =>
      TableLog.appendOnce(spark, dir,
        Seq((10000L + i, s"a$i", 0L)).toDF("id", "body", "grp"),
        "app", i.toLong)
    }
    TableLog.currentVersion(spark, dir) shouldBe 6
    TableLog.replayCost(spark, dir) shouldBe 7 // v0..v6, no checkpoint
    val full = snapshot(dir)

    val statsBefore = TableLog.liveFileStats(spark, dir)
      .map(e => e.rel -> e.keyRange).toMap
    all(statsBefore.values.map(_.isDefined)) shouldBe true
    TableLog.checkpoint(spark, dir)
    TableLog.replayCost(spark, dir) shouldBe 1 // just the checkpoint
    snapshot(dir) shouldBe full // identical through the checkpoint
    // the manifest KEY STATS survive the checkpoint round trip
    // entry-for-entry — a serialize/parse regression here would
    // silently break MERGE pruning after the first checkpoint
    TableLog.liveFileStats(spark, dir)
      .map(e => e.rel -> e.keyRange).toMap shouldBe statsBefore
    // re-checkpointing the same version is a no-op, not a rewrite
    TableLog.checkpoint(spark, dir)
    TableLog.replayCost(spark, dir) shouldBe 1

    // commits after the checkpoint replay checkpoint + delta
    TableLog.upsert(spark, dir,
      Seq((10000L, "updated", 1L)).toDF("id", "body", "grp"), "id")
    TableLog.replayCost(spark, dir) shouldBe 2
    snapshot(dir).size shouldBe 2006
    assert(snapshot(dir).contains((10000L, "updated", 1L)))
    // pre-checkpoint time travel still replays exactly (from v0):
    // v3 = base (2000) + the first three one-row appends
    snapshot(dir, Some(3)).size shouldBe 2003
    // the post-checkpoint commit's data file carries stats covering
    // the upserted key (a zero-row part file may also commit — it
    // gets no stats and the pruner includes it conservatively, which
    // is correct, so don't assert every file has stats here)
    assert(TableLog.liveFileStats(spark, dir).exists(
      _.keyRange.exists(r => r._1 <= 10000L && r._2 >= 10000L)))
  }

  test("a second writer racing the same version is refused at commit") {
    val dir = Files.createTempDirectory("tablelog-race").toString
    TableLog.writeBase(spark, base(), dir)
    val v0 = snapshot(dir)
    // the race window: both writers read currentVersion=0 and target
    // v1; writer A commits first...
    TableLog.commit(spark, dir, 1, adds = Seq.empty, removes = Seq.empty)
    // ...writer B's commit of the SAME version must be refused, and
    // the table must still read as writer A left it
    intercept[IllegalArgumentException] {
      TableLog.commit(spark, dir, 1,
        adds = Seq(TableLog.AddEntry("data/v00001/loser.parquet", None)),
        removes = Seq.empty)
    }
    TableLog.currentVersion(spark, dir) shouldBe 1
    snapshot(dir) shouldBe v0 // A's empty commit changed nothing
    // and a late writeBase on a non-empty table is refused too
    intercept[IllegalArgumentException] {
      TableLog.writeBase(spark, base(), dir)
    }
  }
}
