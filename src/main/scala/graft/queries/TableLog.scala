package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-table tier: a manifest log over plain parquet files —
  * the Delta/Iceberg shape a 100 TB training-data pipeline actually
  * mutates through, built on the primitives this engine already has
  * (COW upsert, one-job compaction, file-level pruning).
  *
  * Layout: `dir/data/v<N>/…parquet` (files written by version N) +
  * `dir/_log/v%05d.manifest` — one manifest per committed version,
  * TSV lines `add\t<relpath>` / `remove\t<relpath>`. A snapshot is
  * the log replay up to a version: metadata work bounded by FILE
  * COUNT, never data size. Reads are `spark.read.parquet(liveFiles)`
  * — ordinary pruned scans.
  *
  * The commit discipline is the standard one: data files land first,
  * the manifest is written LAST and is the atomic commit point — a
  * crash mid-write leaves orphan data files and an unchanged table.
  * Single-writer by contract ([[commit]] refuses to overwrite an
  * existing version — the optimistic-concurrency check); multi-writer
  * arbitration (retry/rebase) is a documented cut.
  *
  * Mutations never touch committed files, so EVERY prior version
  * stays readable — time travel — until a vacuum (not provided; a
  * real deployment ages out unreferenced files after a retention
  * window, exactly Delta's VACUUM).
  */
object TableLog {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(dir: String) = new Path(dir, "_log")

  /** Earliest version still readable (0 unless [[vacuum]] advanced
    * the watermark). */
  def earliestVersion(spark: SparkSession, dir: String): Int = {
    val fs = fsOf(spark, dir)
    val p = new Path(logDir(dir), "_earliest")
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String({
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        buf
      }, StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    }
  }

  /** Latest committed version, or -1 for an empty table. */
  def currentVersion(spark: SparkSession, dir: String): Int = {
    val fs = fsOf(spark, dir)
    val ld = logDir(dir)
    if (!fs.exists(ld)) -1
    else fs.listStatus(ld).map(_.getPath.getName)
      .collect { case n if n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .foldLeft(-1)(math.max)
  }

  /** Commit `adds`/`removes` (dir-relative paths) as version `v`,
    * optionally stamped with a writer transaction id (`txn` lines are
    * how an idempotent streaming sink recognizes its own replayed
    * batch). The manifest write is the atomic commit point; an
    * existing manifest for `v` means a concurrent writer won —
    * refuse. */
  private[queries] def commit(spark: SparkSession, dir: String, v: Int,
      adds: Seq[String], removes: Seq[String],
      txn: Option[String] = None): Unit = {
    val fs = fsOf(spark, dir)
    val p = new Path(logDir(dir), f"v$v%05d.manifest")
    require(!fs.exists(p),
      s"TableLog: version $v already committed (concurrent writer?)")
    val body = (txn.map("txn\t" + _).toSeq ++
      removes.map("remove\t" + _) ++ adds.map("add\t" + _))
      .mkString("", "\n", "\n")
    val out = fs.create(p, false) // no overwrite — the atomicity claim
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** All transaction ids committed so far — O(log lines) driver
    * metadata, like every log replay. */
  private def committedTxns(spark: SparkSession, dir: String)
      : Set[String] = {
    val fs = fsOf(spark, dir)
    val latest = currentVersion(spark, dir)
    (0 to latest).flatMap { v =>
      manifestLines(fs, dir, v).collect {
        case (action, value) if action == "txn" => value
      }
    }.toSet
  }

  private def manifestLines(fs: FileSystem, dir: String, v: Int)
      : Seq[(String, String)] = {
    val p = new Path(logDir(dir), f"v$v%05d.manifest")
    require(fs.exists(p), s"TableLog: missing manifest v$v (corrupt log)")
    val in = fs.open(p)
    val text = try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, StandardCharsets.UTF_8)
    } finally in.close()
    text.split('\n').filter(_.nonEmpty).toSeq.map { line =>
      val Array(action, value) = line.split('\t')
      (action, value)
    }
  }

  /** Live dir-relative file paths at `version` (latest if None) —
    * pure log replay, O(total log lines) driver metadata. Versions
    * below the [[vacuum]] watermark fail HERE, loudly, instead of at
    * scan time on a missing data file. */
  def liveFiles(spark: SparkSession, dir: String,
      version: Option[Int] = None): Seq[String] = {
    val fs = fsOf(spark, dir)
    val upTo = version.getOrElse(currentVersion(spark, dir))
    require(upTo >= 0, s"TableLog: no committed version in $dir")
    val earliest = earliestVersion(spark, dir)
    require(upTo >= earliest,
      s"TableLog: version $upTo was vacuumed (earliest readable: " +
        s"$earliest)")
    val live = scala.collection.mutable.LinkedHashSet[String]()
    (0 to upTo).foreach { v =>
      manifestLines(fs, dir, v).foreach {
        case ("add", rel) => live += rel
        case ("remove", rel) =>
          require(live.remove(rel),
            s"TableLog: v$v removes unknown file $rel")
        case ("txn", _) => () // writer-idempotence stamp, not a file
        case (other, _) =>
          throw new IllegalArgumentException(
            s"TableLog: bad manifest action $other")
      }
    }
    live.toSeq
  }

  /** Snapshot read — an ordinary parquet scan over the version's
    * explicit file list (column pruning / filter pushdown apply as
    * on any parquet read). */
  def readVersion(spark: SparkSession, dir: String,
      version: Option[Int] = None): DataFrame =
    spark.read.parquet(
      liveFiles(spark, dir, version).map(r => s"$dir/$r"): _*)

  /** Dir-relative parquet paths of an already-written `data/v<N>`. */
  private def writeDataList(spark: SparkSession, dir: String,
      sub: String): Seq[String] = {
    val fs = fsOf(spark, dir)
    fs.listStatus(new Path(dir, sub))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$sub/${s.getPath.getName}").toSeq.sorted
  }

  /** Write `df`'s files under `data/v<N>` and return their
    * dir-relative paths. */
  private def writeData(spark: SparkSession, df: DataFrame, dir: String,
      v: Int): Seq[String] = {
    val sub = f"data/v$v%05d"
    df.write.mode("overwrite").parquet(s"$dir/$sub")
    writeDataList(spark, dir, sub)
  }

  /** Version 0: materialize `df` as the table's base snapshot. */
  def writeBase(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    require(currentVersion(spark, dir) == -1,
      s"TableLog: $dir already has a log — writeBase is v0 only")
    commit(spark, dir, 0, writeData(spark, df, dir, 0), Nil)
  }

  /** Copy-on-write MERGE: rows of `batch` replace same-`key` rows;
    * unmatched batch rows insert. Only files that CONTAIN a batch key
    * are rewritten (one column-pruned scan of the live files finds
    * them — the standard Delta MERGE touch-scan; the engine's
    * stats/bloom skipping composes in front of it at deployment
    * scale); untouched files are carried by reference, never read or
    * rewritten. */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
      key: String): Unit = {
    val v = currentVersion(spark, dir) + 1
    require(v >= 1, s"TableLog: no base version in $dir")
    val live = liveFiles(spark, dir)
    val fs = fsOf(spark, dir)
    // dir-relative path by the scan's own URI rendering (the
    // compactFiles file-name-encoding lesson)
    val uriOf = live.map { rel =>
      fs.makeQualified(new Path(s"$dir/$rel")).toUri.toString -> rel
    }.toMap
    val cur = readVersion(spark, dir)
    val keys = batch.select(col(key)).distinct()
    val touchedUris = cur.withColumn("_graft_file", input_file_name())
      .join(broadcast(keys), Seq(key), "left_semi")
      .select(col("_graft_file")).distinct()
      .collect().map(_.getString(0)).toSeq
    val touched = touchedUris.map(u => uriOf.getOrElse(u,
      throw new IllegalStateException(
        s"TableLog: scan file $u not in the live set")))
    val rewritten =
      if (touched.isEmpty) batch
      else spark.read.parquet(touched.map(r => s"$dir/$r"): _*)
        .join(broadcast(keys), Seq(key), "left_anti")
        .unionByName(batch)
    commit(spark, dir, v, writeData(spark, rewritten, dir, v), touched)
  }

  /** OPTIMIZE: rewrite the live files into target-sized bins (the
    * q_compact_plan cumulative rule, ONE distributed job — same shape
    * as [[Layout.compactFiles]]) and commit remove(old)+add(new).
    * Content-identical by construction; prior versions stay
    * readable. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Unit = {
    require(targetBytes > 0, "TableLog.compact needs targetBytes > 0")
    val v = currentVersion(spark, dir) + 1
    require(v >= 1, s"TableLog: no base version in $dir")
    val live = liveFiles(spark, dir)
    val fs = fsOf(spark, dir)
    val sized = live.map { rel =>
      val st = fs.getFileStatus(new Path(s"$dir/$rel"))
      (rel, st.getLen)
    }.sortBy { case (p, len) => (-len, p) }
    val binOf = sized.zip(sized.scanLeft(0L)(_ + _._2))
      .map { case ((rel, _), cum) => (rel, cum / targetBytes) }
    val nBins = binOf.map(_._2).distinct.length
    import spark.implicits._
    val binMap = binOf.map { case (rel, b) =>
      (fs.makeQualified(new Path(s"$dir/$rel")).toUri.toString
        .split('/').last, b)
    }.toDF("_graft_fname", "_graft_bin")
    val sub = f"data/v$v%05d"
    spark.read.parquet(live.map(r => s"$dir/$r"): _*)
      .withColumn("_graft_fname",
        element_at(split(input_file_name(), "/"), -1))
      .join(broadcast(binMap), "_graft_fname")
      .drop("_graft_fname")
      .repartition(nBins, col("_graft_bin"))
      .write.mode("overwrite").partitionBy("_graft_bin")
      .parquet(s"$dir/$sub")
    val adds = fs.listStatus(new Path(dir, sub)).filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$sub/${s.getPath.getParent.getName}/${s.getPath.getName}")
      .toSeq.sorted
    commit(spark, dir, v, adds, live)
  }

  /** OPTIMIZE ZORDER: rewrite the live files CLUSTERED on the Morton
    * interleave of two bucket expressions ([[Layout.zOf]] — each in
    * [0, 2^[[Layout.ZBits]])), so every output file covers a tight
    * box in BOTH dimensions and a scan planner's min/max stats prune
    * multi-dimension predicates (the 1-D sort layout keeps a tight
    * range only on its leading column). One distributed job: range
    * partition on the z expression (no materialized column — the
    * output schema is untouched), sort within partitions, commit
    * remove(old)+add(new) like [[compact]]. Content-identical;
    * prior versions stay readable. */
  def compactZorder(spark: SparkSession, dir: String,
      ub: org.apache.spark.sql.Column, vb: org.apache.spark.sql.Column,
      nFiles: Int): Unit = {
    require(nFiles > 0, "compactZorder needs nFiles > 0")
    val v = currentVersion(spark, dir) + 1
    require(v >= 1, s"TableLog: no base version in $dir")
    val live = liveFiles(spark, dir)
    val z = Layout.zOf(ub, vb)
    val sub = f"data/v$v%05d"
    spark.read.parquet(live.map(r => s"$dir/$r"): _*)
      .repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(s"$dir/$sub")
    commit(spark, dir, v, writeDataList(spark, dir, sub), live)
  }

  /** Idempotent APPEND — the streaming-sink primitive: if `txnId` is
    * already stamped in the log (a foreachBatch crash replay re-runs
    * the batch with the SAME id), the call is a no-op; otherwise the
    * batch's files land and commit stamped with the id, so the
    * manifest's own atomicity makes ingest EXACTLY-ONCE — a crash
    * between data write and commit leaves orphans and no version, a
    * crash after commit replays into the txn no-op. This is the
    * txn-marker discipline of real table formats (Delta's
    * txn appId+version). */
  def appendOnce(spark: SparkSession, dir: String, batch: DataFrame,
      txnId: String): Unit = {
    if (committedTxns(spark, dir).contains(txnId)) return
    val v = currentVersion(spark, dir) + 1
    require(v >= 1, s"TableLog: no base version in $dir")
    commit(spark, dir, v, writeData(spark, batch, dir, v), Nil,
      txn = Some(txnId))
  }

  /** Retention: delete data files referenced ONLY by versions older
    * than the newest `retainVersions`, and advance the earliest-
    * readable watermark — a vacuumed version fails loudly at
    * [[liveFiles]], not with a missing-file scan error. Manifests are
    * kept (the replay history is metadata-cheap and keeps txn
    * idempotence intact). Returns the number of files deleted. */
  def vacuum(spark: SparkSession, dir: String,
      retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "vacuum must retain >= 1 version")
    val fs = fsOf(spark, dir)
    val latest = currentVersion(spark, dir)
    require(latest >= 0, s"TableLog: no committed version in $dir")
    val earliest = math.max(earliestVersion(spark, dir),
      latest - retainVersions + 1)
    val keep = (earliest to latest)
      .flatMap(v => liveFiles(spark, dir, Some(v))).toSet
    // watermark FIRST: once readers are fenced off the vacuumed
    // versions, a crash midway through the deletes leaves only
    // unreadable-anyway garbage, never a readable version with
    // missing files
    val wm = fs.create(new Path(logDir(dir), "_earliest"), true)
    try wm.write(earliest.toString.getBytes(StandardCharsets.UTF_8))
    finally wm.close()
    // every file the log ever added
    val everAdded = (0 to latest).flatMap(v =>
      manifestLines(fs, dir, v).collect { case ("add", rel) => rel })
    var deleted = 0
    everAdded.filterNot(keep).distinct.foreach { rel =>
      val p = new Path(s"$dir/$rel")
      if (fs.exists(p) && fs.delete(p, false)) deleted += 1
    }
    deleted
  }
}
