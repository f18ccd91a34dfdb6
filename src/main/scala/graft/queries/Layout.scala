package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Quantiles
import graft.queries.Num._

/** Data-layout planning — the write-side lever that decides read-side
  * scan cost at 100 TB. A parquet/table-format file prunes on per-file
  * min/max ranges; rows sorted on ONE dimension give perfect pruning
  * on that dimension and none on any other. Z-ordering (bit-wise
  * interleaving of the clustering dimensions — the Morton curve, the
  * layout behind OPTIMIZE ZORDER in modern lakehouse formats) spends
  * the ordering budget across dimensions so every interleaved column
  * gets usable file ranges.
  *
  * The query audits exactly that: bucket events on two dimensions
  * (user and value), z-interleave the buckets, carve the corpus into
  * [[ZTiles]] equal files in z order, and report each file's
  * per-dimension min/max — the numbers a scan planner would prune
  * with. The ScalaTest proves the point against a 1-D layout: a
  * value-only box query touches every user-sorted file but only a
  * fraction of the z-ordered ones.
  *
  * Scale shape: the z-key is a per-row integer expression (codegen'd
  * shifts, no UDF); file assignment uses
  * [[graft.operators.Quantiles.tileOverlaps]] — exact ntile semantics
  * from a bounded histogram (≤ 2¹⁶ distinct z values by
  * construction, because both buckets are 8-bit) instead of a global
  * sort through one reducer. Per-file dimension ranges fall out of
  * the histogram FOR FREE: ub/vb are bit-functions of the z value, so
  * de-interleaving the histogram rows inside each tile yields exact
  * min/max without touching data rows again. Everything is integer;
  * the oracle keeps DuckDB's literal `ntile(32)` window, so the hash
  * gate re-proves the rank arithmetic ≡ ntile (same proof shape as
  * q_events_quartiles).
  *
  * Tie semantics: rows sharing a z value may straddle a file edge;
  * which COPIES cross is tie-broken arbitrarily, but since both
  * dimensions are functions of z, per-file ranges and counts are
  * invariant to the choice (the tileOverlaps contract). */
object Layout {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Bits per interleaved dimension: 8+8 → z < 2¹⁶, a histogram
    * bounded forever (the quantized-value license of Quantiles). */
  val ZBits = 8
  /** Output files (ntile buckets) in z order. */
  val ZTiles = 32

  /** user bucket = user_id mod 2⁸; value bucket = value/2 capped at
    * 255 (value spans [0, ~500] — /2 is a power-of-two float divide,
    * exact in IEEE, so the floor is wobble-free cross-engine). */
  private def ubCol: Column = pmod(col("user_id"), lit(256L)).cast("long")
  private def vbCol: Column =
    least(floor(col("value") / 2.0), lit(255L)).cast("long")

  /** Morton interleave: ub on odd bits, vb on even bits. Shared with
    * [[TableLog.compactZorder]] (OPTIMIZE ZORDER through the log). */
  private[queries] def zOf(ub: Column, vb: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(ub, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(vb, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** De-interleave dimension d (1 = odd bits → ub, 0 = even → vb). */
  private def unZ(z: Column, odd: Boolean): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(z, 2 * i + (if (odd) 1 else 0))
        .bitwiseAND(lit(1L)), i)
    }.reduce(_ + _)

  private def sqlZ(ub: String, vb: String): String =
    (0 until ZBits).map { i =>
      s"((($ub >> $i) & 1) << ${2 * i + 1}) + ((($vb >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  private def sqlUnZ(z: String, odd: Boolean): String =
    (0 until ZBits).map { i =>
      s"((($z >> ${2 * i + (if (odd) 1 else 0)}) & 1) << $i)"
    }.mkString(" + ")

  /** Per-file layout audit of the z-ordered events table: one row per
    * file with exact row count and per-dimension min/max. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val keyed = t(spark, dir, "events")
      .select(zOf(ubCol, vbCol).as("z"))
    Quantiles.tileOverlaps(keyed, "z", ZTiles)
      .groupBy(col("tile").cast("long").as("file_id"))
      .agg(sum(col("ov")).cast("long").as("n_rows"),
        min(col("v")).as("z_lo"), max(col("v")).as("z_hi"),
        min(unZ(col("v"), odd = true)).as("ub_lo"),
        max(unZ(col("v"), odd = true)).as("ub_hi"),
        min(unZ(col("v"), odd = false)).as("vb_lo"),
        max(unZ(col("v"), odd = false)).as("vb_hi"))
  }

  /** The layout-stats CTE chain + per-file aggregate body, shared by
    * [[zorderLayoutSql]] and [[statsPruneSql]]. */
  private val sqlLayoutStats: String = {
    val ub = "(user_id % 256)"
    val vb = "least(floor(value / 2.0), 255)::BIGINT"
    s"""k AS (SELECT (${sqlZ("ub", "vb")})::BIGINT AS z FROM
           (SELECT $ub AS ub, $vb AS vb FROM events)),
       tl AS (SELECT z, ntile($ZTiles) OVER (ORDER BY z) AS file_id FROM k),
       stats AS (
         SELECT file_id::BIGINT AS file_id, count(*)::BIGINT AS n_rows,
           min(z) AS z_lo, max(z) AS z_hi,
           min(${sqlUnZ("z", odd = true)})::BIGINT AS ub_lo,
           max(${sqlUnZ("z", odd = true)})::BIGINT AS ub_hi,
           min(${sqlUnZ("z", odd = false)})::BIGINT AS vb_lo,
           max(${sqlUnZ("z", odd = false)})::BIGINT AS vb_hi
         FROM tl GROUP BY 1)"""
  }

  val zorderLayoutSql: String =
    s"""WITH $sqlLayoutStats SELECT * FROM stats"""

  /** The box predicate [[statsPrune]] audits: a user-bucket range ×
    * value-bucket range, each ~1/16 of its dimension's domain. */
  val PruneUbLo = 32L
  val PruneUbHi = 47L
  val PruneVbLo = 100L
  val PruneVbHi = 131L

  /** Stats-based file skipping — the READ side of [[zorderLayout]]'s
    * write-side story, the exact decision a lakehouse scan planner
    * makes from footer/manifest ranges: a file survives a box
    * predicate iff its per-dimension [lo, hi] ranges overlap the box.
    * Emits every file's verdict plus its row count, so the result IS
    * the pruning audit: `sum(n_rows) where kept=0` is the IO the
    * layout saved at this selectivity (the companion ScalaTest proves
    * the same box keeps ~all files under a 1-D layout).
    *
    * Scale shape: the stats table is one row per FILE (corpus-size /
    * file-size rows — thousands at 100 TB, never corpus-sized), so
    * the pruning decision is a broadcast-scale computation regardless
    * of data volume; the expensive part (building stats) is the
    * already-histogram-bounded [[zorderLayout]] pass. */
  def statsPrune(spark: SparkSession, dir: String): DataFrame =
    zorderLayout(spark, dir)
      .withColumn("kept",
        (col("ub_hi") >= PruneUbLo && col("ub_lo") <= PruneUbHi &&
          col("vb_hi") >= PruneVbLo && col("vb_lo") <= PruneVbHi)
          .cast("long"))
      .select(col("file_id"), col("kept"), col("n_rows"))

  val statsPruneSql: String =
    s"""WITH $sqlLayoutStats
       SELECT file_id,
         CASE WHEN ub_hi >= $PruneUbLo AND ub_lo <= $PruneUbHi
               AND vb_hi >= $PruneVbLo AND vb_lo <= $PruneVbHi
              THEN 1 ELSE 0 END::BIGINT AS kept,
         n_rows
       FROM stats"""

  /** The row-level z key over raw `events` columns — exposed for the
    * ZorderSpec containment proof. */
  private[queries] def zExprForTest: Column = zOf(ubCol, vbCol)

  // ---------------------------------------------------------------
  // Bloom-filter file skipping
  // ---------------------------------------------------------------

  /** Bloom geometry: 16 words × 62 usable bits (bits 62/63 never set,
    * so the words stay non-negative in BOTH engines — no sign-bit
    * divergence between Java's arithmetic shift and DuckDB's), k = 4
    * probes by double hashing off the shared [[TextFunctions.hash60]]
    * die. */
  val BloomWords = 16
  val BloomBits = 62
  val BloomM: Long = BloomWords.toLong * BloomBits // 992
  val BloomK = 4
  /** Target rows per modeled file: blooms are sized PER FILE, so the
    * file count grows with the corpus and the bits-per-key ratio (and
    * with it the false-positive rate) stays constant at any scale —
    * exactly how a real table's file population behaves. */
  val BloomFileRows = 256L
  /** Deterministic probe ids: the 8 smallest event_ids ≡ 7 (mod 1000)
    * — data-derived, present at every scale factor. */
  val ProbeMod = 1000L
  val ProbeRem = 7L
  val ProbeLimit = 8

  /** Bloom-filter file skipping for POINT lookups on a column the
    * sort/z layout gives no min/max signal for — the other half of
    * the read-side pruning story next to [[statsPrune]]. Files are
    * modeled hash-partitioned on the lookup key's own 60-bit die
    * (`file = h mod T`, `T = ceil(N / 256)` — the layout a shuffled
    * write produces), so every file's [min, max] range on `event_id`
    * spans ~the whole domain and range stats keep everything; the
    * per-file bloom is what prunes.
    *
    * Output: one row per (probe, file) with the bloom verdict and the
    * file's true match count. No false negatives BY CONSTRUCTION
    * (every inserted key's bits are set); false positives are the
    * `kept = 1, n_match = 0` rows — at 992 bits / ~256 keys / k = 4
    * the expected FP rate is (1 − e^(−kn/m))^k ≈ 0.17, so a point
    * lookup touches ~1 + 0.17·(T−1) of T files.
    *
    * Scale shape: the bloom build is ONE native `bloom_or_agg`
    * aggregate (map-side combined — the exchange carries one 16-long
    * buffer per file per partition); the verdict join is probes ×
    * files, both metadata-sized. The N·probes term exists only in
    * the n_match audit and is bounded by a broadcast semi-join on 8
    * keys. */
  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val ev = t(spark, dir, "events").select(col("event_id"))
    // file count: metadata-scale driver action (same license as the
    // PQ-codebook collects — one long, not data)
    val n = ev.count()
    val tFiles = math.max(1L, math.ceil(n / BloomFileRows.toDouble).toLong)
    val hashed = ev
      .withColumn("h", hash60(col("event_id").cast("string")))
      .withColumn("fid", pmod(col("h"), lit(tFiles)))
      .withColumn("h1", pmod(col("h"), lit(BloomM)))
      .withColumn("h2", lit(1L) +
        pmod(expr(s"h div $BloomM"), lit(BloomM - 1L)))
    val withPos = (0 until BloomK).foldLeft(hashed) { (df, i) =>
      df.withColumn(s"p$i", pmod(col("h1") + lit(i.toLong) * col("h2"),
        lit(BloomM)))
    }
    // native bloom build: ONE aggregate sets all k bits per row
    // (the declarative per-word bit_or-over-CASE form evaluated
    // words·k CASEs per row — measured 3× slower at 100M events);
    // bit semantics identical, so the DuckDB oracle is unchanged
    graft.functions.GraftFunctions.register(spark)
    val blooms = hashed.groupBy(col("fid").as("file_id"))
      .agg(graft.functions.GraftFunctions
        .bloomOrAgg(col("h"), BloomWords, BloomBits, BloomK).as("warr"))
    val probes = withPos
      .filter(pmod(col("event_id"), lit(ProbeMod)) === lit(ProbeRem))
      .orderBy(col("event_id")).limit(ProbeLimit)
      .select(col("event_id").as("probe_id") +:
        (0 until BloomK).map(i => col(s"p$i").as(s"q$i")): _*)
    // bloom verdict: all k probe bits set in the file's words — the
    // word is an array index (the per-word w0..w15 expansion lives
    // only in the SQL oracle, whose dialect has no arrays of this
    // shape); variable shift amounts need SQL `shiftright` (the Scala
    // API only takes an Int literal)
    val verdictDf = probes.crossJoin(broadcast(blooms))
      .withColumn("kept",
        (0 until BloomK).map(i =>
          expr(s"(shiftright(element_at(warr, CAST(q$i div $BloomBits AS INT) + 1), " +
            s"CAST(q$i % $BloomBits AS INT)) & 1) = 1"))
          .reduce(_ && _).cast("long"))
      .select(col("probe_id"), col("file_id"), col("kept"))
    val matches = withPos
      .join(broadcast(probes.select(col("probe_id"))),
        col("event_id") === col("probe_id"))
      .groupBy(col("fid").as("file_id"), col("probe_id"))
      .agg(count(lit(1)).as("nm"))
    verdictDf
      .join(matches, Seq("probe_id", "file_id"), "left")
      .select(col("probe_id"), col("file_id"), col("kept"),
        coalesce(col("nm"), lit(0L)).cast("long").as("n_match"))
  }

  val bloomPruneSql: String = {
    val h60 = "CAST(concat('0x', substring(md5(event_id::VARCHAR), 1, 15)) AS BIGINT)"
    def contrib(w: Int): String =
      (0 until BloomK).map { i =>
        s"(CASE WHEN (p$i // $BloomBits) = $w THEN (CAST(1 AS BIGINT) << (p$i % $BloomBits)) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" | ")
    def wordCase(p: String): String =
      s"(CASE (${p} // $BloomBits) " +
        (0 until BloomWords).map(w => s"WHEN $w THEN w.w$w").mkString(" ") +
        " END)"
    val keptPred = (0 until BloomK).map { i =>
      s"(((${wordCase(s"pr.q$i")} >> (pr.q$i % $BloomBits)) & 1) = 1)"
    }.mkString(" AND ")
    s"""WITH nn AS (SELECT greatest(1, CAST(ceil(count(*) / ${BloomFileRows}.0) AS BIGINT)) AS t FROM events),
       b AS (SELECT event_id, $h60 AS h FROM events),
       f AS (SELECT event_id, h % (SELECT t FROM nn) AS fid,
               h % $BloomM AS h1, 1 + ((h // $BloomM) % ${BloomM - 1}) AS h2
             FROM b),
       p AS MATERIALIZED (SELECT event_id, fid,
             ${(0 until BloomK).map(i => s"(h1 + $i * h2) % $BloomM AS p$i").mkString(", ")}
           FROM f),
       w AS MATERIALIZED (SELECT fid AS file_id,
             ${(0 until BloomWords).map(w => s"bit_or(${contrib(w)}) AS w$w").mkString(", ")}
           FROM p GROUP BY 1),
       pr AS MATERIALIZED (SELECT event_id AS probe_id,
             ${(0 until BloomK).map(i => s"p$i AS q$i").mkString(", ")}
           FROM p WHERE event_id % $ProbeMod = $ProbeRem
           ORDER BY event_id LIMIT $ProbeLimit),
       k AS (SELECT pr.probe_id, w.file_id,
               CASE WHEN $keptPred THEN 1 ELSE 0 END::BIGINT AS kept
             FROM pr CROSS JOIN w),
       m AS (SELECT fid AS file_id, event_id AS probe_id,
               count(*)::BIGINT AS n_match
             FROM p WHERE event_id IN (SELECT probe_id FROM pr)
             GROUP BY 1, 2)
       SELECT k.probe_id, k.file_id, k.kept,
         coalesce(m.n_match, 0)::BIGINT AS n_match
       FROM k LEFT JOIN m
         ON k.probe_id = m.probe_id AND k.file_id = m.file_id"""
  }

  /** Materialized bloom skip-index: [[bloomPrune]] EXECUTED — the
    * keyed table lands Hive-partitioned by its hash-file id with a
    * side table of per-file blooms, and [[bloomLookup]] reads ONLY
    * the files whose bloom admits the probed keys. The side table is
    * file-count-sized; the kept-file list is a metadata-scale driver
    * collect feeding an `isin` partition filter, so the data scan is
    * partition-pruned before any IO. */
  /** Build the materialized index. `fileRows` and `words` scale
    * TOGETHER: real indexes size the bloom with the file (parquet's
    * own column blooms are KB-scale per file), so the bits-per-key
    * ratio — and with it the FP rate — is a free parameter
    * independent of file size. The defaults match [[bloomPrune]]'s
    * audit geometry; a production table uses bigger files with
    * proportionally bigger blooms (e.g. 4096 rows × 256 words keeps
    * the same ~16 bits/key). */
  def buildBloomIndex(spark: SparkSession, dir: String, out: String,
      fileRows: Long = BloomFileRows, words: Int = BloomWords): Unit = {
    import graft.functions.TextFunctions.hash60
    graft.functions.GraftFunctions.register(spark)
    val ev = t(spark, dir, "events")
    val n = ev.count()
    val tFiles = math.max(1L, math.ceil(n / fileRows.toDouble).toLong)
    // persisted: the keyed frame (with its md5 die) feeds BOTH the
    // partitioned data write and the bloom aggregation — without it
    // the hash pass runs twice over the corpus
    val keyed = ev
      .withColumn("h", hash60(col("event_id").cast("string")))
      .withColumn("fid", pmod(col("h"), lit(tFiles)))
      .persist()
    try {
      // distribute on the partition key before the partitioned write:
      // unshuffled, every input task fans a file into every fid dir
      // it sees (tasks × t_files near-empty files at scale). A/B'd
      // rebalance vs repartition(fid) vs unshuffled here: rebalance
      // matched the unshuffled write within noise locally and is the
      // scale-correct layout (repartition(fid) measured slower — 32
      // reducers over a table AQE bin-packs into 3).
      keyed.drop("h").hint("rebalance", col("fid"))
        .write.partitionBy("fid").parquet(s"$out/data")
      keyed.groupBy(col("fid"))
        .agg(graft.functions.GraftFunctions
          .bloomOrAgg(col("h"), words, BloomBits, BloomK).as("warr"))
        .write.parquet(s"$out/bloom")
    } finally keyed.unpersist(blocking = false)
    // the geometry the lookup's derivations need — stored, not
    // re-derived (a max(fid) guess breaks if the top hash slot is
    // empty; the word count decides the position arithmetic)
    spark.range(1)
      .select(lit(n).as("n"), lit(tFiles).as("t_files"),
        lit(words.toLong).as("words"))
      .write.parquet(s"$out/meta")
  }

  /** Point lookup through the materialized index. The layout is
    * hash-partitioned on the key's own die, so each key's HOME file
    * is known arithmetically — the bloom's job is the miss path:
    * rejecting the home-file read when the key was never ingested.
    * Only admitted home partitions are scanned: at most one per key,
    * regardless of key count. No false negatives by construction;
    * a false positive costs one extra partition read on a miss. */
  def bloomLookup(spark: SparkSession, out: String,
      keys: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "bloomLookup needs at least one key")
    val keptFids = bloomAdmittedFids(spark, out, keys)
    spark.read.parquet(s"$out/data")
      .filter(col("fid").isin(keptFids: _*))
      .filter(col("event_id").isin(keys: _*))
  }

  /** The home-file ids the bloom side table admits for `keys` — the
    * pruning decision itself (exposed so the spec can assert the
    * scan set; `DataFrame.inputFiles` reports the UNPRUNED listing
    * and cannot see partition filters). Each key is tested ONLY
    * against its home file's bloom — testing every file against
    * every key would admit ~1−(1−fp)^|keys| of the table and degrade
    * toward a full scan as the key count grows. */
  def bloomAdmittedFids(spark: SparkSession, out: String,
      keys: Seq[Long]): Seq[Long] =
    bloomAdmission(spark, out, keys).admitted

  /** Admission verdict plus the lookup's own IO audit: how many bloom
    * rows crossed to the driver. The spec pins `bloomRowsRead ≤
    * |keys|` — the invariant that keeps a point lookup's driver work
    * O(|keys|) at any table size. */
  final case class BloomAdmission(admitted: Seq[Long], bloomRowsRead: Long)

  /** Driver work is O(|keys|), never O(n_files): each key's HOME file
    * id is pure arithmetic (`h mod t_files` — no data needed), so the
    * home set is computed FIRST and pushed into the bloom-table read
    * as a `fid IN (homes)` filter. The collect then transfers at most
    * one bloom row per distinct home (≤ |keys| rows of words·8 B) —
    * at 100 TB (10⁵–10⁶ files × up to KBs of bloom words each) an
    * unfiltered collect of the side table would move GBs to the
    * driver per point lookup to answer an O(|keys|) question. */
  def bloomAdmission(spark: SparkSession, out: String,
      keys: Seq[Long]): BloomAdmission = {
    import graft.functions.TextFunctions.hash60Jvm
    // fixed side-table schemas (written by buildBloomIndex) — skip
    // the per-read footer-inference job on both metadata reads
    val meta = spark.read.schema("n LONG, t_files LONG, words LONG")
      .parquet(s"$out/meta").head()
    val tFiles = meta.getAs[Long]("t_files")
    val m = meta.getAs[Long]("words") * BloomBits
    val hashed = keys.map(kv => kv -> hash60Jvm(kv.toString))
    val homes = hashed.map(_._2 % tFiles).distinct
    val blooms = spark.read.schema("fid LONG, warr ARRAY<LONG>")
      .parquet(s"$out/bloom")
      .filter(col("fid").isin(homes: _*))
      .collect()
    val byFid = blooms.iterator
      .map(r => r.getAs[Long]("fid") ->
        r.getSeq[Long](r.fieldIndex("warr")))
      .toMap
    val admitted = hashed.flatMap { case (_, h) =>
      val home = h % tFiles
      val h1 = h % m
      val h2 = 1L + (h / m) % (m - 1L)
      byFid.get(home).filter { words =>
        (0 until BloomK).forall { i =>
          val p = (h1 + i * h2) % m
          (((words((p / BloomBits).toInt) >>
            (p % BloomBits).toInt) & 1L)) == 1L
        }
      }.map(_ => home)
    }.distinct
    BloomAdmission(admitted, blooms.length.toLong)
  }

  // ---------------------------------------------------------------
  // Small-file compaction planning (OPTIMIZE bin-packing)
  // ---------------------------------------------------------------

  /** Output bins per compaction round: the target bin size is
    * total/8, so the plan stays non-degenerate at every scale factor
    * (fixed source count × growing file sizes). */
  val CompactBins = 8L

  /** Small-file compaction planning — the OPTIMIZE/rewrite step every
    * long-lived table needs: given the current file population (here
    * modeled from the documents table as one file per `source`, sized
    * by its char sum), assign files to output bins of ~target bytes by
    * cumulative-size packing over the size-descending file order.
    *
    * Scale shape: the whole computation runs over FILE METADATA (one
    * row per file — thousands at 100 TB, never corpus-sized), so the
    * single-partition running-sum window is bounded by the file count,
    * not the data; the only corpus pass is the per-file size
    * aggregate, which is a plain map-side-combined groupBy. The
    * deterministic (bytes DESC, source) total order makes the plan —
    * and the oracle — reproducible; floor(cum_before / target) binning
    * overfills a bin by at most one file, which the companion spec
    * pins as the bound. */
  def compactPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = t(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).cast("long").as("f_bytes"))
    val total = files.agg(sum(col("f_bytes")).cast("long").as("tb"))
    val w = Window.orderBy(col("f_bytes").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.crossJoin(broadcast(total))
      .withColumn("target",
        greatest(lit(1L), expr(s"tb div $CompactBins")))
      .withColumn("cum", sum(col("f_bytes")).over(w))
      .select(col("source"), col("f_bytes"),
        expr("CAST((cum - f_bytes) div target AS BIGINT)").as("bin"))
  }

  val compactPlanSql: String =
    s"""WITH files AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS f_bytes
           FROM documents GROUP BY 1),
       tt AS (SELECT greatest(1, CAST(sum(f_bytes) AS BIGINT) // $CompactBins) AS target FROM files),
       c AS (SELECT source, f_bytes,
               sum(f_bytes) OVER (ORDER BY f_bytes DESC, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM files)
       SELECT source, f_bytes,
         CAST((cum - f_bytes) // (SELECT target FROM tt) AS BIGINT) AS bin
       FROM c"""

  /** Executed small-file compaction — [[compactPlan]]'s planning rule
    * APPLIED to a real parquet directory: list the files (driver-side
    * metadata, bounded by file count), pack them into
    * cumulative-size bins over the (bytes DESC, path) total order,
    * and rewrite every bin as one file in `out/bin_NNNNN`.
    *
    * Execution is ONE distributed job, never a per-bin driver loop: a
    * real OPTIMIZE pass over a fragmented 100 TB table yields 10³–10⁵
    * bins, and bins × (job-submission latency + a single-task write)
    * serializes the cluster while it idles. Instead the file→bin map
    * (file-count-sized metadata) broadcast-joins onto ONE read of all
    * source files keyed by `input_file_name`, rows hash-shuffle to
    * one task per bin, and a partitioned write emits each bin's
    * single file; bin directories are then driver renames (metadata
    * ops, O(bins)). Wall time is the largest bin's write, not the bin
    * count — the fragmentation sweep in NOTES pins it.
    *
    * Returns (files_before, files_after, bins) for the caller's
    * audit; content parity is the companion spec's job. */
  def compactFiles(spark: SparkSession, tableDir: String, out: String,
      targetBytes: Long): (Int, Int, Int) = {
    require(targetBytes > 0, "compactFiles needs targetBytes > 0")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tableDir).getFileSystem(hconf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath, s.getLen))
      .sortBy { case (p, len) => (-len, p.toString) }
    require(files.nonEmpty, s"compactFiles: no parquet files in $tableDir")
    // floor(cum_before / target) — the exact q_compact_plan rule
    val binOf: Seq[(org.apache.hadoop.fs.Path, Long)] = files.toSeq
      .zip(files.scanLeft(0L)(_ + _._2))
      .map { case ((p, _), cumBefore) => (p, cumBefore / targetBytes) }
    val nBins = binOf.map(_._2).distinct.length
    // join key is the file BASENAME in input_file_name()'s OWN
    // rendering: the function returns the scan path URI-ENCODED
    // (Path.toUri — spaces as %20 etc.), so the driver-side map key
    // must come from the same toUri rendering, never Path.getName's
    // decoded form, or every row of a file with URL-encodable chars
    // in its name silently drops out of the inner join. All sources
    // live in one directory so basenames are unique; internal
    // columns are underscored to stay clear of table columns
    // (guarded below)
    def uriBase(p: org.apache.hadoop.fs.Path): String =
      p.toUri.toString.split('/').last
    Seq("_graft_bin", "_graft_fname").foreach { c =>
      require(!spark.read.parquet(files.head._1.toString)
          .columns.contains(c),
        s"compactFiles: reserved column $c present in table")
    }
    import spark.implicits._
    val binMap = binOf
      .map { case (p, b) => (uriBase(p), b) }
      .toDF("_graft_fname", "_graft_bin")
    val staged = s"$out/_graft_staged"
    spark.read.parquet(files.map(_._1.toString).toIndexedSeq: _*)
      .withColumn("_graft_fname",
        element_at(split(input_file_name(), "/"), -1))
      .join(broadcast(binMap), "_graft_fname")
      .drop("_graft_fname")
      .repartition(nBins, col("_graft_bin"))
      .write.mode("overwrite").partitionBy("_graft_bin").parquet(staged)
    // bin dirs: _graft_bin=K → bin_%05d in dense bin order (driver
    // metadata renames, O(bins))
    val denseIdx = binOf.map(_._2).distinct.sorted.zipWithIndex.toMap
    var after = 0
    denseIdx.toSeq.sortBy(_._2).foreach { case (binId, i) =>
      val src = new org.apache.hadoop.fs.Path(
        s"$staged/_graft_bin=$binId")
      val dst = new org.apache.hadoop.fs.Path(f"$out/bin_$i%05d")
      if (fs.exists(src)) {
        if (fs.exists(dst)) fs.delete(dst, true)
        // rename signals failure by RETURNING false on HDFS-like
        // filesystems — ignoring it would delete the staged dir
        // below with the bin's only copy still inside
        require(fs.rename(src, dst),
          s"compactFiles: rename $src -> $dst failed")
        after += fs.listStatus(dst)
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    (files.length, after, nBins)
  }

  /** The EXECUTED index round trip as a harness-gated query: build
    * the materialized bloom index in a temp dir, look up the same
    * deterministic probe keys [[bloomPrune]] audits, and return the
    * rows the pruned scan produced. The filesystem side effects
    * (partitioned write, side table, meta, home-probe pruning) are
    * not SQL-expressible, but the RESULT is a plain filter — so the
    * hash gate proves the whole executed path returns exactly what a
    * full scan would, the same proof shape as q_upsert_partitioned
    * and q_roundtrip_shards. */
  def bloomIndexRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val keys = t(spark, dir, "events")
      .filter(pmod(col("event_id"), lit(ProbeMod)) === lit(ProbeRem))
      .orderBy(col("event_id")).limit(ProbeLimit)
      .select(col("event_id"))
      .collect().map(_.getLong(0)).toSeq // ≤ ProbeLimit keys
    val out = java.nio.file.Files
      .createTempDirectory("graft_bloomidx").toString
    // production geometry: bigger files, proportionally bigger blooms
    // (same bits/key, ~25 partitions at sf0.1 instead of 391 — the
    // dynamic-partition write dominates this round trip's cost)
    buildBloomIndex(spark, dir, out, fileRows = 4096L, words = 256)
    // seal: ≤ ProbeLimit rows — materialize and delete the index copy
    // (repeated bench/oracle runs must not leak corpus-sized temp dirs)
    Tables.sealTempResult(spark,
      bloomLookup(spark, out, keys)
        .select(col("event_id"), col("user_id")),
      out)
  }

  val bloomIndexRoundTripSql: String =
    s"""SELECT event_id, user_id FROM events
       WHERE event_id IN (
         SELECT event_id FROM events
         WHERE event_id % $ProbeMod = $ProbeRem
         ORDER BY event_id LIMIT $ProbeLimit)"""

  val queries: Map[String, Q] = Map(
    "q_zorder_layout" -> (zorderLayout _),
    "q_stats_prune" -> (statsPrune _),
    "q_bloom_prune" -> (bloomPrune _),
    "q_bloom_index" -> (bloomIndexRoundTrip _),
    "q_compact_plan" -> (compactPlan _),
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_layout" -> zorderLayoutSql,
    "q_stats_prune" -> statsPruneSql,
    "q_bloom_prune" -> bloomPruneSql,
    "q_bloom_index" -> bloomIndexRoundTripSql,
    "q_compact_plan" -> compactPlanSql,
  )
}
