package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over event streams — the streaming
  * twin of [[graft.queries.TimeSeries]] (same windowing and
  * sessionization semantics, plus watermarked late-data handling).
  *
  * The reference has no streaming (SURVEY.md §2.11); this is the
  * 100 TB extension: a pipeline that runs identically over a bounded
  * backfill (`Trigger.AvailableNow`) and an unbounded feed, because
  * the transformations are the same DataFrame expressions in both
  * modes.
  *
  * Scale notes: tumbling-window + watermark keeps state bounded
  * (windows close once the watermark passes); session windows use
  * Spark's native `session_window`, whose state store is keyed by
  * (user, session) and pruned by the same watermark.
  */
object EventStreams {

  /** Schema of the events table (events.parquet, TESTDATA.md) with
    * `ts` as a proper timestamp. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Timestamp → epoch µs — the ONE µs-truncation helper shared by
    * every stateful operator; must stay in lockstep with the batch
    * catalog's `ts div 1000` ordering convention. */
  private def toUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** File-based event stream: every parquet file dropped into `dir`
    * becomes a micro-batch (readStream analog of the batch reader). */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(EventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window counts/sums per event type with late-data
    * tolerance — streaming twin of TimeSeries.eventsHourly. */
  def hourlyAggregates(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sessionization with Spark's native session windows (30-minute
    * inactivity gap) — streaming twin of TimeSeries.eventsSessionize.
    * State per (user, open session); watermark closes sessions. */
  def sessionAggregates(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Typed event row for the stateful operators. */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)

  /** Open-session accumulators kept in the state store (times in
    * epoch micros — integer state serializes compactly and compares
    * exactly). A LIST of disjoint open sessions, not one: events may
    * arrive out of order across micro-batches (anywhere above the
    * watermark), so earlier not-yet-closable sessions must survive
    * until the watermark proves them over. */
  final case class OpenSession(startUs: Long, lastUs: Long,
      n: Long, sum: Double)
  final case class OpenSessions(sessions: List[OpenSession])

  /** A closed session as emitted downstream. */
  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, sum_value: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state API the native `session_window` cannot express
    * variants of (per-session caps, custom close conditions, emitted
    * mid-session markers all hang off this skeleton).
    *
    * Semantics match native session windows: each event is the
    * interval [t, t+gap); overlapping intervals merge (this handles
    * out-of-order arrivals — a late event extends a session BACKWARD
    * or founds its own). A session emits exactly once, when the
    * watermark passes last + gap — only then can no admissible event
    * still merge into it. Emitted times are epoch SECONDS, the
    * catalog's convention.
    *
    * State per user is the list of open sessions — bounded by the
    * watermark horizon (all intervals end within gap + delay of the
    * stream head), pruned at every emission; the event-time timeout
    * fires at the earliest close among them.
    */
  def statefulSessions(events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    events.withWatermark("ts", watermark).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSessions]) =>
          // 1. fold new events into the interval list (merge-on-overlap)
          var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
          it.foreach { e =>
            val us = toUs(e.ts)
            val (overlapping, disjoint) = sessions.partition(s =>
              us + gapUs > s.startUs && us < s.lastUs + gapUs)
            val merged = overlapping.foldLeft(
              OpenSession(us, us, 1L, e.value)) { (acc, s) =>
              OpenSession(math.min(acc.startUs, s.startUs),
                math.max(acc.lastUs, s.lastUs),
                acc.n + s.n, acc.sum + s.sum)
            }
            sessions = merged :: disjoint
          }
          // 2. emit every session the watermark has proven over
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) =
            sessions.partition(s => s.lastUs + gapUs <= wmUs)
          val out = closed.sortBy(_.startUs).map(s =>
            Session(user, s.startUs / 1000000L, s.lastUs / 1000000L,
              s.n, s.sum))
          // 3. keep the rest; wake up at the earliest possible close
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // µs→ms truncation could land exactly ON the watermark,
            // which setTimeoutTimestamp rejects; nudge past it
            state.setTimeoutTimestamp(math.max(
              (open.map(_.lastUs).min + gapUs) / 1000L,
              state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** Latest-version state/output row of [[compactStream]]. */
  final case class LatestVersion(user_id: Long, event_type: String,
      last_event_id: Long, last_us: Long, last_value: Double,
      n_versions: Long)

  /** The ONE newer-version fold shared by [[compactStream]] and
    * [[compactStreamWithTtl]] — the (µs-truncated ts, event_id)
    * tiebreak convention is the cross-engine contract hash-gated
    * against the batch oracle, so it must not fork between the two
    * streaming variants. */
  private def foldLatest(user: Long, typ: String,
      prior: Option[LatestVersion], it: Iterator[Event]): LatestVersion = {
    var cur = prior.getOrElse(
      LatestVersion(user, typ, Long.MinValue, Long.MinValue, 0.0, 0L))
    it.foreach { e =>
      val us = toUs(e.ts)
      val newer = us > cur.last_us ||
        (us == cur.last_us && e.event_id > cur.last_event_id)
      cur = LatestVersion(user, typ,
        if (newer) e.event_id else cur.last_event_id,
        if (newer) us else cur.last_us,
        if (newer) e.value else cur.last_value,
        cur.n_versions + 1)
    }
    cur
  }

  /** Streaming CDC / upsert compaction — the unbounded twin of
    * [[graft.queries.TimeSeries.eventsCompact]]: per (user_id,
    * event_type) key, state holds the LATEST record (µs-truncated ts
    * with event_id tiebreak — the batch query's exact cross-engine
    * ordering convention) plus the version count; every micro-batch
    * that touches a key emits its then-current latest row (Update
    * mode), so the final row per key equals the batch compaction of
    * everything ingested. State is one fixed-width record per LIVE
    * KEY — the natural bound of a keep-latest table (it IS the
    * compacted table) — and n_versions grows monotonically per key,
    * which is what lets a downstream consumer pick each key's final
    * row without ordering guarantees. */
  def compactStream(events: DataFrame): Dataset[LatestVersion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[Event]
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LatestVersion, LatestVersion](
        GroupStateTimeout.NoTimeout) {
        case ((user, typ), it, state) =>
          val cur = foldLatest(user, typ, state.getOption, it)
          state.update(cur)
          cur
      }
  }

  /** [[compactStream]] with an EVENT-TIME retention TTL — the
    * bounded-retention deployment: a key whose latest version is
    * older than `ttl` (by the watermark clock, so retention is
    * data-time, not wall-time, and replays expire identically) drops
    * from the state store. [[compactStream]] keeps one record per
    * live key FOREVER, which is correct for a keep-latest table but
    * unbounded when keys churn (session tokens, one-shot upload ids);
    * here the state is O(keys active within the TTL horizon).
    *
    * Requires a watermark on `ts` (set here from `watermark`).
    * Expiry is silent (no tombstone row — downstream reads absence);
    * a key re-ingested after expiry starts a fresh history:
    * n_versions counts from 1 again, exactly as if the key were new.
    */
  def compactStreamWithTtl(events: DataFrame, ttl: String = "30 days",
      watermark: String = "1 hour"): Dataset[LatestVersion] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .safeStringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
      require(iv != null, s"bad ttl interval: '$ttl'")
      require(iv.months == 0, s"ttl must be day/time-based, got $ttl")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    require(ttlMs > 0, s"ttl must be positive, got $ttl")
    events.withWatermark("ts", watermark).as[Event]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LatestVersion, LatestVersion](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case ((user, typ), it, state) =>
          if (state.hasTimedOut) {
            // watermark passed last_us + ttl: retention horizon over
            state.remove()
            Iterator.empty
          } else {
            val cur = foldLatest(user, typ, state.getOption, it)
            state.update(cur)
            // expire at latest-version event time + ttl; a very late
            // key (already inside the horizon's tail) still needs a
            // timeout STRICTLY above the current watermark
            state.setTimeoutTimestamp(math.max(
              cur.last_us / 1000L + ttlMs,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.single(cur)
          }
      }
  }

  /** Run a bounded backfill of a streaming query into an in-memory
    * table and block until complete — the test/verification harness
    * (AvailableNow processes all existing files then stops, so the
    * same code path is exercised as in continuous mode). */
  def runAvailableNow(stream: DataFrame, queryName: String,
      outputMode: String = "append"): Unit = {
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exact-dedup: drop rows whose key was already seen,
    * with state bounded by the watermark — the streaming twin of the
    * batch fingerprint dedup (a training-data pipeline ingesting a
    * document feed dedups exactly this way; pair with a MinHash
    * band-explode + dropDuplicates for streaming near-dup). */
  def dedupeStream(events: DataFrame, keys: Seq[String],
      eventTimeCol: String = "ts",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      // keys-only dedup with watermark-bounded state (duplicates may
      // arrive with different event times and still drop)
      .dropDuplicatesWithinWatermark(keys.toArray)

  /** Watermarked STREAM-STREAM interval join — the attribution shape
    * (every `rightType` event pairs with the same user's `leftType`
    * events from the preceding `window`): the one stateful-join
    * family the rest of this module doesn't cover. Both watermarks
    * plus the time-interval condition are what make the state store
    * PRUNABLE — Spark buffers each side only until the watermark
    * proves no future match can arrive, so state is
    * O(rate × (watermark + window)), never stream-length. The same
    * expression joins two static frames identically (the spec pins
    * stream == batch). */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      leftType: String, rightType: String,
      window: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.filter(col("event_type") === leftType)
      .withWatermark("ts", watermark)
      .select(col("event_id").as("left_id"), col("ts").as("left_ts"),
        col("user_id"), col("value").as("left_value"))
    val r = right.filter(col("event_type") === rightType)
      .withWatermark("ts", watermark)
      .select(col("event_id").as("right_id"), col("ts").as("right_ts"),
        col("user_id").as("r_user_id"), col("value").as("right_value"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("left_id"), col("right_id"),
        col("left_ts"), col("right_ts"),
        col("left_value"), col("right_value"))
  }

  /** Run a batch [[graft.operators.Pipeline]] stage list over every
    * micro-batch — the bridge that makes the whole batch operator
    * surface (filters, dedup-within-batch, enrichment) available on
    * streams via foreachBatch. The sink function receives the final
    * processor of each batch. */
  def foreachBatchPipeline(stream: DataFrame,
      config: graft.core.DatasetConfig,
      stages: Seq[graft.operators.Pipeline.Stage])(
      sink: (graft.operators.Processor, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val result = graft.operators.Pipeline.run(
          graft.operators.Processor(batch, config), stages)
        sink(result.processor, batchId)
    }

  /** One ingest batch of incremental near-dup: drop documents whose
    * MinHash LSH band set collides with the accumulated corpus band
    * store, then append the SURVIVORS' bands — the streaming twin of
    * `Curation.decontaminate` (there eval is the fixed corpus; here
    * the corpus is everything admitted so far).
    *
    * State is a parquet BAND STORE (distinct band keys), not executor
    * memory: restarts resume from the store, the store is itself
    * queryable, and its size is corpus-bands (≲ `bands` rows per
    * admitted doc), not corpus-text. Per batch the plan is two
    * hash-joins keyed on short band strings — batch-bands ⋉ store to
    * find collisions, batch ⋉̸ collided-ids to admit — both
    * broadcastable while the batch is small, shuffled when it is not
    * (AQE decides).
    *
    * Recall is governed by the banding parameters exactly as in
    * [[graft.queries.Dedup]] (defaults match its 16-hash, 2×8
    * configuration; the Dedup specs pin the recall behavior). Docs
    * admitted WITHIN one batch are not checked against each other —
    * run a batch dedup first if intra-batch duplicates matter;
    * from the next batch on they block their near-dups either way. */
  def dedupBatchAgainstStore(batch: DataFrame, bandStoreDir: String,
      numHashes: Int = 16, bands: Int = 2, rowsPerBand: Int = 8,
      shingleK: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.{minhashBands, minhashSignature}
    val spark = batch.sparkSession
    val docBands = batch.select(col("doc_id"),
      explode(minhashBands(
        minhashSignature(col("text"), numHashes, shingleK),
        bands, rowsPerBand)).as("band"))
      .persist()
    val storePath = new org.apache.hadoop.fs.Path(bandStoreDir)
    val fs = storePath.getFileSystem(
      spark.sessionState.newHadoopConf())
    val store =
      if (fs.exists(storePath)) spark.read.parquet(bandStoreDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("band", StringType))))
    val dupIds = docBands.join(store, Seq("band"), "left_semi")
      .select(col("doc_id")).distinct()
    val admitted = batch.join(dupIds, Seq("doc_id"), "left_anti")
    docBands.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("band")).distinct()
      .write.mode("append").parquet(bandStoreDir)
    docBands.unpersist()
    admitted
  }

  /** [[dedupBatchAgainstStore]] per micro-batch over a document
    * stream — incremental corpus construction with near-dup
    * admission control. */
  def incrementalNearDup(docStream: DataFrame, bandStoreDir: String)(
      sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(dedupBatchAgainstStore(batch, bandStoreDir), batchId)
    }

  /** Continuous writer to parquet with checkpointing — the production
    * sink shape (exactly-once per file-sink semantics). */
  def parquetSink(stream: DataFrame, outDir: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
}
