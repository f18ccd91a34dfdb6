package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._
import graft.queries.Num.{r2, r6, sqlR}

/** Dataset-curation operators over `documents` — the train-set
  * assembly steps of an LLM data pipeline (no analog in the
  * reference; 100 TB extensions per the build brief): deterministic
  * split assignment, token-budget sequence packing, and train/eval
  * decontamination.
  *
  * Determinism: every assignment derives from md5 of stable keys —
  * reproducible across engines (DuckDB oracles) and across runs,
  * which is the property a curation step must have (a re-run of the
  * pipeline must not reshuffle examples between train and eval).
  */
object Curation {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** hash32-style bucket in [0, 100) from the doc id — the split die. */
  private val SplitBuckets = 100
  private val ValPct = 5
  private val TestPct = 5
  val PackBudget = 256L // tokens per packed sequence

  /** Deterministic train/val/test split: bucket = md5(doc_id) mod 100
    * → 90/5/5. A pure per-row map (no shuffle except the audit
    * aggregate); adding data never moves an existing doc between
    * splits — the stability property random sampling lacks. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bucket",
        pmod(hash32(col("doc_id").cast("string")), lit(SplitBuckets)))
      .withColumn("split",
        when(col("bucket") < ValPct, "val")
          .when(col("bucket") < ValPct + TestPct, "test")
          .otherwise("train"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))

  val splitAssignSql: String =
    s"""SELECT CASE
         WHEN b < $ValPct THEN 'val'
         WHEN b < ${ValPct + TestPct} THEN 'test'
         ELSE 'train' END AS split,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM (SELECT n_chars,
         CAST(concat('0x', substring(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
           % $SplitBuckets AS b
         FROM documents)
       GROUP BY 1"""

  /** Char budget for [[mixEpochs]]' mixture plan. */
  val MixBudgetChars = 2000000L
  /** Repeat cap: no source contributes more than 4 epochs of itself
    * (the standard small-source up-sampling limit — past ~4 repeats,
    * memorization outpaces the mixture gain). */
  val MaxMixEpochs = 4.0

  /** Data-mixture EPOCH planning (the DoReMi/Pile-style recipe step:
    * given target mixture weights and what each source actually has,
    * how many times does each source repeat?): weights here are doc-
    * count shares, target chars = weight · [[MixBudgetChars]], epochs
    * = target / available capped at [[MaxMixEpochs]], effective chars
    * = what the cap leaves. Every cross-row aggregate is INTEGER
    * (doc/char counts) and every double derives from the same integer
    * divisions on both engines — no float-summation-order exposure.
    * One map-side-combined groupBy over sources + a scalar total;
    * nothing corpus-sized moves. */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"))
    val totDocs = per.agg(coalesce(sum(col("n_docs")), lit(0L)))
      .head().getLong(0)
    val target = (col("n_docs") * lit(MixBudgetChars)).cast("double") /
      lit(totDocs.toDouble)
    per
      .withColumn("weight", r6(col("n_docs") / lit(totDocs.toDouble)))
      .withColumn("epochs",
        r6(least(lit(MaxMixEpochs), target / col("chars"))))
      .withColumn("eff_chars",
        r2(least(target, lit(MaxMixEpochs) * col("chars"))))
      .select(col("source"), col("n_docs"), col("chars"),
        col("weight"), col("epochs"), col("eff_chars"))
  }

  val mixEpochsSql: String =
    s"""WITH per AS (SELECT source, count(*)::BIGINT AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents GROUP BY 1),
       tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td FROM per)
       SELECT source, n_docs, chars,
         ${sqlR("n_docs / (td * 1.0)", 6)} AS weight,
         ${sqlR(
        s"least($MaxMixEpochs, ((n_docs * $MixBudgetChars) * 1.0 / td) / chars)",
        6)} AS epochs,
         ${sqlR(
        s"least((n_docs * $MixBudgetChars) * 1.0 / td, $MaxMixEpochs * chars)",
        2)} AS eff_chars
       FROM per CROSS JOIN tot"""

  /** Dataset snapshot DIFF — the audit a versioned corpus runs
    * between ingests ("what changed since v1?"): a deterministic v2
    * is derived from the same table (md5-die bucket 0 of 20 deleted,
    * bucket 1 grows by 1000 chars, bucket 2 re-ingested under fresh
    * ids), then ONE full-outer join on doc_id classifies every key
    * as added / removed / changed / unchanged and aggregates counts
    * + the signed char delta. All integers; the join is the only
    * shuffle and both sides are id+chars-narrow. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = t(spark, dir, "documents").select(col("doc_id"),
      col("n_chars").cast("long").as("n1"))
    // fresh ids start past the corpus maximum — a fixed offset would
    // collide with real ids on a large corpus and silently corrupt
    // the census (and the oracle, mirroring it, would not notice)
    val freshBase = v1.agg(coalesce(max(col("doc_id")), lit(0L)))
      .head().getLong(0) + 1L
    val die = pmod(hash32(col("doc_id").cast("string")), lit(20))
    val v2base = v1.withColumn("b", die)
    val v2 = v2base.filter(col("b") =!= 0)
      .select(col("doc_id"),
        when(col("b") === 1, col("n1") + 1000L).otherwise(col("n1"))
          .as("n2"))
      .unionAll(v2base.filter(col("b") === 2)
        .select((col("doc_id") + lit(freshBase)).as("doc_id"),
          col("n1").as("n2")))
    // presence markers, NOT value-column nullness: a NULL n_chars row
    // must not read as absent (the oracle classifies on join-side
    // doc_id nullness — these markers are its Spark equivalent)
    v1.withColumn("p1", lit(1))
      .join(v2.withColumn("p2", lit(1)), Seq("doc_id"), "full_outer")
      .select(
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "removed")
          .when(col("n1") =!= col("n2"), "changed")
          .otherwise("unchanged").as("side"),
        (coalesce(col("n2"), lit(0L)) - coalesce(col("n1"), lit(0L)))
          .as("delta"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("delta")).cast("long").as("delta_chars"))
  }

  val snapshotDiffSql: String =
    """WITH v1 AS (SELECT doc_id, n_chars::BIGINT AS n1 FROM documents),
       d AS (SELECT doc_id, n1,
         CAST(concat('0x', substring(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
           % 20 AS b FROM v1),
       fresh AS (SELECT coalesce(max(doc_id), 0) + 1 AS base FROM v1),
       v2 AS (SELECT doc_id,
                CASE WHEN b = 1 THEN n1 + 1000 ELSE n1 END AS n2
              FROM d WHERE b <> 0
              UNION ALL
              SELECT doc_id + (SELECT base FROM fresh) AS doc_id,
                n1 AS n2
              FROM d WHERE b = 2)
       SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                   WHEN v2.doc_id IS NULL THEN 'removed'
                   WHEN n1 <> n2 THEN 'changed'
                   ELSE 'unchanged' END AS side,
         count(*)::BIGINT AS n_keys,
         CAST(sum(coalesce(n2, 0) - coalesce(n1, 0)) AS BIGINT)
           AS delta_chars
       FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
       GROUP BY 1"""

  /** Target bucket count for the packing cumsum. Pack ids are
    * invariant to the bucket width (the offsets reconstruct the exact
    * global cumsum), so the width only tunes parallelism: too few
    * buckets re-creates the per-source reducer, too many drowns the
    * window in per-group overhead (measured 43s at 5M docs with 50k
    * buckets vs 6.9s with 50). 256 keeps every core busy while the
    * bucket-offset table stays trivially broadcastable. */
  val TargetPackBuckets = 256L

  /** Token-budget sequence packing: per source, documents in doc_id
    * order accumulate into packs of ≤ [[PackBudget]] tokens (greedy
    * first-fit-in-order via running cumsum ÷ budget — the one-pass
    * approximation every large pipeline uses; optimal bin packing is
    * neither parallel nor stable). Oversized docs occupy their own
    * pack(s) by the same arithmetic.
    *
    * Scale shape: a single `Window.partitionBy(source)` cumsum is the
    * textbook plan and a single-reducer trap — a 100 TB corpus with a
    * handful of sources serializes the whole pack assignment through
    * one task per source. Because `pack_id = floor((cum-1)/budget)`
    * depends ONLY on the per-source running total, the cumsum
    * composes across doc_id-range buckets exactly: (1) a window
    * partitioned by (source, bucket) computes local cumsums on many
    * reducers, (2) per-bucket totals (plain sum(toks) per bucket — no
    * window needed) prefix-sum over the tiny bucket table, (3) the
    * offsets broadcast back and `cum = offset + local`. The only
    * per-source serial step is the O(#buckets) offset window; the
    * DuckDB oracle keeps the single-window formulation, so the hash
    * gate doubles as the equivalence proof.
    *
    * The offsets branch recomputes the narrow scan instead of caching
    * it: bucket totals need only a map-side partial aggregation (no
    * corpus-row shuffle), while persisting the (doc_id, source, toks,
    * bucket, lcum) projection to share one pass is a multi-TB
    * MEMORY_AND_DISK cache at 100 TB. Scan + tokenize twice is the
    * cheaper trade (NOTES.md, 5M-doc measurement). */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val local = Window
      .partitionBy(col("source"), col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // adaptive width from the id span: a doc_id-only columnar scan
    // (driver-side scalar, same license as SkewJoin's key profile);
    // coalesce guards the empty-table null (max of zero rows)
    val maxId = t(spark, dir, "documents")
      .agg(coalesce(max(col("doc_id")), lit(0L))).head().getLong(0)
    val width = math.max(1L, maxId / TargetPackBuckets + 1)
    // toks+bucket only — the text column is dropped before any shuffle
    def narrow = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("toks"))
      .withColumn("bucket", expr(s"doc_id div $width"))
    val offW = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = narrow
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("toks")).as("btoks"))
      .withColumn("off", coalesce(sum(col("btoks")).over(offW), lit(0L)))
      .select(col("source"), col("bucket"), col("off"))
    narrow
      .withColumn("lcum", sum(col("toks")).over(local))
      .join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum", col("off") + col("lcum"))
      // pack index of the pack this doc CLOSES into: floor-division
      // of the running total places boundary docs deterministically;
      // the greatest() guard keeps leading zero-token docs in pack 0
      // (floor vs truncation of -1 differs between engines)
      .withColumn("pack_id",
        expr(s"greatest(cum - 1, 0L) div $PackBudget"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"))
  }

  val packSequencesSql: String = {
    import TextAnalysis.SqlToks
    s"""WITH d AS (SELECT source, doc_id,
         length($SqlToks)::BIGINT AS toks FROM documents),
       c AS (SELECT source, toks,
         sum(toks) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM d)
       SELECT source,
         (greatest(cum - 1, 0) // $PackBudget)::BIGINT AS pack_id,
         count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
       FROM c GROUP BY source, pack_id"""
  }

  /** Sliding-window chunk geometry: [[ChunkTokens]]-token windows
    * every [[ChunkStride]] tokens (25% overlap) — the RAG / context-
    * window chunking shape. */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** Overlapping-window document chunking — the retrieval-side prep
    * step ([[packSequences]] is the training-side one): each doc's
    * whitespace tokens split into [[ChunkTokens]]-token windows every
    * [[ChunkStride]] tokens, so consecutive chunks share
    * `ChunkTokens - ChunkStride` tokens and no token is ever dropped
    * at a boundary. Chunk count = ceil((ntok − W)/S) + 1 (one chunk
    * when ntok ≤ W; zero-token docs emit nothing). Emits (doc_id,
    * chunk_id, n_tokens, chunk_text).
    *
    * Scale shape: a pure per-row projection + explode — NO shuffle at
    * any corpus size (plan-shape-pinned: zero exchanges); the chunk
    * fan-out is bounded by ntok/S per doc. Token arrays never ride a
    * shuffle; chunk text re-joins from the in-row slice. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame = {
    val W = ChunkTokens
    val S = ChunkStride
    t(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .withColumn("ntok", size(col("ts")))
      .filter(col("ntok") > 0)
      // ceil((ntok-W)/S) via integer arithmetic; ≤ W tokens → 1 chunk
      .withColumn("n_chunks",
        when(col("ntok") <= W, lit(1L)).otherwise(
          expr(s"(ntok - $W + $S - 1) div $S").cast("long") + 1L))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("ck", slice(col("ts"),
        (col("chunk_id") * S + 1).cast("int"), lit(W)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_tokens"),
        array_join(col("ck"), " ").as("chunk_text"))
  }

  val chunkDocsSql: String = {
    import TextAnalysis.SqlToks
    val (w, s) = (ChunkTokens, ChunkStride)
    s"""WITH d AS (SELECT doc_id, $SqlToks AS ts FROM documents),
       n AS (SELECT doc_id, ts, length(ts) AS ntok FROM d
             WHERE length(ts) > 0),
       c AS (SELECT doc_id, ts,
               CASE WHEN ntok <= $w THEN 1
                    ELSE (ntok - $w + $s - 1) // $s + 1 END AS nc
             FROM n),
       x AS (SELECT doc_id, ts, g.chunk_id
             FROM c CROSS JOIN LATERAL (
               SELECT unnest(generate_series(0, nc - 1)) AS chunk_id) g)
       SELECT doc_id, chunk_id::BIGINT AS chunk_id,
         length(list_slice(ts, chunk_id * $s + 1,
           chunk_id * $s + $w))::BIGINT AS n_tokens,
         array_to_string(list_slice(ts, chunk_id * $s + 1,
           chunk_id * $s + $w), ' ') AS chunk_text
       FROM x"""
  }

  /** Train/eval decontamination, NEAR-DUP flavor: flag train docs
    * that are verified MinHash near-duplicates of an eval doc — the
    * contamination audit run before any training job (exact-match
    * decontamination is the degenerate case: the same shape keyed on
    * [[fingerprint]] instead of bands; this corpus has no exact dups,
    * so the near-dup form is the one with teeth). Reuses the whole
    * sketch→band→verify cascade of [[Dedup.dedupMinhash]]; the eval
    * set here = every 20th doc (deterministic stand-in for a
    * benchmark suite). Emits the TRAIN side of each crossing pair. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val evalA = col("doc_a") % 20 === 0
    val evalB = col("doc_b") % 20 === 0
    Dedup.dedupMinhash(spark, dir)
      .filter(evalA =!= evalB)
      .select(when(evalA, col("doc_b")).otherwise(col("doc_a"))
        .as("doc_id"))
      .distinct()
  }

  val decontaminateSql: String =
    s"""SELECT DISTINCT CASE WHEN doc_a % 20 = 0 THEN doc_b
         ELSE doc_a END AS doc_id
       FROM (${Dedup.dedupMinhashSql})
       WHERE (doc_a % 20 = 0) <> (doc_b % 20 = 0)"""

  /** Word n-gram width for passage-overlap decontamination (the GPT-3
    * appendix uses 13-gram windows; 5 matches the corpus's short
    * synthetic docs and [[Dedup.CoverN]]). */
  val DecontamN = 5

  /** Train/eval decontamination, PASSAGE-OVERLAP flavor: flag every
    * train document sharing at least one word [[DecontamN]]-gram with
    * any eval document (eval = doc_id % 20 = 0, the same held-out
    * slice [[decontaminate]] uses), with the count of distinct leaked
    * grams. Complements the MinHash form: document-level similarity
    * dilutes away a single verbatim benchmark passage inside a long
    * train doc; the n-gram test cannot miss it.
    *
    * Scale shape: gram strings never leave the map side — the fused
    * [[graft.functions.GraftFunctions.wordGramHashes]] expression
    * emits 60-bit longs. The eval gram set is a benchmark suite,
    * tiny next to a 100 TB train corpus, so it is deduped and
    * BROADCAST: the probe is a map-side hash lookup, and the only
    * shuffle is the per-doc distinct-gram count on flagged docs (a
    * vanishing fraction of the corpus). If an eval suite ever
    * outgrew the broadcast threshold, the same plan takes a bloom
    * pre-filter in front of an exact shuffled semi-join — exactness
    * comes from the join either way, never from the sketch. */
  def decontaminateNgram(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val grams = Tables.fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions
          .wordGramHashes(col("text"), DecontamN)).as("gh"))
    val evalGrams = grams.filter(col("doc_id") % 20 === 0)
      .select(col("gh")).distinct()
    grams.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(evalGrams), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
  }

  /** Passage-overlap gram CTEs (dec_-prefixed for collision-free
    * composition): dec_g = per-doc 5-gram hashes, dec_ev = the
    * distinct eval gram set. */
  private[queries] val SqlDecontamGramCte: String = {
    import TextAnalysis.SqlToksLower
    s"""dec_w AS (SELECT doc_id, $SqlToksLower AS ts FROM documents),
       dec_o AS (SELECT doc_id, ts AS ws,
         unnest(range(0, greatest(length(ts) - ${DecontamN - 1}, 0))) AS i
       FROM dec_w),
       dec_g AS (SELECT doc_id,
         CAST(concat('0x', substring(md5(
           array_to_string(ws[i+1:i+$DecontamN], ' ')), 1, 15)) AS BIGINT) AS gh
       FROM dec_o),
       dec_ev AS (SELECT DISTINCT gh FROM dec_g WHERE doc_id % 20 = 0)"""
  }

  val decontaminateNgramSql: String =
    s"""WITH $SqlDecontamGramCte
       SELECT doc_id, count(DISTINCT gh)::BIGINT AS n_shared_grams
       FROM dec_g JOIN dec_ev USING (gh)
       WHERE doc_id % 20 <> 0
       GROUP BY doc_id"""

  /** Bloom sizing for [[decontaminateBloom]]: ~1.2 MB per million
    * grams at this rate — a benchmark suite of 10M distinct grams is
    * a ~12 MB literal, still trivially shippable to every task. */
  val BloomFpp = 0.01

  /** [[decontaminateNgram]] at the next scale rung: when the eval
    * suite's gram set outgrows an exact broadcast (hundreds of
    * millions of grams — an exact long set costs ~8 B/entry plus
    * hash-set overhead, a bloom ~1.2 bits), prefilter the corpus side
    * with a Bloom sketch of the eval grams, then exact-verify the
    * survivors with a shuffled join. The cascade is EXACTLY equal to
    * the exact path — a Bloom filter has no false negatives, and the
    * verify join removes its false positives — so this query shares
    * [[decontaminateNgramSql]]'s oracle verbatim: the hash gate IS
    * the proof the cascade loses nothing.
    *
    * Scale shape: the corpus-side gram explosion meets the sketch
    * map-side (Spark's codegen'd `BloomFilterMightContain`, filter
    * bytes inlined in the plan) and only candidate grams — true
    * leaks plus the fpp tail — reach the exchange. The exact path
    * shuffles nothing of the corpus either (it broadcasts the eval
    * set), but its broadcast is the piece that dies at benchmark-
    * suite scale; the bloom build (distributed aggregate over the
    * tiny eval side) and the verify shuffle (leak-sized) both stay
    * bounded. */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val grams = Tables.fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions
          .wordGramHashes(col("text"), DecontamN)).as("gh"))
    // Eval side is benchmark-sized (tiny next to the corpus), with
    // three consumers — count (sizes the sketch), sketch build, and
    // the verify join — so persisting it is bounded and saves two
    // recomputes of the eval-doc gram fan-out.
    val evalGrams = grams.filter(col("doc_id") % 20 === 0)
      .select(col("gh")).distinct().persist()
    val n = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("gh", n, BloomFpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    grams.filter(col("doc_id") % 20 =!= 0)
      .filter(graft.functions.GraftFunctions
        .bloomMightContain(bytes, col("gh")))
      .join(evalGrams, Seq("gh")) // exact verify: kills fp survivors
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
  }

  /** Overall keep budget for temperature mixture sampling. */
  val MixtureKeepFraction = 0.25

  /** Temperature-flattened mixture sampling — the source-rebalancing
    * step of LLM corpus assembly: target share of source s is
    * sqrt(n_s)/Σ sqrt(n_t) (the p^(1/T) rule at T=2), so
    * over-represented sources are downweighted and the tail is
    * boosted; per-source keep rate = min(1, target·N·keep/n_s), and
    * each doc keeps deterministically when its md5-fraction falls
    * under the rate (the same hash-stable die as [[splitAssign]] —
    * growth never resamples a kept doc away). sqrt, not pow: IEEE
    * correctly-rounded in every engine, so the oracle cannot drift
    * on libm ulps; the rate is epsilon-rounded ([[Num.r6]]) on both
    * sides before the comparison.
    *
    * Scale shape: one map-side-combined count per source (tiny), a
    * window over the #sources-row aggregate (bounded by source
    * cardinality, not corpus size), rates broadcast back, then a
    * pure per-row filter + audit agg. No corpus-sized shuffle. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("n_s"))
    val w = Window.partitionBy()
    val rates = counts
      .withColumn("q", sqrt(col("n_s")) / sum(sqrt(col("n_s"))).over(w))
      .withColumn("rate", r6(least(lit(1.0),
        col("q") * sum(col("n_s")).over(w) * lit(MixtureKeepFraction)
          / col("n_s"))))
      .select(col("source"), col("n_s"), col("rate"))
    val u = hash32(col("doc_id").cast("string")).cast("double") /
      lit(4294967296.0)
    docs.join(broadcast(rates), Seq("source"))
      .filter(u < col("rate"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).cast("long").as("n_docs"),
        count(lit(1)).as("n_kept"),
        max(col("rate")).as("rate"))
  }

  val mixtureSampleSql: String =
    s"""WITH c AS (SELECT source, count(*)::DOUBLE AS n_s
         FROM documents GROUP BY source),
       r AS (SELECT source, n_s,
         ${sqlR(s"least(1.0, (sqrt(n_s) / (SELECT sum(sqrt(n_s)) FROM c))" +
      s" * (SELECT sum(n_s) FROM c) * $MixtureKeepFraction / n_s)", 6)}
           AS rate FROM c),
       k AS (SELECT d.source, r.n_s, r.rate FROM documents d
         JOIN r USING (source)
         WHERE CAST(concat('0x', substring(md5(d.doc_id::VARCHAR), 1, 8))
           AS BIGINT)::DOUBLE / 4294967296.0 < r.rate)
       SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
         count(*)::BIGINT AS n_kept, max(rate) AS rate
       FROM k GROUP BY source"""

  // ---- Gopher-style document-quality rule audit ----

  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinAlphaFrac = 0.8
  /** The 8 required stopwords of the Gopher rules; a document must
    * contain at least [[GopherMinStops]] of them. */
  val GopherRequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStops = 2

  /** Gopher-rules quality audit (Rae et al. 2021, §A1.1): per source,
    * how many documents fail each document-level rule — word count in
    * [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    * ('#' and '...' occurrences) ≤ 0.1, ≥ 80% of words containing a
    * letter, and ≥ 2 of the 8 required stopwords — plus the count
    * passing all five. The line-level Gopher rules (bullet/ellipsis
    * line fractions) need line structure this corpus lacks and are
    * deliberately out of scope. Distinct from [[TextAnalysis
    * .textQuality]]'s soft score: these are the hard REJECT rules a
    * pipeline applies before any scoring.
    *
    * Scale shape: a pure per-row map into a tiny per-source
    * map-side-combined aggregate — no shuffle beyond the audit rows.
    * The per-token predicates (letter check, stopword intersection)
    * use HOF lambdas: fine for an audit pass, and the one-pass
    * [[graft.functions.expressions.TextFeatures]] expression is the
    * template if this ever sits in a per-row hot path. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherDocFlags(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("fw").cast("long")).as("n_fail_words"),
        sum(col("fl").cast("long")).as("n_fail_wordlen"),
        sum(col("fs").cast("long")).as("n_fail_symbol"),
        sum(col("fa").cast("long")).as("n_fail_alpha"),
        sum(col("fp").cast("long")).as("n_fail_stop"),
        sum(col("ok").cast("long")).as("n_pass"))

  /** Per-document Gopher rule flags — the shared building block of
    * the audit aggregate ([[gopherRules]]) and the end-to-end
    * [[curationPipeline]]. Output: (doc_id, source, n_chars,
    * fw/fl/fs/fa/fp per-rule fail flags, ok). */
  private[queries] def gopherDocFlags(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val f = graft.functions.GraftFunctions.textFeatures(col("text"))
    val ts = tokens(col("text"))
    val tsl = tokens(lower(col("text")))
    val ntok = col("f.ntok")
    val nHash = length(col("text")) -
      length(translate(col("text"), "#", ""))
    val nEllipsis = (length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3
    val symRatio = when(ntok === 0, lit(0.0))
      .otherwise((nHash + nEllipsis).cast("double") / ntok.cast("double"))
    val nAlpha = size(filter(ts, t => t.rlike("\\p{L}")))
    val alphaFrac = when(ntok === 0, lit(0.0))
      .otherwise(nAlpha.cast("double") / ntok.cast("double"))
    val nStops = size(array_intersect(tsl,
      array(GopherRequiredStops.map(lit): _*)))
    val failWords = ntok < GopherMinWords || ntok > GopherMaxWords
    val failLen = col("f.meanlen") < GopherMinMeanLen ||
      col("f.meanlen") > GopherMaxMeanLen
    val failSym = symRatio > GopherMaxSymbolRatio
    val failAlpha = alphaFrac < GopherMinAlphaFrac
    val failStop = nStops < GopherMinStops
    Tables.fanOut(t(spark, dir, "documents"))
      .withColumn("f", f)
      .select(col("doc_id"), col("source"), col("n_chars"),
        failWords.as("fw"), failLen.as("fl"), failSym.as("fs"),
        failAlpha.as("fa"), failStop.as("fp"),
        (!failWords && !failLen && !failSym && !failAlpha && !failStop)
          .as("ok"))
  }

  /** Per-document Gopher flag CTEs (gop_-prefixed so the fragment
    * composes into multi-family oracles without name collisions);
    * gop_r carries (doc_id, source, n_chars, fw..fp). */
  private[queries] val SqlGopherDocCte: String = {
    import TextAnalysis.{SqlToks, SqlToksLower}
    val stops = GopherRequiredStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""gop_w AS (SELECT doc_id, source, n_chars, text, $SqlToks AS ts,
         $SqlToksLower AS tsl FROM documents),
       gop_m AS (SELECT doc_id, source, n_chars,
         length(ts) AS ntok,
         CASE WHEN length(ts) = 0 THEN 0.0
           ELSE coalesce(list_sum(list_transform(ts, x -> length(x))), 0)::DOUBLE
                / length(ts) END AS meanlen,
         CASE WHEN length(ts) = 0 THEN 0.0
           ELSE ((length(text) - length(replace(text, '#', '')))
             + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3)::DOUBLE
             / length(ts) END AS symr,
         CASE WHEN length(ts) = 0 THEN 0.0
           ELSE length(list_filter(ts, x -> regexp_matches(x, '\\p{L}')))::DOUBLE
                / length(ts) END AS alphaf,
         length(list_intersect(tsl, $stops)) AS nstops
       FROM gop_w),
       gop_r AS (SELECT doc_id, source, n_chars,
         (ntok < $GopherMinWords OR ntok > $GopherMaxWords) AS fw,
         (meanlen < $GopherMinMeanLen OR meanlen > $GopherMaxMeanLen) AS fl,
         (symr > $GopherMaxSymbolRatio) AS fs,
         (alphaf < $GopherMinAlphaFrac) AS fa,
         (nstops < $GopherMinStops) AS fp
       FROM gop_m)"""
  }

  val gopherRulesSql: String =
    s"""WITH $SqlGopherDocCte
       SELECT source, count(*)::BIGINT AS n_docs,
         CAST(sum(CASE WHEN fw THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_words,
         CAST(sum(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wordlen,
         CAST(sum(CASE WHEN fs THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_symbol,
         CAST(sum(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
         CAST(sum(CASE WHEN fp THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop,
         CAST(sum(CASE WHEN NOT fw AND NOT fl AND NOT fs AND NOT fa
           AND NOT fp THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       FROM gop_r GROUP BY source"""

  /** The END-TO-END corpus assembly — the composed pipeline every
    * published pretraining-data recipe runs (C4 / Gopher / CCNet
    * shape): Gopher hard-reject quality gate → MinHash near-dup
    * cluster deletion → eval-set exclusion + passage-overlap
    * decontamination → per-source audit of what survives. One
    * catalog entry proving the operator families COMPOSE — each
    * stage emits an id-sized flag frame (per-doc gopher flags are a
    * projection, the near-dup drop list and contamination list are
    * leak-sized) and the corpus is touched once per signal family,
    * never materialized in between.
    *
    * Composition semantics, pinned identically in the oracle: each
    * stage's flag is computed on the FULL corpus independently, then
    * intersected — not sequentially re-derived on the shrinking
    * survivor set. That is the auditable/cacheable formulation (a
    * stage's flags can be reused across pipeline variants); dedup
    * clusters in particular do not change when a quality-rejected
    * doc would have been their minimum, which sequential recompute
    * would allow. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    // gate on the four content rules; the required-stopword rule is
    // tuned out for this corpus (its synthetic vocabulary carries
    // one stopword total, so fp rejects 100% — Gopher's own rules
    // were tuned to MassiveWeb, and per-corpus rule selection is the
    // normal deployment move; q_gopher_rules still audits all five)
    val ok = gopherDocFlags(spark, dir)
      .filter(!col("fw") && !col("fl") && !col("fs") && !col("fa"))
      .select(col("doc_id"), col("source"), col("n_chars"))
    val drops = Dedup.nearDupDrops(spark, dir)
    val contaminated = decontaminateNgram(spark, dir).select("doc_id")
    ok.filter(col("doc_id") % 20 =!= 0)
      .join(drops, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
  }

  /** Composes the minhash-closure, gopher, and decontamination CTE
    * fragments VERBATIM — the hash gate proves the composed plan
    * equals the composition of the already-gated stages. */
  val curationPipelineSql: String =
    s"""${Dedup.SqlClosureCte},
       drops AS (SELECT node FROM lab WHERE node <> component),
       $SqlGopherDocCte,
       $SqlDecontamGramCte,
       dec_hit AS (SELECT DISTINCT doc_id FROM dec_g JOIN dec_ev USING (gh)
         WHERE doc_id % 20 <> 0)
       SELECT source, count(*)::BIGINT AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM gop_r
       WHERE NOT fw AND NOT fl AND NOT fs AND NOT fa
         AND doc_id % 20 <> 0
         AND doc_id NOT IN (SELECT node FROM drops)
         AND doc_id NOT IN (SELECT doc_id FROM dec_hit)
       GROUP BY source"""

  /** Per-class deterministic downsampling rates (1-in-N per lang) —
    * class rebalancing with the same hash-stable property as
    * [[splitAssign]]: growth never resamples a kept doc away. */
  val StratifiedRates: Map[String, Int] =
    Map("en" -> 2, "ru" -> 3, "de" -> 5, "fr" -> 10, "zh" -> 20)

  /** Stratified deterministic sampling: keep doc when
    * md5-bucket(doc_id) mod rate(lang) = 0 — the per-class rebalance
    * every mixture-tuned training set applies. Pure per-row map plus
    * one small audit aggregate; unknown classes keep everything
    * (rate 1). */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = StratifiedRates.foldLeft(lit(1)) {
      case (c, (l, r)) => when(col("lang") === l, lit(r)).otherwise(c)
    }
    t(spark, dir, "documents")
      .withColumn("rate", rate)
      .filter(pmod(hash32(col("doc_id").cast("string")), col("rate")) === 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
  }

  val sampleStratifiedSql: String = {
    val rateCase = StratifiedRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 1 END")
    s"""SELECT lang, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM (SELECT lang, n_chars,
         CAST(concat('0x', substring(md5(doc_id::VARCHAR), 1, 8)) AS BIGINT)
           % ($rateCase) AS m
         FROM documents)
       WHERE m = 0 GROUP BY lang"""
  }

  /** Corpus-decile quality gate: keep documents whose quality score
    * reaches the corpus's exact 10th-percentile score; report the
    * keep audit per source. The naive exact quantile (global sort, or
    * an ntile window) is a single-reducer trap at corpus scale — here
    * the r4-rounded score quantizes to ≤ 10⁴ distinct values, so the
    * plan is two map-side-combined aggregations (score histogram,
    * per-source audit) plus a cumulative sum over the BOUNDED
    * histogram: the only serial step is O(10⁴) regardless of corpus
    * size, and the threshold broadcasts back. Discrete-quantile rank
    * uses integer math — ceil(N/10) = (N+9) div 10 — so there is no
    * float boundary for engines to disagree on. */
  def qualityThreshold(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.Num._
    graft.functions.GraftFunctions.register(spark)
    val scored = Tables.fanOut(Tables.t(spark, dir, "documents"))
      .withColumn("f",
        graft.functions.GraftFunctions.textFeatures(col("text")))
      .select(col("doc_id"), col("source"),
        r4(qualityScoreFromFeatures(col("f"))).as("score"))
      .persist()
    graft.operators.Quantiles
      .keepAboveQuantile(scored, "score", "source", 1, 10)
      .select(col("source"), col("threshold"),
        col("n_rows").as("n_docs"), col("n_kept"),
        r4(col("n_kept").cast("double") / col("n_rows").cast("double"))
          .as("kept_frac"))
  }

  val qualityThresholdSql: String = {
    import graft.queries.Num.sqlR
    s"""WITH f AS (${TextAnalysis.SqlFeatureSelect}),
       s AS (SELECT doc_id, source,
         ${sqlR(TextAnalysis.SqlQualityExpr, 4)} AS score FROM f),
       h AS (SELECT score, count(*) AS n FROM s GROUP BY score),
       c AS (SELECT score, sum(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
       tot AS (SELECT sum(n) AS total FROM h),
       t AS (SELECT min(score) AS threshold FROM c, tot
             WHERE cum >= (total + 9) // 10)
       SELECT source, threshold, count(*)::BIGINT AS n_docs,
         sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         ${sqlR("sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)::DOUBLE / count(*)", 4)} AS kept_frac
       FROM s, t GROUP BY source, threshold"""
  }

  /** Per-source char budget for [[tokenBudget]] — roughly half of
    * each synthetic source's mass, so the boundary logic is
    * exercised everywhere. */
  val SourceBudgetChars = 4000L

  /** Budget-constrained mixture selection: per source, keep the
    * best-quality documents whose cumulative size fits
    * [[SourceBudgetChars]] — the step that assembles a training
    * mixture once quality scores exist ("take the best B tokens from
    * each source").
    *
    * Scale shape (same bounded-histogram discipline as
    * [[qualityThreshold]]): the corpus collapses to a per-(source,
    * r4-score) histogram first, whole score buckets are admitted via
    * a cumulative sum over that BOUNDED histogram, and only the ONE
    * boundary bucket per source sees per-document work (ordered fill
    * by doc_id until the budget). No per-document global sort, no
    * single reducer over a source's full mass — the serial step is
    * O(distinct rounded scores) + O(boundary bucket). Deterministic:
    * score descending, doc_id ascending inside the boundary.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.Num._
    graft.functions.GraftFunctions.register(spark)
    val scored = Tables.fanOut(t(spark, dir, "documents"))
      .withColumn("f",
        graft.functions.GraftFunctions.textFeatures(col("text")))
      .select(col("doc_id"), col("source"), col("n_chars"),
        r4(qualityScoreFromFeatures(col("f"))).as("score"))
      .persist()
    val hist = scored.groupBy(col("source"), col("score"))
      .agg(sum(col("n_chars")).as("bch"), count(lit(1)).as("bn"))
    val before = Window.partitionBy(col("source"))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // persisted: three consumers (full buckets, boundary row, boundary
    // fill join) would otherwise each re-aggregate the corpus-sized
    // scored cache into the histogram; the histogram itself is bounded
    // (distinct rounded scores per source), so caching it is free
    val h = hist.withColumn("cum_before",
      coalesce(sum(col("bch")).over(before), lit(0L)))
      .persist()
    val full = h.filter(col("cum_before") + col("bch") <= SourceBudgetChars)
      .groupBy(col("source"))
      .agg(sum(col("bn")).cast("long").as("n_full"),
        sum(col("bch")).cast("long").as("ch_full"),
        min(col("score")).as("min_full_score"))
    val boundary = h.filter(col("cum_before") < SourceBudgetChars &&
        col("cum_before") + col("bch") > SourceBudgetChars)
      .select(col("source"), col("score").as("bscore"),
        col("cum_before"))
    val fillW = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryTaken = scored
      .join(boundary,
        scored("source") === boundary("source") &&
          scored("score") === boundary("bscore"))
      .drop(boundary("source"))
      .withColumn("run", sum(col("n_chars")).over(fillW))
      .filter(col("cum_before") + col("run") <= SourceBudgetChars)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_b"), sum(col("n_chars")).as("ch_b"))
    full.join(boundary.select(col("source"), col("bscore")), Seq("source"),
        "full_outer")
      .join(boundaryTaken, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("bscore"), col("min_full_score")).as("threshold"),
        (coalesce(col("n_full"), lit(0L)) + coalesce(col("n_b"), lit(0L)))
          .cast("long").as("n_kept"),
        (coalesce(col("ch_full"), lit(0L)) + coalesce(col("ch_b"), lit(0L)))
          .cast("long").as("chars_kept"))
  }

  val tokenBudgetSql: String = {
    import graft.queries.Num.sqlR
    val B = SourceBudgetChars
    s"""WITH f AS (${TextAnalysis.SqlFeatureSelect}),
       sc AS (SELECT doc_id, source, n_chars,
         ${sqlR(TextAnalysis.SqlQualityExpr, 4)} AS score FROM f),
       hist AS (SELECT source, score, sum(n_chars) AS bch, count(*) AS bn
                FROM sc GROUP BY 1, 2),
       h AS (SELECT *, coalesce(sum(bch) OVER (PARTITION BY source
           ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before FROM hist),
       fullb AS (SELECT source, CAST(sum(bn) AS BIGINT) AS n_full,
           CAST(sum(bch) AS BIGINT) AS ch_full,
           min(score) AS min_full_score
         FROM h WHERE cum_before + bch <= $B GROUP BY source),
       bound AS (SELECT source, score AS bscore, cum_before FROM h
         WHERE cum_before < $B AND cum_before + bch > $B),
       btaken AS (SELECT source, CAST(count(*) AS BIGINT) AS n_b,
           CAST(sum(n_chars) AS BIGINT) AS ch_b
         FROM (SELECT sc.source, sc.n_chars, bound.cum_before,
             sum(sc.n_chars) OVER (PARTITION BY sc.source
               ORDER BY sc.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           FROM sc JOIN bound
             ON sc.source = bound.source AND sc.score = bound.bscore)
         WHERE cum_before + run <= $B GROUP BY source)
       SELECT coalesce(fullb.source, bound.source) AS source,
         coalesce(bound.bscore, fullb.min_full_score) AS threshold,
         CAST(coalesce(n_full, 0) + coalesce(n_b, 0) AS BIGINT) AS n_kept,
         CAST(coalesce(ch_full, 0) + coalesce(ch_b, 0) AS BIGINT)
           AS chars_kept
       FROM fullb
       FULL OUTER JOIN bound ON fullb.source = bound.source
       FULL OUTER JOIN btaken ON coalesce(fullb.source, bound.source)
         = btaken.source"""
  }

  /** Importance-weighting target domain for [[dsirWeights]]. */
  val DsirTarget = "src0"

  /** Data-selection importance weights — the DSIR shape (Xie et al.
    * 2023, arXiv:2302.03169: score every corpus document by how much
    * its hashed-n-gram distribution resembles a target domain vs the
    * raw corpus, then sample by weight). Unigram counts with Laplace
    * smoothing give per-word ratios r = p_target(w)/p_corpus(w); a
    * document's weight is the sum of (r−1)/(r+1) over its words —
    * that surrogate equals tanh(½·ln r), monotone in the true
    * log-likelihood ratio, and keeps the arithmetic algebraic
    * (+,−,×,÷ only) so the DuckDB oracle reproduces it bit-for-bit
    * (the libm-avoidance rule of TextFunctions.modelScoreRaw —
    * ln/exp differ across engines in the last ulp).
    *
    * Scale shape: the ratio table is vocab-sized (hashed buckets cap
    * it at ~10⁴ in a production config) and BROADCASTS; the word
    * explode never regroups across the cluster — explode preserves
    * row locality, so the per-doc sum partial-aggregates each
    * document back to one row map-side and the only corpus-wide
    * shuffle carries ~one narrow row per document. NOTHING
    * corpus-sized is ever cached: one counting pass folds corpus and
    * target counts into the vocab-sized table in the same map-side-
    * combined groupBy (a conditional count, not a second scan), the
    * three scalars (token totals + vocab size) are aggregates OF that
    * table, and the scoring pass re-derives the word explode from the
    * narrow (doc_id, text) scan — two scans of the source beat a
    * 40×-corpus-row persist at any real scale (the packSequences
    * recompute-vs-cache lesson, NOTES.md). */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    def words = Tables.fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val counts = words.groupBy("w").agg(
      count(lit(1)).as("n_c"),
      count(when(col("source") === DsirTarget, 1)).as("n_t"))
      .persist() // vocab-sized: totals aggregate + ratio projection
    val tot = counts.agg(
      sum(col("n_c")).as("tc"), sum(col("n_t")).as("tt"),
      count(lit(1)).as("v")).head()
    val (totC, totT, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val ratios = counts
      .select(col("w"),
        (((col("n_t") + lit(1L)) / lit(totT + v)) /
          ((col("n_c") + lit(1L)) / lit(totC + v))).as("r"))
      .select(col("w"), ((col("r") - lit(1.0)) / (col("r") + lit(1.0)))
        .as("wscore"))
    words.join(broadcast(ratios), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(r6(sum(col("wscore"))).as("dsir_score"))
  }

  val dsirWeightsSql: String =
    s"""WITH wds AS (SELECT doc_id, source, w FROM (
           SELECT doc_id, source,
             unnest(string_split(lower(text), ' ')) AS w
           FROM documents) WHERE w <> ''),
       c AS (SELECT w, count(*) AS n_c FROM wds GROUP BY w),
       tg AS (SELECT w, count(*) AS n_t FROM wds
              WHERE source = '$DsirTarget' GROUP BY w),
       tot AS (SELECT (SELECT count(*) FROM wds) AS tc,
                 (SELECT count(*) FROM wds
                  WHERE source = '$DsirTarget') AS tt,
                 (SELECT count(*) FROM c) AS v),
       lr AS (SELECT c.w,
                ((coalesce(n_t, 0) + 1) / (tt + v)) /
                  ((n_c + 1) / (tc + v)) AS r
              FROM c LEFT JOIN tg USING (w) CROSS JOIN tot),
       ws AS (SELECT w, (r - 1.0) / (r + 1.0) AS wscore FROM lr)
       SELECT doc_id, ${sqlR("sum(wscore)", 6)} AS dsir_score
       FROM wds JOIN ws USING (w) GROUP BY doc_id"""

  /** Weighted sample size. */
  val WeightedSampleN = 50

  /** Deterministic weighted sampling — sequential Poisson / priority
    * sampling (Ohlsson 1998; Duffield et al. use u^(1/w), whose
    * ranking this matches in expectation while staying algebraic):
    * per-doc priority = u / w with u the md5-uniform die in (0,1] and
    * w = n_chars, keep the [[WeightedSampleN]] lowest priorities —
    * long documents enter the sample proportionally more often, and
    * the draw is reproducible forever (re-running the pipeline can
    * not swap sample members — the property every curation sample
    * needs, and the oracle proof: both engines derive the identical
    * priority from the identical md5, so even the ORDER is
    * bit-deterministic, no rounding required for ranking).
    *
    * Scale shape: priority is a pure per-row map; the bottom-k is one
    * TakeOrdered (per-partition heap + driver merge of k·P rows) —
    * no shuffle of the corpus, the same scan-and-heap discipline as
    * [[graft.queries.Dedup.kmvDistinct]]. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = (hash60(col("doc_id").cast("string")) + lit(1L)) /
      lit(1.152921504606846976e18)
    val w = Window.orderBy(col("pri").asc, col("doc_id"))
    t(spark, dir, "documents")
      // weight 0 means "never sample" by definition — and the filter
      // is also the engine-parity guard: Spark's non-ANSI x/0 is NULL
      // (sorts first!) where DuckDB's is +Infinity (sorts last)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        (u / col("n_chars")).as("pri"))
      .orderBy(col("pri"), col("doc_id")).limit(WeightedSampleN)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_chars"))
  }

  val weightedSampleSql: String =
    s"""WITH p AS (SELECT doc_id, n_chars,
           ((CAST(concat('0x', substring(md5(doc_id::VARCHAR), 1, 15))
             AS BIGINT) + 1) / 1.152921504606846976e18) / n_chars AS pri
         FROM documents WHERE n_chars > 0),
       k AS (SELECT doc_id, n_chars, pri,
               row_number() OVER (ORDER BY pri, doc_id) AS rank
             FROM p ORDER BY pri, doc_id LIMIT $WeightedSampleN)
       SELECT rank, doc_id, n_chars FROM k"""

  /** Bigram-LM fluency score — the CCNet-style language-model-fit
    * signal (Wenzek et al. 2019, arXiv:1911.00359 rank documents by
    * the perplexity of an LM trained on a trusted corpus; here the LM
    * is a Laplace-smoothed bigram model trained on the corpus
    * itself). Per adjacent word pair, the model compares the
    * context-conditioned probability to the unigram baseline,
    * r = p(w2|w1) / p(w2); the document score is the mean of
    * tanh(½·ln r) = (r−1)/(r+1) over its pairs — monotone in the mean
    * log-ratio (pointwise mutual information), and algebraic-only so
    * the DuckDB oracle reproduces it bit-for-bit (the libm-avoidance
    * rule of [[dsirWeights]]). Fluent/repetitive word sequences score
    * high (their bigrams are predictable from context); shuffled or
    * gibberish text scores ≈ 0. Documents with fewer than two words
    * have no bigrams and are absent from the output.
    *
    * Smoothing denominators: p(w2|w1) uses w1's unigram count (not
    * its context count — identical except for document-final words,
    * and one fewer vocab-sized table), V = unigram vocab size.
    *
    * Scale shape (the [[dsirWeights]] discipline): the unigram table
    * is vocab-sized (sublinear, Heaps' law) and broadcasts; the
    * BIGRAM type table grows near-linearly with the corpus, so its
    * broadcast is SIZE-GATED on the free upper bound v² (v = unigram
    * vocab size, already computed for smoothing — no extra counting
    * pass, nothing bigram-sized persisted): broadcast only when
    * v² ≤ [[LmBigramBroadcastMaxTypes]]. Above the gate the ratio
    * join degrades to a plain shuffle join on (w1, w2): one extra
    * corpus-wide pair shuffle, but bounded driver memory at any
    * corpus size. The word/bigram explodes stay map-side (explode
    * preserves row locality, so the per-doc mean partial-aggregates
    * before the one narrow per-doc shuffle), and the scoring-pass
    * bigram stream is re-derived from the narrow (doc_id, text)
    * scan. */
  def lmFluency(spark: SparkSession, dir: String): DataFrame =
    lmFluency(spark, dir, LmBigramBroadcastMaxTypes)

  /** Broadcast ceiling for [[lmFluency]]'s bigram ratio table, in
    * bigram TYPES (distinct (w1,w2) pairs). ~60 B/row serialized →
    * the default caps the driver/executor copy near 60 MB; anything
    * larger shuffle-joins instead. */
  val LmBigramBroadcastMaxTypes = 1000000L

  /** [[lmFluency]] with an explicit broadcast gate (0 forces the
    * shuffle-join path — the plan a 100 TB corpus takes). */
  def lmFluency(spark: SparkSession, dir: String,
      broadcastMaxTypes: Long): DataFrame = {
    def docs = Tables.fanOut(t(spark, dir, "documents"))
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), w => w =!= "").as("a"))
    def pairs = docs
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
           (x, y) -> struct(x AS w1, y AS w2))""")).as("z"))
      .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
    val uni = docs.select(explode(col("a")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("nw"))
      .persist() // vocab-sized: totals aggregate + two ratio joins
    val tot = uni.agg(coalesce(sum(col("nw")), lit(0L)), count(lit(1))).head()
    val (totW, v) = (tot.getLong(0), tot.getLong(1))
    val terms = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("nb"))
      .join(uni.select(col("w").as("w1"), col("nw").as("n1")), "w1")
      .join(uni.select(col("w").as("w2"), col("nw").as("n2")), "w2")
      .select(col("w1"), col("w2"),
        (((col("nb") + lit(1L)) / (col("n1") + lit(v))) /
          ((col("n2") + lit(1L)) / lit(totW + v))).as("r"))
      .select(col("w1"), col("w2"),
        ((col("r") - lit(1.0)) / (col("r") + lit(1.0))).as("term"))
    // gate on the FREE upper bound v² (v = unigram vocab, already an
    // action above) rather than counting bigram types: no extra
    // corpus pass and nothing bigram-sized to persist (a persisted
    // count table would leak for the session — the returned plan
    // keeps referencing it, so the caller can never unpersist).
    // Conservative by design: a corpus whose true type count is far
    // below v² loses the broadcast, never the other way round.
    val build =
      if (v <= math.sqrt(broadcastMaxTypes.toDouble).toLong)
        broadcast(terms)
      else terms
    pairs.join(build, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(r6(avg(col("term"))).as("lm_score"))
  }

  val lmFluencySql: String =
    s"""WITH d AS (SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
         FROM documents),
       wds AS (SELECT doc_id, unnest(a) AS w FROM d),
       uni AS (SELECT w, count(*) AS nw FROM wds GROUP BY w),
       tot AS (SELECT (SELECT sum(nw) FROM uni) AS t,
                 (SELECT count(*) FROM uni) AS v),
       p2 AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM
               (SELECT doc_id,
                  unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS z
                FROM d WHERE len(a) >= 2)),
       big AS (SELECT w1, w2, count(*) AS nb FROM p2 GROUP BY 1, 2),
       rt AS (SELECT b.w1, b.w2,
                ((b.nb + 1) / (u1.nw + v)) / ((u2.nw + 1) / (t + v)) AS r
              FROM big b JOIN uni u1 ON b.w1 = u1.w
                JOIN uni u2 ON b.w2 = u2.w CROSS JOIN tot),
       ws AS (SELECT w1, w2, (r - 1.0) / (r + 1.0) AS term FROM rt)
       SELECT doc_id, ${sqlR("avg(term)", 6)} AS lm_score
       FROM p2 JOIN ws USING (w1, w2) GROUP BY doc_id"""

  /** CCNet head/middle/tail corpus split (Wenzek et al. 1911.00359
    * §4.3): per LANGUAGE, rank documents by LM fit and cut the
    * corpus into terciles — "head" is the most-fluent third, the
    * slice CCNet ships as its highest-quality subset. The LM signal
    * is [[lmFluency]]; the tercile is the bounded-histogram exact
    * ntile ([[graft.operators.Quantiles.ntileBuckets]] partitioned
    * by lang — no per-language global sort), with the r6'd score
    * pre-quantized to 10⁻⁴ bands so the histogram stays ≤ 2·10⁴
    * cells per language at any corpus size. Output: one row per
    * (lang, bucket) with its size and score range. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scores = lmFluency(spark, dir)
    val langs = t(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val bands = scores.join(langs, "doc_id")
      .select(col("lang"),
        floor(col("lm_score") * 10000).cast("long").as("band"))
    graft.operators.Quantiles.ntileBuckets(bands, "band", 3, Seq("lang"))
      .select(col("lang"),
        when(col("tile") === 3, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail").as("bucket"),
        col("n_rows").as("n_docs"),
        r6(col("lo") / 10000.0).as("lo_score"),
        r6(col("hi") / 10000.0).as("hi_score"))
  }

  /** Shares [[lmFluencySql]] verbatim as the score CTE and keeps the
    * literal ntile(3) window — the hash gate is the equivalence
    * proof for the histogram tercile (q_ntile_deciles pattern). */
  val ccnetBucketsSql: String =
    s"""WITH scores AS ($lmFluencySql),
       b AS (SELECT s.doc_id, d.lang,
               CAST(floor(s.lm_score * 10000) AS BIGINT) AS band
             FROM scores s JOIN documents d USING (doc_id)),
       t AS (SELECT lang, band,
               ntile(3) OVER (PARTITION BY lang ORDER BY band) AS tile
             FROM b)
       SELECT lang,
         CASE tile WHEN 3 THEN 'head' WHEN 2 THEN 'middle'
           ELSE 'tail' END AS bucket,
         count(*)::BIGINT AS n_docs,
         ${sqlR("min(band) / 10000.0", 6)} AS lo_score,
         ${sqlR("max(band) / 10000.0", 6)} AS hi_score
       FROM t GROUP BY 1, 2"""

  /** Hashed feature space of the trainable quality classifier. */
  val LrFeatures = 256L

  /** Two full-batch gradient-descent steps of a logistic-regression
    * text classifier over hashed unigram presence features — the
    * TRAINING side of the fasttext-style quality/language classifier
    * every curation stack fields (CCNet trains fasttext LID+quality,
    * Wenzek et al. 1911.00359 §4; [[dsirWeights]] is the inference
    * side of such a model, this is how its weights come to exist).
    * Label: `lang = 'en'` (train an English detector on the corpus's
    * own language tags). Learning rate 1, init w = 0.
    *
    * The distributed-GD shape, which is the point of the entry:
    * - **step 1** collapses to exact integer statistics — at w = 0
    *   every score is ½, so the gradient per feature j is
    *   (½·n_j − pos_j)/N from one explode + partially-aggregated
    *   count, and w1 = −grad is exact before its single r6.
    * - **parameter broadcast**: w1 is vocab-sized (≤ [[LrFeatures]]
    *   rows) and rides to the executors as a literal map — the
    *   parameter-server step of a GD iteration, same license as the
    *   bounded `tot.head()` collects of [[dsirWeights]]/[[lmFluency]].
    * - **step 2** is ONE corpus pass with per-row score computation
    *   (z from the feature array against the broadcast map, the
    *   algebraic sigmoid ½ + ½·z/(1+|z|) — the libm-avoidance rule)
    *   and a gradient shuffle of ≤ [[LrFeatures]] cells per task
    *   after map-side partial aggregation. Nothing corpus-sized is
    *   persisted or joined against itself; iterating = repeating the
    *   broadcast-score-aggregate pass.
    *
    * Determinism: z is r6-rounded before the sigmoid, every gradient
    * is r6-rounded after its /N, so cross-engine re-association noise
    * stays under the epsilon-round guard. Features hash through the
    * native [[graft.functions.expressions.WordGramHashes]] pass
    * (n = 1 ⇒ per-token hash60), keeping md5 out of interpreted HOF
    * loops; the residual per-element `% m` transform is cheap
    * arithmetic. Output: one row per live feature — (f, n_docs, w1,
    * w2), the weight table after each step. */
  def logregStep(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    def d = Tables.fanOut(t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        array_distinct(transform(
          graft.functions.GraftFunctions.wordGramHashes(col("text"), 1),
          h => h % lit(LrFeatures))).as("fs"))
    val nDocs = d.count()
    val feats = d.select(col("y"), explode(col("fs")).as("f"))
    val w1 = feats.groupBy(col("f"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("pos"))
      .select(col("f"), col("n_docs"),
        r6((col("pos") - lit(0.5) * col("n_docs")) / lit(nDocs.toDouble))
          .as("w1"))
    // parameter broadcast: the vocab-sized weight table as a literal
    // map (bounded collect — LrFeatures rows at most). n_docs rides
    // along so the FINAL join can reuse these rows as a local
    // relation instead of re-deriving w1 (which re-hashes and
    // re-explodes the whole corpus — a fourth pass over the three a
    // GD step intrinsically needs: stats, step 1, step 2).
    val w1Rows = w1.select(col("f"), col("n_docs"), col("w1")).collect()
    // typedLit keeps the map<bigint,double> type on an empty corpus,
    // where bare map() would default to map<string,string>
    val w1Map = if (w1Rows.isEmpty) typedLit(Map.empty[Long, Double])
      else map(w1Rows.flatMap(r =>
        Seq(lit(r.getLong(0)), lit(r.getDouble(2)))).toIndexedSeq: _*)
    val scored = d.select(col("y"), col("fs"),
        r6(aggregate(col("fs"), lit(0.0),
          (acc, f) => acc + coalesce(element_at(w1Map, f), lit(0.0))))
          .as("z"))
      .select(col("y"), col("fs"),
        (lit(0.5) + lit(0.5) * col("z") / (lit(1.0) + abs(col("z"))))
          .as("p"))
    val g2 = scored.select(col("p") - col("y").cast("double") as "e",
        explode(col("fs")).as("f"))
      .groupBy(col("f"))
      .agg(r6(sum(col("e")) / lit(nDocs.toDouble)).as("grad2"))
    // the collected rows ARE w1 — a local relation here keeps the
    // final join corpus-free (values bit-identical: same rows)
    val w1Local = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(w1Rows: _*)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("f",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("w1",
          org.apache.spark.sql.types.DoubleType))))
    w1Local.join(g2, Seq("f"))
      .select(col("f"), col("n_docs"), col("w1"),
        r6(col("w1") - col("grad2")).as("w2"))
  }

  val logregStepSql: String =
    s"""WITH d AS (SELECT doc_id,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           ${TextAnalysis.SqlToksLower} AS a
         FROM documents WHERE text IS NOT NULL),
       n AS (SELECT count(*) AS n FROM d),
       f AS (SELECT DISTINCT doc_id, y,
               CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT)
                 % $LrFeatures AS f
             FROM (SELECT doc_id, y, unnest(a) AS w FROM d)),
       g1 AS (SELECT f, count(*)::BIGINT AS n_docs, sum(y) AS pos
              FROM f GROUP BY f),
       w1 AS (SELECT f, n_docs,
                ${sqlR("(pos - 0.5 * n_docs) / n", 6)} AS w1
              FROM g1 CROSS JOIN n),
       z AS (SELECT doc_id, y, ${sqlR("sum(w1.w1)", 6)} AS z
             FROM f JOIN w1 USING (f) GROUP BY doc_id, y),
       p AS (SELECT doc_id, y, 0.5 + 0.5 * z / (1 + abs(z)) AS p FROM z),
       g2 AS (SELECT f.f,
                ${sqlR("sum(p.p - p.y) / any_value(n.n)", 6)} AS grad2
              FROM f JOIN p USING (doc_id) CROSS JOIN n GROUP BY f.f)
       SELECT w1.f, n_docs, w1.w1 AS w1,
         ${sqlR("w1.w1 - grad2", 6)} AS w2
       FROM w1 JOIN g2 USING (f)"""

  /** Difficulty buckets for [[curriculumOrder]] (length-decile proxy;
    * swap in any integer difficulty score). Domain ≤ 10 by
    * construction — the driver-collected histogram is bounded by the
    * bucket count, never the corpus. */
  val CurriculumBuckets = 10

  /** Stratified-interleave training order: assign each document a
    * difficulty bucket, rank within its bucket, and emit the global
    * epoch position that cycles one document from each bucket per
    * round (rn = 1 of every bucket, then rn = 2, …) — the ordering
    * that keeps every difficulty stratum uniformly spread through the
    * epoch instead of clumped (training-order control is a curation
    * op: a length-sorted epoch skews every late batch long).
    *
    * Scale shape: ONE range-partitioned sort pays for everything.
    * [[graft.operators.GlobalRank]] ranks (bucket, doc_id) with the
    * two-pass prefix-offset discipline (no single-reducer window);
    * the within-bucket rank falls out by subtracting the bucket's
    * start offset, and the interleave position is CLOSED FORM from
    * the 10-row bucket histogram (driver-collected literals), so the
    * second global sort a naive plan would run never happens. The
    * DuckDB oracle computes both ranks with literal row_number
    * windows, so the hash gate re-proves rank arithmetic ≡
    * row_number. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.GlobalRank
    val b = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        expr(s"CAST(least(n_chars div 100, ${CurriculumBuckets - 1}) AS BIGINT)")
          .as("bucket"))
    val g = GlobalRank.rank(b, Seq(col("bucket"), col("doc_id")), "gr")
    // bucket histogram: ≤ CurriculumBuckets rows (bounded collect)
    val cnts = b.groupBy(col("bucket")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val buckets = cnts.keys.toSeq.sorted
    val cumBefore: Map[Long, Long] = buckets.zip(
      buckets.scanLeft(0L)((acc, bb) => acc + cnts(bb))).toMap
    val rn = col("gr") - buckets.foldLeft(lit(0L)) { (acc, bb) =>
      when(col("bucket") === bb, lit(cumBefore(bb))).otherwise(acc)
    }
    val withRn = g.withColumn("rn", rn)
    // rows strictly before (rn, bucket) in (rn, bucket) lex order:
    // every bucket contributes min(cnt, rn−1) earlier-round rows,
    // lower buckets add one more if they reach this round
    val earlierRounds = buckets.map(bb =>
      least(lit(cnts(bb)), col("rn") - 1L)).reduce(_ + _)
    val sameRound = buckets.foldLeft(lit(0L)) { (acc, bb) =>
      when(col("bucket") === bb,
        buckets.filter(_ < bb).map(b2 =>
          when(lit(cnts(b2)) >= col("rn"), 1L).otherwise(0L))
          .foldLeft(lit(0L))(_ + _))
        .otherwise(acc)
    }
    withRn.select(col("doc_id"), col("bucket"), col("rn"),
      (lit(1L) + earlierRounds + sameRound).as("ord"))
  }

  val curriculumOrderSql: String =
    s"""WITH b AS (SELECT doc_id,
           least(n_chars // 100, ${CurriculumBuckets - 1})::BIGINT AS bucket
         FROM documents),
       r AS (SELECT doc_id, bucket, row_number() OVER (
               PARTITION BY bucket ORDER BY doc_id)::BIGINT AS rn FROM b)
       SELECT doc_id, bucket, rn,
         row_number() OVER (ORDER BY rn, bucket)::BIGINT AS ord FROM r"""

  /** Exact per-stratum quota for [[quotaSample]]. */
  val QuotaK = 5

  /** Exact-quota stratified sampling: EXACTLY k documents per source,
    * elected by a deterministic md5 die with doc_id tie-break — the
    * "give me 5 eval examples from every domain" op.
    * [[Curation.sampleStratified]] samples at a per-class RATE (count
    * varies with the stratum); this variant guarantees the count,
    * which is what few-shot eval-set assembly needs.
    *
    * Scale shape: election by [[graft.operators.GroupTopK]] heaps —
    * a stratum's rank partition is its full slice of the corpus, so
    * the row_number window would exchange every row; the heaps cross
    * with at most partitions·strata·k rows. */
  def quotaSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupTopK
    val d = Tables.t(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        hash60(concat(lit("quota|"), col("doc_id").cast("string")))
          .as("die"))
    GroupTopK.topK(d, Seq("source"),
        Seq(("die", false), ("doc_id", false)), QuotaK)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("die"))
  }

  val quotaSampleSql: String =
    s"""SELECT source, rk, doc_id, die FROM (
         SELECT source, doc_id, die, row_number() OVER (
           PARTITION BY source ORDER BY die, doc_id)::BIGINT AS rk
         FROM (SELECT source, doc_id,
           CAST(concat('0x', substring(md5(
             concat('quota|', doc_id::VARCHAR)), 1, 15)) AS BIGINT) AS die
           FROM documents))
       WHERE rk <= $QuotaK"""

  val queries: Map[String, Q] = Map(
    "q_quota_sample" -> (quotaSample _),
    "q_curriculum_order" -> (curriculumOrder _),
    "q_logreg_step" -> (logregStep _),
    "q_token_budget" -> (tokenBudget _),
    "q_quality_threshold" -> (qualityThreshold _),
    "q_sample_stratified" -> (sampleStratified _),
    "q_weighted_sample" -> (weightedSample _),
    "q_split_assign" -> (splitAssign _),
    "q_mix_epochs" -> (mixEpochs _),
    "q_snapshot_diff" -> (snapshotDiff _),
    "q_pack_sequences" -> (packSequences _),
    "q_chunk_docs" -> (chunkDocs _),
    "q_decontaminate" -> (decontaminate _),
    "q_decontaminate_ngram" -> (decontaminateNgram _),
    "q_decontaminate_bloom" -> (decontaminateBloom _),
    "q_gopher_rules" -> (gopherRules _),
    "q_mixture_sample" -> (mixtureSample _),
    "q_dsir_weights" -> (dsirWeights _),
    "q_lm_fluency" -> (lmFluency _),
    "q_ccnet_buckets" -> (ccnetBuckets _),
    "q_curation_pipeline" -> (curationPipeline _),
  )

  val oracles: Map[String, String] = Map(
    "q_quota_sample" -> quotaSampleSql,
    "q_curriculum_order" -> curriculumOrderSql,
    "q_logreg_step" -> logregStepSql,
    "q_token_budget" -> tokenBudgetSql,
    "q_quality_threshold" -> qualityThresholdSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_split_assign" -> splitAssignSql,
    "q_mix_epochs" -> mixEpochsSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_chunk_docs" -> chunkDocsSql,
    "q_decontaminate" -> decontaminateSql,
    "q_decontaminate_ngram" -> decontaminateNgramSql,
    // Bloom prefilter + exact verify ≡ exact: same oracle verbatim.
    "q_decontaminate_bloom" -> decontaminateNgramSql,
    "q_gopher_rules" -> gopherRulesSql,
    "q_mixture_sample" -> mixtureSampleSql,
    "q_dsir_weights" -> dsirWeightsSql,
    "q_lm_fluency" -> lmFluencySql,
    "q_ccnet_buckets" -> ccnetBucketsSql,
    "q_curation_pipeline" -> curationPipelineSql,
  )
}
