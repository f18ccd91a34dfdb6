package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

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

  /** Token-budget sequence packing: per source, documents in doc_id
    * order accumulate into packs of ≤ [[PackBudget]] tokens (greedy
    * first-fit-in-order via running cumsum ÷ budget — the one-pass
    * approximation every large pipeline uses; optimal bin packing is
    * neither parallel nor stable). One shuffle on source; the window
    * cumsum is the only ordered pass. Oversized docs occupy their own
    * pack(s) by the same arithmetic. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "documents")
      .withColumn("toks", tokenCount(col("text")).cast("long"))
      .withColumn("cum", sum(col("toks")).over(w))
      // pack index of the pack this doc CLOSES into: floor-division
      // of the running total places boundary docs deterministically;
      // the greatest() guard keeps leading zero-token docs in pack 0
      // (floor vs truncation of -1 differs between engines)
      .withColumn("pack_id",
        expr(s"greatest(cum - 1, 0L) div $PackBudget"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).cast("long").as("n_tokens"))
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

  val queries: Map[String, Q] = Map(
    "q_quality_threshold" -> (qualityThreshold _),
    "q_sample_stratified" -> (sampleStratified _),
    "q_split_assign" -> (splitAssign _),
    "q_pack_sequences" -> (packSequences _),
    "q_decontaminate" -> (decontaminate _),
  )

  val oracles: Map[String, String] = Map(
    "q_quality_threshold" -> qualityThresholdSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_split_assign" -> splitAssignSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_decontaminate" -> decontaminateSql,
  )
}
