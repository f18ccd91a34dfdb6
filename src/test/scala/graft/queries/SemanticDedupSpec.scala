package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the round-4 dedup/curation queries beyond their
  * oracle hash-matches: paragraph-chunk keep-first behavior on a
  * controlled corpus (full-duplicate docs, intra-doc repeats, empty
  * text, partial overlap), SemDeDup output contracts (keep-min,
  * cluster confinement, threshold floor re-verified against directly
  * recomputed cosines), and the DSIR separation property (target
  * docs outscore the rest on the deterministic corpus).
  */
class SemanticDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---- paragraphDedup on a controlled corpus ----

  /** A 20-word chunk of distinct words prefixed by `p`. */
  private def chunk(p: String): String =
    (0 until Dedup.ChunkWords).map(i => s"$p$i").mkString(" ")

  test("paragraphDedup: keep-first across docs, intra-doc repeats, empty text") {
    val a = chunk("a"); val b = chunk("b"); val d = chunk("d")
    val e = chunk("e"); val short = "s0 s1 s2"
    val docs = Seq(
      (0L, s"$a $b"), // first occurrence of A and B — all kept
      (1L, s"$a $b"), // exact duplicate doc — keeps nothing
      (2L, s"$d $d"), // intra-doc repeat — second D dropped
      (3L, ""), // empty — absent from the result
      (4L, s"$a $e"), // partial overlap — keeps only E
      (5L, short) // sub-chunk-width doc — one (short) chunk, kept
    )
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-paragraph-spec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val out = Dedup.paragraphDedup(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_text"))))
      .toMap

    assert(!out.contains(3L), "empty-text doc must not appear")
    assert(out(0L) == ((2L, 2L, s"$a $b")))
    assert(out(1L) == ((2L, 0L, "")))
    assert(out(2L) == ((2L, 1L, d)))
    assert(out(4L) == ((2L, 1L, e)))
    assert(out(5L) == ((1L, 1L, short)))
  }

  test("paragraphDedup: corpus invariants at sf0.001") {
    val rows = Dedup.paragraphDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"))
      assert(k >= 0L && k <= n, s"doc ${r.getAs[Long]("doc_id")}: $k/$n")
      // the re-assembled text has exactly the surviving chunk count
      val kt = r.getAs[String]("kept_text")
      val chunks = if (kt.isEmpty) 0
        else (kt.split(" ").length + Dedup.ChunkWords - 1) / Dedup.ChunkWords
      assert(chunks <= n.toInt)
    }
  }

  // ---- dedupIncremental on a controlled corpus ----

  test("dedupIncremental: store suppresses, within-batch keeps first") {
    val cut = Dedup.IncrementalCut
    val docs = Seq(
      (0L, "alpha beta gamma"), // in store
      (1L, "delta epsilon"), // in store
      (cut, "alpha beta gamma"), // dup of stored doc 0 — dropped
      (cut + 1, "zeta eta theta"), // fresh — kept
      (cut + 2, "iota kappa"), // first of an in-batch pair — kept
      (cut + 3, "iota kappa") // second of the pair — dropped
    )
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-incremental-spec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val kept = Dedup.dedupIncremental(spark, tmp).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept == Seq(cut + 1, cut + 2))
  }

  // ---- semDedup contracts at sf0.001 ----

  private def cos(x: Array[Double], y: Array[Double]): Double = {
    val dot = x.zip(y).map { case (p, q) => p * q }.sum
    val nx = math.sqrt(x.map(v => v * v).sum)
    val ny = math.sqrt(y.map(v => v * v).sum)
    if (nx == 0 || ny == 0) 0.0 else dot / (nx * ny)
  }

  test("semDedup: keep-min, cluster confinement, threshold floor") {
    val vecs = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    // reference assignment: argmax cosine over the first NumCentroids
    // vectors, centroid-id tie-break (mirrors ivfAssign)
    val centroids = (0L until Similarity.NumCentroids.toLong)
      .map(i => i -> vecs(i))
    def cluster(id: Long): Long = centroids
      .map { case (cid, cv) =>
        (BigDecimal(cos(vecs(id), cv))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP), cid)
      }
      .maxBy { case (s, cid) => (s, -cid) }._2

    val rows = Similarity.semDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    val dropped = rows.map(_.getAs[Long]("dropped_id"))
    assert(dropped.distinct.length == dropped.length,
      "a vector is dropped at most once")
    rows.foreach { r =>
      val (cl, dr, kp, ms) = (r.getAs[Long]("cluster"),
        r.getAs[Long]("dropped_id"), r.getAs[Long]("kept_id"),
        r.getAs[Double]("max_sim"))
      assert(kp < dr, s"keep-min violated: $kp !< $dr")
      assert(cluster(dr) == cl && cluster(kp) == cl,
        s"pair ($kp,$dr) not confined to cluster $cl")
      // every partner cleared the floor; the min partner is one
      assert(cos(vecs(kp), vecs(dr)) >= Similarity.SemDedupCos - 1e-6)
      assert(ms >= Similarity.SemDedupCos)
    }
  }

  // ---- DSIR separation on the deterministic corpus ----

  // ---- weighted (priority) sampling ----

  test("weightedSample: heavy docs dominate; plan is a TakeOrdered") {
    // 200 docs, 20 with weight 5000 and 180 with weight 50 — heavy
    // docs hold ~92% of the total weight, so a 50-doc priority
    // sample overwhelmingly includes all of them
    val docs = (0L until 200L).map { i =>
      val heavy = i < 20
      (i, "x" * (if (heavy) 5000 else 50))
    } :+ (999L, "") // weight 0 — never sampled, by definition
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-wsample-spec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sample = Curation.weightedSample(spark, tmp).collect()
    assert(sample.length == Curation.WeightedSampleN)
    assert(sample.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to Curation.WeightedSampleN))
    val nHeavy = sample.count(_.getAs[Long]("n_chars") == 5000L)
    assert(nHeavy >= 15, s"only $nHeavy of 20 heavy docs sampled")
    assert(!sample.exists(_.getAs[Long]("doc_id") == 999L),
      "zero-weight doc must never enter the sample")

    val plan = Curation.weightedSample(spark, tmp)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"),
      s"expected a TakeOrdered top-k, got:\n$plan")
  }

  // ---- bigram-LM fluency separation on a controlled corpus ----

  test("lmFluency: coherent word order outscores shuffled; edge docs") {
    val fluentWords = (0 until 9).map(i => s"f$i")
    val fluent = fluentWords.mkString(" ") // fixed order, every doc
    val shuffledWords = (0 until 9).map(i => s"s$i")
    val rng = new scala.util.Random(7)
    def shuffled(): String = rng.shuffle(shuffledWords).mkString(" ")
    val docs =
      (0L until 6L).map(i => (i, (1 to 4).map(_ => fluent).mkString(" "))) ++
        (6L until 12L).map(i =>
          (i, (1 to 4).map(_ => shuffled()).mkString(" "))) ++
        Seq((12L, "lonely"), (13L, "")) // no bigrams — absent
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lmfluency-spec").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val scores = Curation.lmFluency(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_score"))
      .toMap
    assert(!scores.contains(12L) && !scores.contains(13L),
      "docs without bigrams must be absent")
    scores.values.foreach(s => assert(s > -1.0 && s < 1.0))
    def mean(xs: Iterable[Double]): Double = xs.sum / xs.size
    val mf = mean((0L until 6L).map(scores))
    val ms = mean((6L until 12L).map(scores))
    assert(mf > ms,
      f"fluent mean $mf%.4f not above shuffled mean $ms%.4f")
  }

  test("lmFluency: bigram broadcast is size-gated; shuffle path bit-equal") {
    val rng = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0L until 30L).map(i =>
      (i, (1 to 20).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lmfluency-gate").toString
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // plan shape under autoBroadcast OFF (the at-scale situation,
    // where Catalyst's own size threshold would also say no): the
    // PAIRS⋈TERMS join is the two-key (w1, w2) one — only the gate's
    // explicit hint can broadcast it
    val pairJoin = """BroadcastHashJoin \[w1#\d+, w2#\d+\]""".r
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThreshold = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      assert(pairJoin.findFirstIn(
        Curation.lmFluency(spark, tmp)
          .queryExecution.executedPlan.toString).nonEmpty,
        "under the default gate the tiny bigram table must broadcast")
      assert(pairJoin.findFirstIn(
        Curation.lmFluency(spark, tmp, broadcastMaxTypes = 0L)
          .queryExecution.executedPlan.toString).isEmpty,
        "gate=0 must take the shuffle-join path for the bigram table")
    } finally spark.conf.set(thresholdKey, prevThreshold)
    // semantics: both paths bit-identical
    val a = Curation.lmFluency(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Curation.lmFluency(spark, tmp, broadcastMaxTypes = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("lmFluency: empty documents table yields empty result") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lmfluency-empty").toString
    spark.createDataFrame(Seq.empty[(Long, String)]).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Curation.lmFluency(spark, tmp).count() === 0L)
  }

  test("dsirWeights: target-domain docs outscore the rest") {
    val scores = Curation.dsirWeights(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_score"))
      .toMap
    val bySource = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val (target, rest) = bySource.partition(_._2 == Curation.DsirTarget)
    assert(target.nonEmpty && rest.nonEmpty)
    def mean(xs: Seq[Double]): Double = xs.sum / xs.size
    val mt = mean(target.map(t => scores(t._1)).toSeq)
    val mr = mean(rest.map(t => scores(t._1)).toSeq)
    assert(mt > mr,
      f"target mean $mt%.3f not above rest mean $mr%.3f")
  }
}
