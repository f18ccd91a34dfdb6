package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.functions.GraftFunctions
import graft.queries.Num._

/** Spectral statistics of the embedding corpus — the covariance /
  * PCA tier of a vector pipeline (whitening before product
  * quantization, drift monitoring, OPQ-style rotations all start
  * here).
  *
  * Scale shape: everything reduces through
  * [[graft.functions.expressions.VectorGram]] — one corpus pass whose
  * aggregation state is O(d²) doubles per task (2 080 at d = 64) and
  * whose exchange carries one buffer per partition, never a row per
  * (i, j, vector) triple. The covariance matrix itself is
  * dimension-sized (64×64), so the eigen step runs on the driver over
  * ONE collected row — bounded by the embedding dimension, not the
  * corpus, the same license as the PQ codebook collects. The
  * alternative declarative plan (posexplode twice → groupBy (i, j))
  * shuffles the same 4 096 aggregates but pays a hash probe per
  * (i, j) pair per row — measured slower at every scale, and its
  * explode blows the row count through whole-stage codegen.
  *
  * Reference anchor: DPF's embedding tooling computes moments with
  * single-node numpy; this is the distributed re-expression.
  */
object Spectral {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Embedding dimension of the `embeddings` table (TESTDATA.md). */
  val Dim = 64

  /** Power-iteration steps for the dominant eigenvector — enough for
    * a clearly-separated top eigenvalue (the labeled-cluster synthetic
    * corpus has one); both engines run the SAME arithmetic from the
    * same start vector, so the result is deterministic cross-engine
    * to far below the 6-dp gate. */
  val PowerIters = 8

  private def gramRow(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.fanOut(t(spark, dir, "embeddings")
      .select(col("embedding").cast("array<double>").as("v")))
    e.agg(GraftFunctions.vectorGram(col("v"), Dim).as("g"))
  }

  /** Full d×d second-moment + covariance audit: one row per (i, j)
    * with the raw product sum and the centered covariance. */
  def embedGram(spark: SparkSession, dir: String): DataFrame =
    gramRow(spark, dir)
      .select(col("g.n").as("n"), col("g.sums").as("s"),
        posexplode(col("g.prods")).as(Seq("idx", "m2raw")))
      .select(
        expr(s"CAST(idx DIV $Dim AS BIGINT)").as("i"),
        expr(s"CAST(idx % $Dim AS BIGINT)").as("j"),
        col("n"), col("s"), col("m2raw"))
      .select(col("i"), col("j"),
        r6(col("m2raw")).as("m2"),
        r6(col("m2raw") / col("n") -
          (element_at(col("s"), col("i").cast("int") + 1) / col("n")) *
            (element_at(col("s"), col("j").cast("int") + 1) / col("n")))
          .as("cov"))

  /** Shared oracle CTE chain: raw moments + centered covariance in
    * DuckDB, mirroring the aggregate's arithmetic. MATERIALIZED:
    * DuckDB inlines CTEs by default, and the power-iteration chain
    * below references each step more than once — inlined, the
    * corpus-sized moment scan would re-evaluate exponentially. The
    * null filter mirrors vector_gram's null-skip so `n` counts the
    * same rows in both engines. */
  private val sqlMoments: String =
    s"""e AS MATERIALIZED (SELECT embedding::DOUBLE[] AS v FROM embeddings
           WHERE embedding IS NOT NULL),
       nn AS (SELECT count(*)::BIGINT AS n FROM e),
       dims AS (SELECT i.range::BIGINT AS i, j.range::BIGINT AS j
                FROM range($Dim) AS i, range($Dim) AS j),
       m AS (SELECT i, j, sum(v[i + 1] * v[j + 1]) AS m2
             FROM e CROSS JOIN dims GROUP BY i, j),
       s AS (SELECT r.range::BIGINT AS i, sum(v[r.range + 1]) AS si
             FROM e CROSS JOIN range($Dim) AS r GROUP BY 1),
       cov AS MATERIALIZED (SELECT m.i, m.j,
                 m.m2 / nn.n - (sa.si / nn.n) * (sb.si / nn.n) AS c,
                 m.m2 AS m2
               FROM m, nn, s sa, s sb
               WHERE sa.i = m.i AND sb.i = m.j)"""

  val embedGramSql: String =
    s"""WITH $sqlMoments
       SELECT i, j, ${sqlR("m2", 6)} AS m2, ${sqlR("c", 6)} AS cov
       FROM cov"""

  /** Dominant principal component by power iteration: the gram
    * aggregate reduces the corpus to one O(d²) row, the driver runs
    * [[PowerIters]] mat-vec + normalize steps on the 64×64 covariance
    * (collect bounded by DIMENSION, not corpus — the PQ-codebook
    * license), and the result is re-submitted as a 64-row DataFrame so
    * the rounding runs through the engine's own `round`. Output:
    * per-dim component, the Rayleigh-quotient eigenvalue, and the
    * variance-explained ratio (eigval / trace). */
  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    val row = gramRow(spark, dir)
      .select(col("g.n"), col("g.sums"), col("g.prods")).head()
    val n = row.getLong(0)
    require(n > 0, "pca_power: empty embeddings corpus")
    val s = row.getSeq[Double](1).toArray
    val p = row.getSeq[Double](2).toArray
    val cov = Array.tabulate(Dim, Dim) { (i, j) =>
      p(i * Dim + j) / n - (s(i) / n) * (s(j) / n)
    }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(Dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < Dim) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
    var v = Array.fill(Dim)(1.0 / math.sqrt(Dim.toDouble))
    var it = 0
    while (it < PowerIters) {
      val w = matvec(v)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
      it += 1
    }
    val w = matvec(v)
    val eig = v.zip(w).map { case (a, b) => a * b }.sum
    val trace = (0 until Dim).map(i => cov(i)(i)).sum
    val rows = (0 until Dim).map { i =>
      Row(i.toLong, v(i), eig, eig / trace)
    }
    val schema = StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("raw_component", DoubleType, nullable = false),
      StructField("raw_eigval", DoubleType, nullable = false),
      StructField("raw_ve", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .select(col("i"),
        r6(col("raw_component")).as("component"),
        r6(col("raw_eigval")).as("eigval"),
        r6(col("raw_ve")).as("var_explained"))
  }

  val pcaPowerSql: String = {
    val iters = (1 to PowerIters).map { k =>
      s"""w$k AS MATERIALIZED (SELECT cov.i AS i, sum(cov.c * v${k - 1}.x) AS x
            FROM cov JOIN v${k - 1} ON cov.j = v${k - 1}.i GROUP BY 1),
         v$k AS MATERIALIZED (SELECT i,
            x / (SELECT sqrt(sum(x * x)) FROM w$k) AS x FROM w$k)"""
    }.mkString(",\n")
    s"""WITH $sqlMoments,
       v0 AS (SELECT r.range::BIGINT AS i,
                1.0 / sqrt(${Dim}.0) AS x FROM range($Dim) AS r),
       $iters,
       wr AS (SELECT cov.i AS i, sum(cov.c * v$PowerIters.x) AS x
              FROM cov JOIN v$PowerIters ON cov.j = v$PowerIters.i
              GROUP BY 1),
       eig AS (SELECT sum(v$PowerIters.x * wr.x) AS ev
               FROM v$PowerIters JOIN wr ON v$PowerIters.i = wr.i),
       tr AS (SELECT sum(c) AS t FROM cov WHERE i = j)
       SELECT v$PowerIters.i AS i,
         ${sqlR(s"v$PowerIters.x", 6)} AS component,
         ${sqlR("eig.ev", 6)} AS eigval,
         ${sqlR("eig.ev / tr.t", 6)} AS var_explained
       FROM v$PowerIters, eig, tr"""
  }

  /** MAD-fence multiplier for [[vectorNorms]] (the Hampel 3σ-robust
    * convention, same as TimeSeries.eventsAnomaly). */
  val NormFenceK = 3L

  /** Embedding-norm hygiene: the distributional screen every encoder
    * feed needs — a vector whose L2 norm sits far outside the
    * corpus's robust band is a broken row (truncated write, zeroed
    * buffer, fp overflow), and norm drift is the cheapest encoder
    * regression signal. Reports the robust center (median), spread
    * (MAD), and the outlier census outside median ± 3·MAD.
    *
    * Scale shape: ONE corpus pass quantizes each norm to an integer
    * milli-grid and histograms it (map-side combined; the grid is
    * value-bounded, and a loud guard fails the job past 2²⁰ bins —
    * the Quantiles license made explicit); median, the
    * absolute-deviation histogram, MAD, and both outlier counts all
    * derive from that histogram — bounded windows, zero further
    * corpus passes. Integer milli-units end to end, so the fence
    * arithmetic is exact cross-engine. */
  def vectorNorms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(spark)
    // dot_product returns NULL on a null ELEMENT (a truncated/corrupt
    // write — exactly the breakage this screen hunts), so those rows
    // land in the histogram's NULL bin: counted as n_bad, excluded
    // from the stats. The SQL mirror detects element nulls explicitly
    // (DuckDB's list_sum would silently skip them).
    val nm = Tables.fanOut(t(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>").as("v")))
      .select((round(
        sqrt(org.apache.spark.sql.functions.call_function(
          "dot_product", col("v"), col("v"))) * 1000.0 + lit(Num.Eps), 0))
        .cast("long").as("nm"))
    val allHist = nm.groupBy(col("nm")).agg(count(lit(1)).as("n"))
      .persist() // one corpus pass; consumed by stats + bad census
    val badRow = allHist.filter(col("nm").isNull)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_bad"))
    val hist = allHist.filter(col("nm").isNotNull)
    val byV = Window.orderBy(col("nm"))
    val full = byV.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // hand-rolled rather than Quantiles.exactQuantiles ONLY because
    // both medians here must derive from one already-built histogram
    // (exactQuantiles takes the raw frame and would re-scan the
    // corpus per call); same guard bound, same ceil-rank rule
    val maxBins = graft.operators.Quantiles.DefaultMaxBins
    val guarded = hist
      .withColumn("nbins", count(lit(1)).over(full))
      .withColumn("nm", when(col("nbins") > maxBins,
        raise_error(lit("vector_norms: norm histogram exceeds " +
          s"$maxBins bins — quantize coarser"))).otherwise(col("nm")))
      .withColumn("cum", sum(col("n")).over(
        byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(full))
    val med = guarded
      .agg(min(when(col("cum") >= expr("(total + 1) div 2"), col("nm")))
        .as("med"), max(col("total")).as("ntot"))
    val withMed = hist.crossJoin(broadcast(med))
    val devHist = withMed
      .groupBy(abs(col("nm") - col("med")).as("ad"))
      .agg(sum(col("n")).as("dn"))
    val byAd = Window.orderBy(col("ad"))
    // MAD via the same ceil-rank rule as the median
    val madRow = devHist
      .withColumn("tt", sum(col("dn")).over(
        byAd.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("cum", sum(col("dn")).over(
        byAd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(min(when(col("cum") >= expr("(tt + 1) div 2"), col("ad")))
        .as("mad"))
    // global agg first (ONE row even over an empty histogram), THEN
    // attach the bad census — crossJoining badRow before aggregating
    // would lose n_bad on an all-bad corpus (empty × 1 row = empty)
    val statsRow = withMed.crossJoin(broadcast(madRow))
      .agg(coalesce(max(col("ntot")), lit(0L)).as("n"),
        max(col("med")).as("med_milli"),
        max(col("mad")).as("mad_milli"),
        coalesce(sum(when(
          col("nm") < col("med") - lit(NormFenceK) * col("mad"),
          col("n")).otherwise(0L)).cast("long"), lit(0L)).as("n_low"),
        coalesce(sum(when(
          col("nm") > col("med") + lit(NormFenceK) * col("mad"),
          col("n")).otherwise(0L)).cast("long"), lit(0L)).as("n_high"))
    statsRow.crossJoin(broadcast(badRow))
      .select(col("n"), col("med_milli"), col("mad_milli"),
        col("n_low"), col("n_high"), col("n_bad").cast("long").as("n_bad"))
  }

  val vectorNormsSql: String =
    s"""WITH nm AS MATERIALIZED (SELECT CASE
           WHEN len(list_filter(embedding, x -> x IS NULL)) > 0 THEN NULL
           ELSE CAST(round(
             sqrt(coalesce(list_sum(list_transform(embedding::DOUBLE[],
               x -> x * x)), 0)) * 1000.0 + ${Num.Eps}, 0) AS BIGINT)
           END AS nm
         FROM embeddings WHERE embedding IS NOT NULL),
       bad AS (SELECT count(*)::BIGINT AS n_bad FROM nm WHERE nm IS NULL),
       h AS MATERIALIZED (SELECT nm, count(*)::BIGINT AS n
            FROM nm WHERE nm IS NOT NULL GROUP BY 1),
       c AS (SELECT nm, n,
               sum(n) OVER (ORDER BY nm
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(n) OVER () AS total FROM h),
       med AS (SELECT min(CASE WHEN cum >= (total + 1) // 2
                 THEN nm END) AS med,
               coalesce(max(total), 0)::BIGINT AS ntot FROM c),
       dh AS MATERIALIZED (SELECT abs(h.nm - med.med) AS ad,
               sum(h.n)::BIGINT AS dn FROM h, med GROUP BY 1),
       dc AS (SELECT ad, dn,
               sum(dn) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(dn) OVER () AS tt FROM dh),
       mad AS (SELECT min(CASE WHEN cum >= (tt + 1) // 2
                 THEN ad END) AS mad FROM dc)
       SELECT med.ntot AS n, med.med AS med_milli, mad.mad AS mad_milli,
         (SELECT coalesce(sum(n), 0)::BIGINT FROM h, med, mad
            WHERE nm < med.med - $NormFenceK * mad.mad) AS n_low,
         (SELECT coalesce(sum(n), 0)::BIGINT FROM h, med, mad
            WHERE nm > med.med + $NormFenceK * mad.mad) AS n_high,
         bad.n_bad AS n_bad
       FROM med, mad, bad"""

  val queries: Map[String, Q] = Map(
    "q_embed_gram" -> (embedGram _),
    "q_pca_power" -> (pcaPower _),
    "q_vector_norms" -> (vectorNorms _),
  )

  val oracles: Map[String, String] = Map(
    "q_embed_gram" -> embedGramSql,
    "q_pca_power" -> pcaPowerSql,
    "q_vector_norms" -> vectorNormsSql,
  )
}
