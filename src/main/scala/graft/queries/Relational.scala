package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.GroupTopK
import graft.queries.Num.{r2, r4, r6, sqlR}

/** Relational operator catalog (SURVEY.md §2.2–2.5): each entry is one
  * operator from the reference's inventory re-expressed Spark-first,
  * paired with ANSI SQL in [[Relational.oracles]] for the DuckDB gate.
  *
  * Determinism rules (driver hashes sorted values):
  *  - every query returns a deterministic row SET (total tie-break
  *    orders under any limit/rank);
  *  - double aggregates are rounded;
  *  - timestamps are compared as-is under session UTC.
  *
  * Scale notes are inline per query — the plans are written for the
  * 100 TB case (pushdown-friendly predicates, broadcast only
  * fixed-cardinality dims, partial aggregation everywhere).
  */
object Relational {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Predicate filter + projection (processor.filter_df,
    * DPF/processors/processor.py:322-333). Filter and the 4-column
    * projection both reach the parquet scan (PushedFilters/ReadSchema). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        r2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))

  /** Group-by aggregation with partial (map-side) combine — the
    * print_summary/describe family (processor.py:66-99). TPC-H Q1
    * shape: one shuffle on the 2 low-cardinality keys. */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("sum_revenue"),
        r4(avg(col("l_quantity"))).as("avg_qty"))

  /** Enrichment merge: left equi-join of the metadata table with a
    * filter-result table on the key column (processor.py:190-197).
    * The enrich side is pre-filtered so only needed rows shuffle;
    * at scale Catalyst/AQE picks broadcast when the right side fits. */
  def joinEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").filter(col("l_quantity") > 48)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val p = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    li.join(p, li("l_partkey") === p("p_partkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
        col("p_retailprice"))
  }

  /** Multi-way star join + agg: revenue per region. region/nation are
    * fixed-cardinality → explicit broadcast; customer/orders/lineitem
    * shuffle on their keys (sort-merge or AQE-chosen).
    *
    * Partial-aggregation pushdown BELOW the fact join: orders⋈lineitem
    * is 1:N and the final aggregate only needs lineitem summed, so
    * lineitem pre-aggregates per orderkey first — the big join then
    * matches |orders| rows instead of |lineitem|. On randomly-ordered
    * local data the gain is modest (~20% at 10×: map-side combine
    * finds few co-located lines per order); when the fact table is
    * clustered by order — the layout a 100 TB pipeline maintains —
    * the combine collapses the shuffle to one row per order before
    * any join. Catalyst does not perform this rewrite itself; the
    * result is identical because sum/count distribute over the 1:N
    * join. */
  def joinStar(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("rev")).as("o_rev"), count(lit(1)).as("o_items"))
    val o  = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val c  = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n  = t(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val r  = t(spark, dir, "region").select("r_regionkey", "r_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(r2(sum(col("o_rev"))).as("revenue"),
        sum(col("o_items")).cast("long").as("n_items"))
  }

  /** Left-semi join (EXISTS): customers having a high-value order. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
      .select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value order
    * (the all-orders variant is empty on this data — a predicate on
    * the right side keeps the check meaningful). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 150000)
      .select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  /** Duplicate detection: groupBy(key).count > N
    * (validators/utils.py:6-9; sharded_validator.py:42-47). */
  def dupDetect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 3)

  /** Distinct values of a column (shards_processor.py:55-58). */
  def distinctValues(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_mktsegment")).distinct()

  /** Deterministic keep-first dedup: row_number over a total order
    * within each key partition (pipeline_stages.py:50-60 /
    * the README `duplicated()` idiom). One shuffle on the dedup key. */
  def dedupFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_partkey", "l_orderkey", "l_linenumber")
  }

  /** Top-k per group with total tie-break (rank family). Routed
    * through [[graft.operators.GroupTopK]] — row_number-identical
    * output, but the exchange carries bounded per-partition heaps
    * (groups·k rows per task) instead of every order in the group's
    * window partition. */
  def windowTopK(spark: SparkSession, dir: String): DataFrame =
    GroupTopK.topK(
      t(spark, dir, "orders")
        .select("o_orderpriority", "o_totalprice", "o_orderkey"),
      Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))

  /** Running (cumulative) aggregate per key — the ordered-window
    * analytics shape. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        r2(sum(col("o_totalprice")).over(w)).as("running_total"))
  }

  /** Global sort + limit under a total order (head/limit, §2.5).
    * TakeOrderedAndProject — no full sort at scale. */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Union/concat with dedup (pd.concat + drop_duplicates shape,
    * dataset_reader.py:125-130). */
  def unionSegments(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING")
    val b = c.filter(col("c_acctbal") > 9000)
    a.unionByName(b).select("c_custkey", "c_name").distinct()
  }

  /** Deterministic sample: hash-free modulo on the key — the
    * reproducible re-spec of processor.random_sample
    * (processor.py:295-320; SURVEY §7.4 risk 7). */
  def sampleDeterministic(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 20 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity")

  /** describe()-style summary statistics incl. exact percentiles
    * (processor.print_summary, processor.py:66-99). */
  def summaryStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      count(lit(1)).as("cnt"),
      r4(avg(col("l_quantity"))).as("mean_qty"),
      r4(stddev_samp(col("l_quantity"))).as("std_qty"),
      r2(min(col("l_quantity"))).as("min_qty"),
      r4(expr("percentile(l_quantity, 0.25)")).as("q25"),
      r4(expr("percentile(l_quantity, 0.5)")).as("q50"),
      r4(expr("percentile(l_quantity, 0.75)")).as("q75"),
      r2(max(col("l_quantity"))).as("max_qty"))

  /** Shard-split assignment: deterministic bucketing of rows into N
    * shards (np.array_split / group-by-split analog,
    * multigpu_filter.py:103). pmod keeps it engine-portable. */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("shard_id", pmod(col("o_orderkey"), lit(8)).cast("int"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        r2(sum(col("o_totalprice"))).as("shard_price"))

  /** Hierarchical subtotals via ROLLUP (priority → status → grand
    * total): one pass, Spark expands grouping sets map-side — the
    * OLAP reporting shape over the same shuffle as a plain groupBy. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        r2(sum(col("o_totalprice"))).as("total_price"))

  /** Orders above their customer's (rounded) average — the
    * correlated-aggregate shape as a self-join against a grouped
    * aggregate. The threshold is epsilon-rounded BEFORE the
    * comparison: an unrounded float threshold would make boundary
    * rows engine-dependent (summation order differs). */
  def aboveCustAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val avgs = o.groupBy(col("o_custkey"))
      .agg(r2(avg(col("o_totalprice"))).as("cust_avg"))
    o.join(avgs, Seq("o_custkey"))
      .filter(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("cust_avg"))
  }

  /** TPC-H Q3 shape through the SQL interface: temp views +
    * `spark.sql` — the same Catalyst plan as the DataFrame API, shown
    * here because the engine's SQL surface is part of the contract. */
  def sqlShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("g_customer")
    t(spark, dir, "orders").createOrReplaceTempView("g_orders")
    t(spark, dir, "lineitem").createOrReplaceTempView("g_lineitem")
    spark.sql(
      s"""SELECT l.l_orderkey AS o_key,
            round(sum(l.l_extendedprice * (1.0 - l.l_discount)) + 1e-9, 2)
              AS revenue,
            o.o_orderpriority
          FROM g_customer c
          JOIN g_orders o ON c.c_custkey = o.o_custkey
          JOIN g_lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE c.c_mktsegment = 'BUILDING'
          GROUP BY l.l_orderkey, o.o_orderpriority
          HAVING sum(l.l_quantity) > 200""")
  }

  /** The Q3 shape with the aggregation pushed BELOW the join — the
    * scale twin of [[sqlShippingPriority]]: lineitem pre-aggregates
    * per orderkey (map-side combine collapses 600M rows to ≤150M
    * narrow (rev, qty) rows BEFORE anything joins) and the HAVING
    * filter applies pre-join too, so the join sides are a filtered
    * aggregate and segment-filtered orders instead of two raw fact
    * tables. Same rows out — the per-order revenue/quantity sums
    * range over every lineitem of the order in both shapes; Catalyst
    * does not push aggregates through joins on its own, so this
    * rewrite is the operator. 1000× (600M lineitem): 203 s as written
    * in SQL vs ~60 s pre-aggregated, identical results (shared
    * oracle). */
  def shippingPriorityPreAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"),
        sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 200)
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("o_key"), col("revenue"),
        col("o_orderpriority"))
  }

  /** Typed-Aggregator UDAF: quantity-weighted mean price per return
    * flag ([[graft.functions.WeightedMean]] through functions.udaf). */
  def weightedAvgPrice(spark: SparkSession, dir: String): DataFrame = {
    val wm = udaf(graft.functions.WeightedMean)
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(r2(wm(col("l_extendedprice"), col("l_quantity")))
        .as("weighted_avg_price"))
  }

  /** CUBE over two dimensions: all four grouping sets in one pass. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        r2(sum(col("l_quantity"))).as("sum_qty"))

  /** EXCEPT set op: building-segment customers minus those holding a
    * high-value order. */
  def exceptSegments(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val highValue = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000).select("o_custkey")
      .withColumnRenamed("o_custkey", "c_custkey")
    building.exceptAll(highValue.distinct()).distinct()
  }

  /** Seeded full-table shuffle (pipeline_stages.py:27-34): the row
    * SET is order-invariantly oracle-checkable — the check proves the
    * op is a permutation, seeds make reruns reproducible. */
  def shuffleRows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .orderBy(rand(42L))
      .select("c_custkey", "c_name", "c_acctbal")

  /** Per-group exact percentiles (describe() per key — the grouped
    * flavor of summary stats), on the scale-safe histogram plan.
    *
    * Spark's exact `percentile()` buffers a per-group value→count
    * map sized by DISTINCT PRICES — corpus-sized at 100×. Money is
    * cent-quantized, so the [[graft.operators.Quantiles]] license
    * applies: one map-side-combined groupBy(group, cents).count()
    * shrinks the data to a histogram bounded by the VALUE RANGE
    * (≤ ~5·10⁷ cells forever, whatever the row count), a per-group
    * cumsum window runs over histogram rows only, and the continuous
    * (type-7) interpolation h = (N−1)·q is reproduced with integer
    * rank arithmetic over the cumulative counts — bit-parity with
    * DuckDB's `quantile_cont` through the shared r4 convention
    * (interpolated cents at q∈{5/10, 9/10} carry ≤3 decimals, so
    * 4-decimal rounding is exact on both engines). */
  def groupPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val hist = t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("c"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // continuous quantile at q = num/den: h = (total−1)·q lands
    // between 1-based order statistics k1 = ⌊h⌋+1 and k1+1 with
    // fractional weight rem/den, rem = (total−1)·num mod den; the
    // k-th order statistic is the first histogram value whose
    // cumulative count reaches k.
    def parts(num: Int, den: Int, name: String) = Seq(
      min(when(col("cum") >=
        expr(s"((total - 1) * $num) div $den + 1"), col("c")))
        .as(s"${name}_lo"),
      min(when(col("cum") >=
        expr(s"((total - 1) * $num) div $den + 2"), col("c")))
        .as(s"${name}_hi"),
      max(expr(s"((total - 1) * $num) % $den")).as(s"${name}_rem"))
    val aggs = Seq(sum(col("cnt")).as("n")) ++
      parts(5, 10, "q50") ++ parts(9, 10, "q90") ++
      Seq(max(col("c")).as("mxc"))
    def interp(name: String, den: Int) = r4(
      (col(s"${name}_lo") +
        col(s"${name}_rem") / lit(den.toDouble) *
          (coalesce(col(s"${name}_hi"), col(s"${name}_lo")) -
            col(s"${name}_lo"))) / lit(100.0))
    cum.groupBy(col("o_orderpriority"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("o_orderpriority"), col("n"),
        interp("q50", 10).as("p50"),
        interp("q90", 10).as("p90"),
        r2(col("mxc") / lit(100.0)).as("mx"))
  }

  /** Arbitrary GROUPING SETS (not a rollup/cube prefix): Spark 4's
    * Dataset groupingSets API expands all sets in the same single
    * shuffle as a plain groupBy — one pass over orders regardless of
    * how many set combinations are requested. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        r2(sum(col("o_totalprice"))).as("total_price"))

  /** Non-equi band join: orders against a small OVERLAPPING price-band
    * dimension (each order lands in up to two bands, so this cannot
    * degrade to a bucketing expression). The band table is broadcast —
    * BroadcastNestedLoopJoin streams orders once with no shuffle; at
    * 100 TB the probe side stays partition-local. */
  def rangeJoinBands(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(12).select(
      col("id").as("band_id"),
      (col("id") * 50000.0).as("lo"),
      (col("id") * 50000.0 + 100000.0).as("hi"))
    t(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_orders"),
        r2(sum(col("o_totalprice"))).as("band_price"))
  }

  /** INTERSECT set op: building-segment customers who also hold a
    * high-value order (the dual of [[exceptSegments]]). */
  def intersectSegments(spark: SparkSession, dir: String): DataFrame = {
    val building = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val highValue = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000).select("o_custkey")
      .withColumnRenamed("o_custkey", "c_custkey")
    building.intersect(highValue)
  }

  /** Salted skew join ([[graft.operators.SkewJoin.saltedJoin]]): the
    * hash gate proves salting is semantics-neutral — the salted plan
    * must produce EXACTLY the plain join's rows. Aggregated by nation
    * so the output stays small; at scale the operator spreads one hot
    * supplier key across `factor` reducers where AQE's skew split
    * cannot reach (cached inputs, LSH self-joins). */
  def skewJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select(col("l_suppkey").as("suppkey"),
        col("l_extendedprice").as("price"))
    val s = t(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.operators.SkewJoin.saltedJoin(li, s, "suppkey", factor = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), r2(sum(col("price"))).as("revenue"))
  }

  /** Quantile-threshold keep-mass audit
    * ([[graft.operators.Quantiles.keepAboveQuantile]]): rows at/above
    * the global 10th-percentile value band, counted per priority.
    * The value is pre-quantized to 1000-unit bands (the operator's
    * bounded-histogram license). */
  def keepAboveQuantile(spark: SparkSession, dir: String): DataFrame = {
    val v = t(spark, dir, "orders")
      .select(floor(col("o_totalprice") / 1000).cast("long").as("band"),
        col("o_orderpriority"))
    graft.operators.Quantiles
      .keepAboveQuantile(v, "band", "o_orderpriority", 1, 10)
  }

  /** Exact decile buckets without a per-partition sort
    * ([[graft.operators.Quantiles.ntileBuckets]]) — quantity has a
    * ~50-value domain, so the histogram plan's serial step is O(50)
    * regardless of corpus size; the oracle keeps the literal ntile
    * window. */
  def ntileDeciles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles
      .ntileBuckets(t(spark, dir, "lineitem"), "l_quantity", 10,
        Seq("l_returnflag"))
      .select(col("l_returnflag"), col("tile"), col("n_rows"),
        r2(col("lo")).as("lo"), r2(col("hi")).as("hi"))

  /** Edit-distance similarity self-join over the distinct part-name
    * vocabulary ([[graft.operators.FuzzyJoin]] — PassJoin segment
    * pruning: k+1 position-aligned segments joined against ±k-shift
    * substrings, unsegmentable-short exact branch, levenshtein
    * verify on candidates only). The oracle is the UNPRUNED exact
    * all-pairs join, so the driver's hash gate doubles as the
    * pruning-losslessness proof (allpairs_cosine / bloom-decontam
    * pattern). k=2 with the sf part names (lengths 7–12) exercises
    * segments down to the 2-char minimum. */
  def fuzzyJoinParts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin
      .editDistancePairs(t(spark, dir, "part"), "p_name", maxDist = 2)

  /** Schema-wide data profile — the first query anyone runs against
    * an unknown 100 TB table: per column, null count, exact distinct
    * count, and (for numerics) min/max. One corpus pass: all
    * per-column aggregates ride a single agg (Spark plans the
    * multi-column distinct set via one Expand — C copies of the scan
    * rows in ONE shuffle, not C passes over the table), and the
    * 1-row result unpivots to per-column rows via stack(), never
    * touching the driver. Distinct from [[summaryStats]] (numeric
    * describe): this is the nulls/cardinality census over EVERY
    * column including strings and timestamps.
    *
    * Scale note: exact per-column distincts are the oracle-gated
    * semantics; at 100 TB a profiler flips high-cardinality columns
    * to approx_count_distinct (the HLL register machinery in
    * [[graft.operators.HllSketch]] is the in-repo form) — the plan
    * shape is otherwise identical. */
  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "lineitem")
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        f.name
    }.toSet
    // One TWO-LEVEL aggregation branch per column, unioned into one
    // job — NOT one agg with N countDistincts: the multi-distinct
    // plan Expands every row N+1 times and hash-aggregates the
    // replicas under an N+1-column composite key (measured 12× the
    // input rows through the widest HashAggregate). Per column,
    // groupBy(value) with map-side partial aggregation reduces the
    // scan to its distinct values BEFORE the exchange, each branch
    // scans exactly one parquet column (ReadSchema = that column),
    // and the final fold is group-count-sized:
    //   n_distinct = groups with a non-null key (countDistinct
    //   semantics), n_nulls = the null group's row count, vmin/vmax =
    //   min/max over group keys (nulls ignored).
    val branches = df.schema.fields.map { f =>
      val c = col(f.name)
      val (mn, mx) =
        if (numeric(f.name))
          (r6(min(c).cast("double")), r6(max(c).cast("double")))
        else (lit(null).cast("double"), lit(null).cast("double"))
      df.select(c)
        .groupBy(c).agg(count(lit(1)).as("_cnt"))
        .agg(
          sum(when(c.isNull, col("_cnt")).otherwise(0L)).as("n_nulls"),
          count(when(c.isNotNull, 1)).as("n_distinct"),
          mn.as("vmin"), mx.as("vmax"))
        .select(lit(f.name).as("col_name"), col("n_nulls"),
          col("n_distinct"), col("vmin"), col("vmax"))
    }
    branches.reduce(_.unionByName(_))
  }

  val dataProfileSql: String = {
    val numeric = Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    cols.map { c =>
      val (mn, mx) =
        if (numeric(c)) (sqlR(s"min($c)::DOUBLE", 6), sqlR(s"max($c)::DOUBLE", 6))
        else ("NULL::DOUBLE", "NULL::DOUBLE")
      s"""SELECT '$c' AS col_name,
         sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
         count(DISTINCT $c)::BIGINT AS n_distinct,
         $mn AS vmin, $mx AS vmax FROM lineitem"""
    }.mkString("\nUNION ALL\n")
  }

  /** FULL OUTER referential-integrity audit — the orphan census run
    * before trusting a foreign key at 100 TB (keys on one side only
    * are exactly what inner joins silently drop). The scale move:
    * orders pre-aggregate to one row per key BEFORE the full-outer
    * join, so the join is key-cardinality-sized on both sides and
    * the orphan classes come out of the same pass as the per-class
    * volume. */
  def joinFullAudit(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val cust = t(spark, dir, "customer").select(col("c_custkey"))
    perCust.join(cust, col("o_custkey") === col("c_custkey"),
        "full_outer")
      .select(
        when(col("o_custkey").isNull, "customer_only")
          .when(col("c_custkey").isNull, "orders_only")
          .otherwise("matched").as("side"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_orders")).cast("long").as("sum_orders"))
  }

  val joinFullAuditSql: String =
    """WITH po AS (SELECT o_custkey, count(*)::BIGINT AS n_orders
         FROM orders GROUP BY 1)
       SELECT CASE WHEN po.o_custkey IS NULL THEN 'customer_only'
                   WHEN c.c_custkey IS NULL THEN 'orders_only'
                   ELSE 'matched' END AS side,
         count(*)::BIGINT AS n_keys,
         CAST(sum(coalesce(po.n_orders, 0)) AS BIGINT) AS sum_orders
       FROM po FULL OUTER JOIN customer c ON po.o_custkey = c.c_custkey
       GROUP BY 1"""

  /** Hot keys reported by [[joinProfile]]. */
  val ProfileTopKeys = 20

  /** Join cardinality / skew profiler — the pre-flight a 100 TB
    * self-join needs BEFORE running: per join key, the per-side row
    * counts and the estimated output pairs (n², since both sides are
    * the events table keyed on user_id), plus each key's share of
    * the total estimated output. A key carrying a dominant share is
    * the one to salt ([[graft.operators.SkewJoin]]) — this query IS
    * the "hot-key profile" input that operator consumes, exposed as
    * a catalog audit.
    *
    * Scale shape: one map-side-combined count per key (the only
    * corpus pass), then everything is key-cardinality-sized; the
    * top-20 election runs on [[GroupTopK]] heaps (single group —
    * bounded exchange), and the total is a broadcast scalar. */
  def joinProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("est_pairs", col("n") * col("n"))
    val tot = counts.agg(sum(col("est_pairs")).as("tp"))
    val top = GroupTopK.topK(
      counts.select(lit(1L).as("g"), col("est_pairs"), col("user_id"),
        col("n")),
      Seq("g"), Seq(("est_pairs", true), ("user_id", false)),
      ProfileTopKeys)
    top.crossJoin(broadcast(tot))
      .select(col("rk").cast("long").as("rk"), col("user_id"),
        col("n"), col("est_pairs"),
        r6(col("est_pairs").cast("double") / col("tp")).as("share"))
  }

  val joinProfileSql: String =
    s"""WITH c AS (SELECT user_id, count(*)::BIGINT AS n,
           (count(*) * count(*))::BIGINT AS est_pairs
         FROM events GROUP BY 1),
       tt AS (SELECT sum(est_pairs)::BIGINT AS tp FROM c),
       r AS (SELECT user_id, n, est_pairs, row_number() OVER (
               ORDER BY est_pairs DESC, user_id)::BIGINT AS rk FROM c)
       SELECT rk, user_id, n, est_pairs,
         ${sqlR("est_pairs::DOUBLE / tp", 6)} AS share
       FROM r, tt WHERE rk <= $ProfileTopKeys"""

  val queries: Map[String, Q] = Map(
    "q_join_profile" -> (joinProfile _),
    "q_join_full" -> (joinFullAudit _),
    "q_data_profile" -> (dataProfile _),
    "q_fuzzy_join" -> (fuzzyJoinParts _),
    "q_skew_join" -> (skewJoinAgg _),
    "q_keep_above_quantile" -> (keepAboveQuantile _),
    "q_ntile_deciles" -> (ntileDeciles _),
    "q_grouping_sets" -> (groupingSetsAgg _),
    "q_range_join" -> (rangeJoinBands _),
    "q_intersect" -> (intersectSegments _),
    "q_shuffle" -> (shuffleRows _),
    "q_group_percentiles" -> (groupPercentiles _),
    "q_cube" -> (cubeAgg _),
    "q_except" -> (exceptSegments _),
    "q_sql_shipping_priority" -> (sqlShippingPriority _),
    "q_shipping_priority_preagg" -> (shippingPriorityPreAgg _),
    "q_weighted_avg_price" -> (weightedAvgPrice _),
    "q_above_cust_avg" -> (aboveCustAvg _),
    "q_rollup" -> (rollupAgg _),
    "q_filter_project" -> (filterProject _),
    "q_agg_pricing" -> (aggPricing _),
    "q_join_enrich" -> (joinEnrich _),
    "q_join_star" -> (joinStar _),
    "q_join_semi" -> (joinSemi _),
    "q_join_anti" -> (joinAnti _),
    "q_dup_detect" -> (dupDetect _),
    "q_distinct" -> (distinctValues _),
    "q_dedup_first" -> (dedupFirst _),
    "q_window_topk" -> (windowTopK _),
    "q_window_running" -> (windowRunning _),
    "q_sort_limit" -> (sortLimit _),
    "q_union" -> (unionSegments _),
    "q_sample_deterministic" -> (sampleDeterministic _),
    "q_summary_stats" -> (summaryStats _),
    "q_shard_assign" -> (shardAssign _),
  )

  /** Q3-shape oracle, shared by the SQL-surface query and its
    * pre-aggregated twin (same result set by construction). */
  private val ShippingPrioritySql: String =
    """SELECT l.l_orderkey AS o_key,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)) + 1e-9, 2)
         AS revenue,
       o.o_orderpriority
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY l.l_orderkey, o.o_orderpriority
       HAVING sum(l.l_quantity) > 200"""

  val oracles: Map[String, String] = Map(
    "q_join_profile" -> joinProfileSql,
    "q_join_full" -> joinFullAuditSql,
    "q_data_profile" -> dataProfileSql,
    "q_fuzzy_join" ->
      """WITH d AS (SELECT DISTINCT p_name AS s FROM part)
         SELECT a.s AS name_a, b.s AS name_b,
           levenshtein(a.s, b.s)::BIGINT AS dist
         FROM d a JOIN d b ON a.s < b.s
         WHERE levenshtein(a.s, b.s) <= 2""",
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
         round((sum(o_totalprice)) + 1e-9, 2) AS total_price
         FROM orders GROUP BY GROUPING SETS
           ((o_orderpriority, o_orderstatus), (o_orderstatus), ())""",
    "q_range_join" ->
      """SELECT b.band_id, count(*) AS n_orders,
         round((sum(o.o_totalprice)) + 1e-9, 2) AS band_price
         FROM orders o JOIN (
           SELECT range AS band_id, range * 50000.0 AS lo,
             range * 50000.0 + 100000.0 AS hi FROM range(12)) b
         ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
         GROUP BY b.band_id""",
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders
         WHERE o_totalprice > 300000""",
    "q_shuffle" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "q_group_percentiles" ->
      """SELECT o_orderpriority, count(*) AS n,
         round((quantile_cont(o_totalprice, 0.5)) + 1e-9, 4) AS p50,
         round((quantile_cont(o_totalprice, 0.9)) + 1e-9, 4) AS p90,
         round((max(o_totalprice)) + 1e-9, 2) AS mx
         FROM orders GROUP BY o_orderpriority""",
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
         round((sum(l_quantity)) + 1e-9, 2) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders
         WHERE o_totalprice > 300000""",
    "q_sql_shipping_priority" -> ShippingPrioritySql,
    // the pre-aggregated twin returns the SAME rows — one oracle text
    "q_shipping_priority_preagg" -> ShippingPrioritySql,
    "q_weighted_avg_price" ->
      """SELECT l_returnflag,
         round((sum(l_extendedprice * l_quantity) / sum(l_quantity)) + 1e-9, 2)
           AS weighted_avg_price
         FROM lineitem GROUP BY l_returnflag""",
    "q_above_cust_avg" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, a.cust_avg
         FROM orders o JOIN (
           SELECT o_custkey,
             round((avg(o_totalprice)) + 1e-9, 2) AS cust_avg
           FROM orders GROUP BY o_custkey) a
         ON o.o_custkey = a.o_custkey
         WHERE o.o_totalprice > a.cust_avg""",
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
         round((sum(o_totalprice)) + 1e-9, 2) AS total_price
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
         round((l_extendedprice * (1.0 - l_discount)) + 1e-9, 2) AS revenue
         FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""",
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         round((sum(l_quantity)) + 1e-9, 2) AS sum_qty,
         round((sum(l_extendedprice * (1.0 - l_discount))) + 1e-9, 2) AS sum_revenue,
         round((avg(l_quantity)) + 1e-9, 4) AS avg_qty
         FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q_join_enrich" ->
      """SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_retailprice
         FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_quantity > 48""",
    "q_join_star" ->
      """SELECT r.r_name,
         round((sum(l.l_extendedprice * (1.0 - l.l_discount))) + 1e-9, 2) AS revenue,
         count(*) AS n_items
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)""",
    "q_dup_detect" ->
      """SELECT l_partkey, l_suppkey, count(*) AS cnt FROM lineitem
         GROUP BY l_partkey, l_suppkey HAVING count(*) > 3""",
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer",
    "q_dedup_first" ->
      """SELECT l_partkey, l_orderkey, l_linenumber FROM (
           SELECT l_partkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn = 1""",
    "q_window_topk" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 3""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
         round((sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) + 1e-9, 2)
           AS running_total
         FROM orders WHERE o_custkey % 10 = 0""",
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_union" ->
      """SELECT DISTINCT c_custkey, c_name FROM (
           SELECT c_custkey, c_name FROM customer
             WHERE c_mktsegment = 'BUILDING'
           UNION ALL
           SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000)""",
    "q_sample_deterministic" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey % 20 = 0""",
    "q_summary_stats" ->
      """SELECT count(*) AS cnt,
         round((avg(l_quantity)) + 1e-9, 4) AS mean_qty,
         round((stddev_samp(l_quantity)) + 1e-9, 4) AS std_qty,
         round((min(l_quantity)) + 1e-9, 2) AS min_qty,
         round((quantile_cont(l_quantity, 0.25)) + 1e-9, 4) AS q25,
         round((quantile_cont(l_quantity, 0.5)) + 1e-9, 4) AS q50,
         round((quantile_cont(l_quantity, 0.75)) + 1e-9, 4) AS q75,
         round((max(l_quantity)) + 1e-9, 2) AS max_qty
         FROM lineitem""",
    "q_shard_assign" ->
      """SELECT CAST(o_orderkey % 8 AS INT) AS shard_id,
         count(*) AS n_rows, round((sum(o_totalprice)) + 1e-9, 2) AS shard_price
         FROM orders GROUP BY 1""",
    // plain join — salting must be invisible in the result
    "q_skew_join" ->
      """SELECT s.s_nationkey, count(*) AS n_items,
         round((sum(l.l_extendedprice)) + 1e-9, 2) AS revenue
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         WHERE l.l_quantity > 45
         GROUP BY s.s_nationkey""",
    // threshold = smallest band whose cumulative count reaches
    // ceil(N/10) — the operator's discrete-quantile definition
    "q_keep_above_quantile" ->
      """WITH v AS (SELECT CAST(floor(o_totalprice / 1000) AS BIGINT)
           AS band, o_orderpriority FROM orders),
         t AS (SELECT band AS threshold FROM v ORDER BY band
           LIMIT 1 OFFSET (SELECT (count(*) + 9) // 10 - 1 FROM v))
         SELECT o_orderpriority, threshold, count(*) AS n_rows,
           CAST(sum(CASE WHEN band >= threshold THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept
         FROM v, t GROUP BY o_orderpriority, threshold""",
    "q_ntile_deciles" ->
      """SELECT l_returnflag, tile, count(*) AS n_rows,
         round((min(v)) + 1e-9, 2) AS lo, round((max(v)) + 1e-9, 2) AS hi
         FROM (SELECT l_returnflag, l_quantity AS v,
                 ntile(10) OVER (PARTITION BY l_returnflag
                   ORDER BY l_quantity) AS tile
               FROM lineitem)
         GROUP BY l_returnflag, tile""",
  )
}
