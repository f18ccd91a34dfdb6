package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Num._

/** Graph analytics over graphs DERIVED from the event stream — the
  * iterative-linear-algebra family (the pairs→clusters closure in
  * [[graft.operators.ConnectedComponents]] is the other graph member;
  * this one is weighted and value-propagating rather than
  * partition-finding).
  *
  * The graph: items (the `k` field of events.props) are nodes; each
  * user's event sequence contributes a directed edge between
  * consecutively visited items, weighted by transition count — the
  * classic item-transition graph behind "importance" ranking of
  * catalog entries, content hubs, or crawl frontiers.
  *
  * Scale design (Pregel shape, no driver state): edges live
  * partitioned by src; one PageRank iteration is
  *   ranks ⋈ edges on src → per-edge contribution → groupBy dst
  * — a single shuffle keyed by node id, map-side combined. Rank state
  * is one long per node. Nothing is corpus-sized on the driver; the
  * only driver value is the iteration COUNT, fixed a priori.
  *
  * Determinism contract: ranks are integers in units of 1/[[PrScale]]
  * (the float mirror exists only in the last projection). Each
  * contribution is `(rank·w·17) div (20·wout)` — damping 0.85 as the
  * rational 17/20, truncating integer division — and integer sums are
  * order-independent, so the full rank state hash-gates exactly
  * (same discipline as the HLL register state / BPE merge tables).
  * Truncation loses ≤1 unit of mass per in-edge per round — at
  * [[PrScale]] = 10⁹ that is a 10⁻⁹-relative semantic choice both
  * engines implement identically, not an error term.
  *
  * Simplifications, pinned identically in the oracle: dangling-node
  * mass is NOT redistributed (it decays — ranks sum to < 1), and
  * self-loop transitions (consecutive events on the same item) count
  * as ordinary edges. Overflow guard: contributions need
  * rank·w·17 < 2⁶³ — with rank ≤ [[PrScale]] = 10⁹ that allows ~5·10⁸
  * transitions on a single edge before the scale constant must drop
  * a decade. */
object Graph {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  /** Fixed-point scale of the integer rank state. */
  val PrScale = 1000000000L
  /** Power-iteration count — fixed, matching the unrolled oracle. */
  val PrIters = 3

  /** (src, dst, w, wout) weighted edge list with out-weight attached:
    * consecutive items per user ordered by (ts, event_id) — the
    * event_id tiebreak makes simultaneous events deterministic. */
  private def transitionEdges(ks: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // persist BEFORE deriving out-weights: outW is an aggregate OF
    // edges, so without the cut the lead-window over the full event
    // stream runs twice (once per side of the self-join)
    val edges = ks
      .withColumn("dst", lead(col("k"), 1).over(wSeq))
      .filter(col("dst").isNotNull)
      .groupBy(col("k").as("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
      .persist()
    val outW = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    edges.join(outW, "src")
  }

  /** One synchronous PageRank step on the integer rank state. */
  private def prStep(e: DataFrame, nodes: DataFrame, nn: DataFrame,
      r: DataFrame): DataFrame = {
    val contrib = e.join(r.withColumnRenamed("item", "src"), "src")
      .select(col("dst").as("item"),
        expr("(rank * w * 17) div (20 * wout)").as("c"))
      .groupBy("item").agg(sum(col("c")).as("inflow"))
    nodes.crossJoin(broadcast(nn))
      .join(contrib, Seq("item"), "left")
      .select(col("item"),
        (expr(s"(15 * ${PrScale}L) div (100 * n)") +
          coalesce(col("inflow"), lit(0L))).as("rank"))
  }

  /** Weighted PageRank ([[PrIters]] power iterations, damping 17/20)
    * over the item-transition graph. Output: the full integer rank
    * state (`rank_int` — the exact hash-gated value) plus its float
    * reading. */
  def pagerankItems(spark: SparkSession, dir: String): DataFrame = {
    val ks = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
    // edges and nodes are item-vocabulary-sized — persisted because
    // every iteration consumes them (Verify/Bench clear per query)
    val e = transitionEdges(ks).persist()
    val nodes = ks.select(col("k").as("item")).distinct().persist()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val r0 = nodes.crossJoin(broadcast(nn))
      .select(col("item"), expr(s"${PrScale}L div n").as("rank"))
    val rFinal = (1 to PrIters).foldLeft(r0)((r, _) => prStep(e, nodes, nn, r))
    rFinal.select(col("item"), col("rank").as("rank_int"),
      r6(col("rank").cast("double") / lit(PrScale.toDouble)).as("rank"))
  }

  /** Unrolled-CTE mirror: same integer state, same truncating
    * division (`//` on positives ≡ Spark's `div`). */
  val pagerankItemsSql: String = {
    val steps = (1 to PrIters).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (SELECT dst AS item,
             sum((rank * w * 17) // (20 * wout))::BIGINT AS inflow
           FROM e JOIN $prev ON e.src = $prev.item GROUP BY 1),
         r$i AS (SELECT nodes.item,
             ((15::BIGINT * $PrScale) // (100 * n)
               + coalesce(inflow, 0))::BIGINT AS rank
           FROM nodes CROSS JOIN nn
           LEFT JOIN c$i ON nodes.item = c$i.item)"""
    }.mkString(",\n       ")
    s"""WITH ks AS (SELECT user_id, ts, event_id,
             json_extract(props, '$$.k')::BIGINT AS k FROM events
           WHERE json_extract(props, '$$.k') IS NOT NULL),
       sq AS (SELECT k AS src,
             lead(k, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS dst
           FROM ks),
       edges AS (SELECT src, dst, count(*)::BIGINT AS w FROM sq
           WHERE dst IS NOT NULL GROUP BY 1, 2),
       ow AS (SELECT src, sum(w)::BIGINT AS wout FROM edges GROUP BY 1),
       e AS (SELECT edges.src, edges.dst, w, wout
             FROM edges JOIN ow USING (src)),
       nodes AS (SELECT DISTINCT k AS item FROM ks),
       nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       r0 AS (SELECT item, ($PrScale::BIGINT // n)::BIGINT AS rank
              FROM nodes CROSS JOIN nn),
       $steps
       SELECT item, rank AS rank_int,
         ${sqlR(s"rank / $PrScale.0", 6)} AS rank
       FROM r$PrIters"""
  }

  val queries: Map[String, Q] = Map(
    "q_pagerank" -> (pagerankItems _),
  )

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> pagerankItemsSql,
  )
}
