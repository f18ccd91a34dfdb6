package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list —
  * the transitive-closure step that turns verified near-duplicate
  * PAIRS into duplicate CLUSTERS, so corpus dedup can keep exactly
  * one survivor per cluster (pairwise keep-min drops too little:
  * a–b and b–c leave {a, c} both alive even though a~c transitively).
  *
  * Algorithm: hash-min label propagation. Every node starts labeled
  * with itself; each round every node takes the minimum label among
  * itself and its neighbors; convergence when no label changes. The
  * component id is therefore the component's MINIMUM node id — a
  * deterministic, meaningful survivor key.
  *
  * Scale shape: each round is one shuffle-join of the (symmetrized)
  * edge list with the label table on node id plus a groupBy-min —
  * integer rows only, the same id-only discipline as the LSH band
  * joins. Rounds = component diameter. Near-dup clusters are
  * clique-ish (every member collides with most others → diameter
  * ≤ 2–3), so the loop converges in a handful of rounds; for
  * high-diameter graphs (chains), swap in the large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce
  * and Beyond"), which bounds rounds at O(log n) with the same
  * per-round shape. Lineage is truncated per round with an eager
  * `localCheckpoint` — iterative DataFrame loops otherwise stack
  * plans until the optimizer chokes.
  *
  * The reference has no clustering step (its dedup is exact-hash
  * only, DPF/processor.py dedup paths); this is part of the
  * training-data extension surface.
  */
object ConnectedComponents {

  /** @param edges one row per undirected edge
    * @param src    source id column (numeric or string — any orderable)
    * @param dst    destination id column
    * @param maxIter hard round cap (diameter bound); the loop stops
    *                earlier at the convergence fixpoint
    * @return (node, component): every node that appears in an edge,
    *         labeled with the minimum id reachable from it
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u").as("node"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "node")
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = next
      converged = changed == 0
      round += 1
    }
    sym.unpersist()
    labels
  }

  /** Cluster summary: one row per component with its size — the
    * "what would dedup delete" accounting view. Component id is the
    * surviving doc id (minimum of the cluster). */
  def componentSizes(edges: DataFrame, src: String, dst: String): DataFrame =
    connectedComponents(edges, src, dst)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs"))
}
