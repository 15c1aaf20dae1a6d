package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: assign every
  * document the smallest doc id reachable through dup edges — the
  * cluster step that turns pairwise similarity into "keep one per
  * group" decisions.
  *
  * Algorithm: iterative minimum-label propagation. Each round joins the
  * current labels across the (undirected) edge set and keeps the
  * per-vertex minimum; rounds needed = graph diameter ≤ O(log n) for
  * typical dup clusters (they are near-cliques, so usually 1-2 rounds).
  * The loop is DRIVER-side control flow around fully declarative
  * joins/aggregations — each round is one shuffle on doc_id, and the
  * frame is localCheckpoint-ed per round so the plan (and its lineage)
  * doesn't grow unboundedly. The driver only ever sees the single
  * convergence COUNT per round, never the data.
  */
object DupClusters {

  /** pairs(doc_a, doc_b) → (doc_id, cluster_id = min reachable id).
    * Vertices are the ids appearing in pairs; isolated docs are absent
    * (their cluster is trivially themselves).
    */
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(eager = true)

    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(eager = true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate labels flowing across edges: neighbor's current label
      val viaEdges = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val next = labels.select(col("doc_id"), col("cluster_id"))
        .union(viaEdges)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint(eager = true)
      changed = next.join(labels.withColumnRenamed("cluster_id", "old"),
          "doc_id")
        .filter(col("cluster_id") =!= col("old"))
        .count()
      labels.unpersist() // ≤ 2 checkpointed copies live at any time
      labels = next
      iter += 1
    }
    if (changed > 0) {
      // silently-partial components would diverge from the exact closure
      // (and the oracle); a diameter this large means maxIter is wrong
      // for the graph — fail loudly instead
      throw new IllegalStateException(
        s"DupClusters.clusters did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter")
    }
    labels
  }
}
