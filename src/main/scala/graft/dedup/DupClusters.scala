package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: assign every
  * document the smallest doc id reachable through dup edges — the
  * cluster step that turns pairwise similarity into "keep one per
  * group" decisions.
  *
  * Algorithm: minimum-label propagation with pointer jumping. Each round
  *  1. relaxes across the (undirected) edge set — every vertex takes the
  *     min of its own label and its neighbors' labels; then
  *  2. pointer-jumps — every vertex takes its label's label, l(v) ←
  *     l(l(v)), which squares the propagation distance per round, so
  *     chain-shaped components converge in O(log diameter) rounds rather
  *     than O(diameter) (dup cliques still converge in 1-2 rounds).
  * A label is always the id of a smaller-or-equal vertex in the same
  * component (initialized to self, only ever lowered by reachable ids),
  * so the jump join stays within the labels frame and the fixpoint is
  * the exact component minimum.
  *
  * The loop is DRIVER-side control flow around fully declarative
  * joins/aggregations — one edge shuffle + one label-sized jump shuffle
  * per round, and the frame is localCheckpoint-ed per round so the plan
  * (and its lineage) doesn't grow unboundedly. Convergence is detected
  * from the pre-round label carried THROUGH the aggregate (no extra
  * labels⋈labels join); the driver only ever sees the per-round change
  * COUNT, never the data.
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
      // 1. relax: min over self + neighbor labels; the pre-round label
      // rides along as min(own-flagged) so convergence needs no re-join
      val viaEdges = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"),
          lit(false).as("own"))
      val relaxed = labels
        .select(col("doc_id"), col("cluster_id"), lit(true).as("own"))
        .union(viaEdges)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("relaxed"),
          min(when(col("own"), col("cluster_id"))).as("old"))
      // 2. jump: l(v) ← l(l(v)). Labels are vertex ids, so the parent
      // lookup is a self-join of the label frame; left + coalesce keeps
      // the row even if the parent row hasn't materialized yet this round.
      // Adaptive: dup graphs are overwhelmingly cliques that fix in ≤ 2
      // relax rounds, where the jump join is pure overhead — only pay
      // for it once the graph has proven chain-shaped by still moving
      val jumped =
        if (iter < 2) relaxed.withColumn("cluster_id", col("relaxed"))
        else {
          val parents = relaxed
            .select(col("doc_id").as("p_id"), col("relaxed").as("p_label"))
          relaxed
            .join(parents, col("relaxed") === col("p_id"), "left")
            .withColumn("cluster_id",
              least(col("relaxed"), coalesce(col("p_label"), col("relaxed"))))
        }
      val next = jumped
        .select(col("doc_id"), col("cluster_id"), col("old"))
        .localCheckpoint(eager = true)
      changed = next.filter(col("cluster_id") =!= col("old")).count()
      labels.unpersist() // ≤ 2 checkpointed copies live at any time
      labels = next.drop("old")
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

  /** Canonical-document selection: given cluster assignments (from
    * [[clusters]]) and a per-doc score frame, keep the best-scored
    * member of every cluster — the decision step that turns "these
    * docs are duplicates" into "this one stays, the rest are dropped"
    * in a dedup pipeline. Ties break on the smaller id, so selection
    * is deterministic whenever `scoreCol` is (round it upstream).
    *
    * Output: (cluster_id, keep_id, n_members, best_score). Both window
    * functions share the cluster_id partition key — one shuffle, and
    * the largest window partition is one duplicate cluster, never the
    * corpus.
    */
  /** Leakage-free K-fold assignment: split a corpus so near-duplicate
    * documents NEVER straddle a fold boundary — the train/test-
    * contamination guard a naive per-doc hash split (q42) cannot give,
    * because a doc and its clone hash independently. Every doc's split
    * unit is its duplicate CLUSTER (from [[clusters]] over `pairs`);
    * docs outside any cluster are their own singleton unit. The fold is
    * a deterministic md5 of the unit key, so assignment is reproducible
    * and extends consistently when new docs arrive (a new clone of an
    * existing doc lands in the existing doc's fold by construction).
    *
    * Output: one row per fold — (fold, n_docs, n_groups, n_dup_docs,
    * cross_fold_dup_pairs), where cross_fold_dup_pairs counts dup
    * pairs whose endpoints landed in different folds: structurally 0,
    * and emitted so the invariant is ASSERTED by the correctness gate
    * on every run rather than trusted.
    *
    * Scale shape: the cluster map is pair-graph-sized (dup docs only),
    * far smaller than the corpus, so the corpus join broadcasts it;
    * fold assignment is a map-side hash; the audit joins the pair list
    * (again pair-graph-sized) against the fold map. The corpus itself
    * is never key-shuffled — only the nFolds-row summary aggregates.
    */
  def leakFreeFolds(docs: DataFrame, pairs: DataFrame, nFolds: Int = 5,
                    idCol: String = "doc_id",
                    prebuiltClusters: Option[DataFrame] = None): DataFrame = {
    require(nFolds >= 2, s"leakFreeFolds: nFolds must be >= 2, got $nFolds")
    def foldOf(key: Column): Column =
      graft.functions.HashFunctions.md5Int60(
        concat(lit("fold:"), key.cast("string"))) % nFolds
    // the pair graph feeds BOTH the cluster build and the leak audit —
    // materialize it once or the whole LSH candidate+verify pass runs
    // twice (it was the slowest query in the r8 bench before this).
    // `prebuiltClusters` skips the label propagation entirely when the
    // caller already holds the persisted cluster map for `pairs` (the
    // materialized-table seam): both frames are then table-backed, so
    // no extra checkpoint copies are made.
    val pairList =
      if (prebuiltClusters.isDefined) pairs
      else pairs.localCheckpoint(eager = true)
    val clus = prebuiltClusters
      .getOrElse(clusters(pairList).localCheckpoint(eager = true))
    // On the derived path the cluster map is a checkpointed RDD with no
    // size statistics, so the broadcast is HINTED (the frame is
    // pair-graph-sized by construction). On the table-backed path the
    // map is parquet WITH stats — the hint is dropped and Catalyst/AQE
    // picks broadcast-vs-shuffle from the actual table size, which is
    // the correct call at 100 TB where a cluster map can outgrow the
    // broadcast ceiling (PlanAuditSpec's forced-broadcast rule).
    def sized(df: DataFrame): DataFrame =
      if (prebuiltClusters.isDefined) df else broadcast(df)
    // audit over the pair graph only — cluster members' folds derive
    // from the cluster map, so the corpus never enters this branch
    val clusFold = clus.select(col(idCol), foldOf(col("cluster_id")).as("fold"))
    val leak = pairList
      .join(sized(clusFold.select(col(idCol).as("doc_a"), col("fold").as("__fa"))), "doc_a")
      .join(sized(clusFold.select(col(idCol).as("doc_b"), col("fold").as("__fb"))), "doc_b")
      .filter(col("__fa") =!= col("__fb"))
      .agg(count(lit(1)).as("cross_fold_dup_pairs"))
    // one corpus scan for the summary; the cluster map broadcasts
    docs.select(col(idCol))
      .join(sized(clus), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("group_key"),
        col("cluster_id").isNotNull.as("in_cluster"))
      .withColumn("fold", foldOf(col("group_key")))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("group_key")).as("n_groups"),
        sum(when(col("in_cluster"), 1L).otherwise(0L)).as("n_dup_docs"))
      .crossJoin(broadcast(leak))
  }

  def keepBest(clusters: DataFrame, scored: DataFrame,
               idCol: String = "doc_id", scoreCol: String = "score"): DataFrame = {
    val byCluster = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    val best = byCluster.orderBy(col(scoreCol).desc, col(idCol).asc)
    clusters.join(scored, idCol)
      .withColumn("__rk", row_number().over(best))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .filter(col("__rk") === 1)
      .select(col("cluster_id"), col(idCol).as("keep_id"),
        col("n_members"), col(scoreCol).as("best_score"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over the
    * near-dup pair graph: every node starts as its own label and each
    * round adopts the most frequent label in its CLOSED neighborhood
    * (neighbors + its own current label), tie-broken to the smallest
    * label — both choices make the rounds fully deterministic, and the
    * self-vote prevents the classic 2-cycle oscillation of synchronous
    * LPA on pair components. Unlike [[clusters]] (connected components —
    * reachability), LPA respects edge DENSITY: a bridge between two
    * dense near-dup groups doesn't merge them in a bounded number of
    * rounds, which is what "duplication communities" means for keep-best
    * review at corpus scale.
    *
    * Scale shape: each round is one shuffle join of the edge list with
    * the |nodes|-row label frame plus two hash aggregates — graph-sized,
    * never corpus-quadratic; labels are localCheckpoint-ed per round so
    * lineage stays flat (the [[clusters]] discipline). Fixed round count
    * (no convergence detection) keeps the stage graph static.
    */
  def labelPropagation(pairs: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"need 1 <= iterations <= 10, got $iterations")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(eager = true)
    // r19 (StageProfile on q162): an EAGER checkpoint per iteration ran
    // one serialized Spark job per round over a tiny label frame — at 3
    // iterations that is 4 extra job floors of pure latency. With a
    // small fixed iteration count the lineage is bounded by
    // construction, and labels' two references per round (the neighbor
    // join + the self-vote union) are deduplicated at runtime by
    // exchange reuse, so the whole propagation now plans as ONE job.
    // Long chains keep the per-round cut: lineage doubles per iteration
    // (2^k subtree references), so past 4 rounds the checkpoint returns.
    val cutEvery = iterations > 4
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    for (_ <- 1 to iterations) {
      val neighborVotes = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      labels = neighborVotes
        .union(labels) // the self-vote
        .groupBy(col("id"), col("label")).agg(count(lit(1)).as("__cnt"))
        // (count desc, label asc) as one struct max: (__cnt, -label)
        .select(col("id"),
          struct(col("__cnt"), (-col("label")).as("__nl")).as("__v"))
        .groupBy(col("id")).agg(max(col("__v")).as("__m"))
        .select(col("id"), (-col("__m.__nl")).as("label"))
      if (cutEvery) labels = labels.localCheckpoint(eager = true)
    }
    labels
  }
}
