package graft

import graft.dedup.DupClusters

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components across chains") {
    // components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {10,11}; {20,21,22}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 7L),
      (10L, 11L),
      (21L, 22L), (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val got = DupClusters.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("single pair and self-contained cliques converge in few rounds") {
    val pairs = Seq((5L, 9L), (9L, 5L)).toDF("doc_a", "doc_b")
    val got = DupClusters.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 5L))
  }

  test("keepBest keeps the top-scored member per cluster, ties to min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val scored = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // tie at 0.9 → doc 2 wins
      (10L, 0.5), (11L, 0.4)
    ).toDF("doc_id", "q")
    val got = DupClusters
      .keepBest(DupClusters.clusters(pairs), scored, "doc_id", "q")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 3L, 0.9), (10L, 10L, 2L, 0.5)))
  }

  test("long path still converges within maxIter (diameter propagation)") {
    // path 0-1-2-...-12: min label must travel the whole diameter
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = DupClusters.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got.size == 13 && got.values.forall(_ == 0L))
  }

  test("labelPropagation: triangle, pair, path — hand-replayed rounds") {
    // Triangle {1,2,3}: round 1 already sends every closed neighborhood
    // to min id 1 (all votes tie at 1, min wins). Pair {10,11}: the
    // self-vote breaks the synchronous 2-cycle — round 1 ties each
    // node's own label against the neighbor's, min 10 wins on both
    // sides; WITHOUT the self-vote rounds would oscillate 10<->11
    // forever. Path 20-21-22: 20 after round 2; round 3 stable.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("doc_a", "doc_b")
    val got = DupClusters.labelPropagation(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), got.toString)
  }

  test("labelPropagation respects density where components do not") {
    // two 4-cliques bridged by ONE edge (3-4): connected components
    // merge everything into one cluster; 3-round LPA keeps two
    // communities because each clique's internal vote mass (3 neighbors
    // + self) outweighs the single bridge vote every round.
    val cliqueA = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val cliqueB = for (i <- 4L to 7L; j <- (i + 1) to 7L) yield (i, j)
    val pairs = (cliqueA ++ cliqueB :+ ((3L, 4L))).toDF("doc_a", "doc_b")
    val cc = DupClusters.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1) // CC: one blob
    val lpa = DupClusters.labelPropagation(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(lpa.filterKeys(_ <= 3L).values.toSet == Set(0L), lpa.toString)
    assert(lpa.filterKeys(_ >= 5L).values.toSet == Set(4L), lpa.toString)
  }
}
