package graft

import org.apache.spark.sql.functions._
import graft.search.Search

/** Flagship-path parity spec (SURVEY.md §2.5, §2.9.1-2): cosine semantics,
  * threshold-AFTER-limit ordering, deterministic tie-breaks.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Seq(1.0, 0.0), "a"),
    (1L, Seq(0.9, 0.1), "b"),
    (2L, Seq(0.0, 1.0), "c"),
    (3L, Seq(-1.0, 0.0), "d"),
    (4L, Seq(0.0, 0.0), "e") // zero-norm → score 0 by contract
  ).toDF("vec_id", "embedding", "label")

  test("topK: exact scores, descending order, id tie-break") {
    val got = Search.topK(corpus, Seq(1.0, 0.0), k = 3, threshold = -2.0)
      .select($"vec_id", $"score").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(math.abs(got(0)._2 - 1.0) < 1e-12)
    assert(math.abs(got(1)._2 - 0.9 / math.sqrt(0.82)) < 1e-12)
    assert(got(2)._2 == 0.0)
  }

  test("threshold is applied AFTER the top-k slice — can return fewer than k") {
    // top-3 by score are ids 0 (1.0), 1 (~0.994), 2 (0.0); threshold 0.5
    // kills id 2 INSIDE the slice → 2 rows, and id 4 (score 0) is never
    // considered even though other sub-threshold rows were sliced away.
    val got = Search.topK(corpus, Seq(1.0, 0.0), k = 3, threshold = 0.5)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L))
  }

  test("zero-norm corpus vector scores 0, not NaN") {
    val got = Search.scoreAll(
        corpus.withColumn("embedding", transform($"embedding", _.cast("double"))),
        Seq(1.0, 0.0))
      .filter($"vec_id" === 4).select($"score").as[Double].head()
    assert(got == 0.0)
  }

  test("zero-norm query vector scores 0 against everything") {
    val got = Search.scoreAll(
        corpus.withColumn("embedding", transform($"embedding", _.cast("double"))),
        Seq(0.0, 0.0))
      .select($"score").as[Double].collect()
    assert(got.forall(_ == 0.0))
  }

  test("topKBatch ranks per query with threshold after ranking") {
    val queries = Seq(
      (100L, Seq(1.0, 0.0)),
      (200L, Seq(0.0, 1.0))
    ).toDF("query_id", "query_vec")
    val got = Search.topKBatch(corpus, queries, k = 2, threshold = 0.0)
      .select($"query_id", $"vec_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    // q100: best = 0 (1.0), then 1 (0.994); q200: best = 2 (1.0), then 1 (~0.11)
    assert(got == Set((100L, 0L, 1), (100L, 1L, 2), (200L, 2L, 1), (200L, 1L, 2)))
  }

  test("hardNegatives: top-k nearest with a DIFFERENT label only") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0), 1),
      (1L, Seq(0.99, 0.1), 1),  // same label as anchor — must be excluded
      (2L, Seq(0.9, 0.2), 2),   // nearest different-label
      (3L, Seq(0.5, 0.5), 2),
      (4L, Seq(-1.0, 0.0), 3)
    ).toDF("vec_id", "embedding", "label")
    val anchors = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("anchor_id"), $"label".as("anchor_label"),
        $"embedding".as("anchor_vec"))
    val got = Search.hardNegatives(emb, anchors, k = 2)
      .select($"anchor_id", $"vec_id", $"rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
    assert(got == Seq((0L, 2L, 1), (0L, 3L, 2)))
  }

  test("hardNegatives anchor cap: oversize batch fails fast; non-broadcast path agrees") {
    val rng = new scala.util.Random(3)
    def vec(d: Int) = Seq.fill(d)(rng.nextDouble() * 2 - 1)
    val emb = (0L until 60L).map(i => (i, vec(8), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label").cache()
    val anchors = (100L until 105L).map(i => (i, vec(8), (i % 4).toInt))
      .toDF("anchor_id", "anchor_vec", "anchor_label").cache()

    val e = intercept[IllegalArgumentException] {
      Search.hardNegatives(emb, anchors, k = 2, maxBroadcastAnchors = 3)
    }
    assert(e.getMessage.contains("maxBroadcastAnchors"))

    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"anchor_id", $"vec_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
    val bc = canon(Search.hardNegatives(emb, anchors, k = 2))
    val nobc = canon(Search.hardNegatives(emb, anchors, k = 2,
      broadcastAnchors = false))
    assert(bc == nobc && bc.nonEmpty)
  }

  test("hardNegativesPrescan equals the exact path on test vectors") {
    // prefix-heavy vectors (matryoshka shape): signal in the first half,
    // small tail noise — a modest pool must recover the exact top-k
    val rng = new scala.util.Random(5)
    def vec() = Seq.fill(8)(rng.nextDouble() * 2 - 1) ++
      Seq.fill(8)(rng.nextDouble() * 0.05)
    val emb = (0L until 80L).map(i => (i, vec(), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label").cache()
    val anchors = (100L until 104L).map(i => (i, vec(), (i % 3).toInt))
      .toDF("anchor_id", "anchor_vec", "anchor_label").cache()

    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"anchor_id", $"vec_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
    val exact = canon(Search.hardNegatives(emb, anchors, k = 3))
    val pre = canon(Search.hardNegativesPrescan(emb, anchors, k = 3,
      prefixDim = 8, poolK = 25))
    assert(pre == exact, s"prescan diverged: missing=${exact -- pre} extra=${pre -- exact}")
  }

  test("topK plans a TakeOrderedAndProject (no full sort at scale)") {
    val plan = Search.topK(corpus, Seq(1.0, 0.0), k = 3, threshold = 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("mmrTopK diversifies: a redundant near-clone is deferred") {
    // ids 0 and 1 are near-identical and most relevant; id 2 points in a
    // distinct direction, so diversity promotes it to rank 2. (The first
    // pick must NOT be collinear with the query — for any candidate c,
    // redundancy vs a query-aligned pick equals rel(c), and λ=0.5 then
    // zeroes every MMR score.)
    val docs = Seq(
      (0L, Seq(1.0, 0.1)),
      (1L, Seq(1.0, 0.12)), // near-clone of 0: sim to it ≈ 0.9999
      (2L, Seq(0.5, -0.5))  // distinct direction, decent relevance
    ).toDF("vec_id", "embedding")
    val got = Search.mmrTopK(docs, Seq(1.0, 0.0), k = 3, lambda = 0.5,
        poolSize = 3)
      .select($"rank", $"vec_id").as[(Int, Long)].collect().toSeq
    // plain relevance order would be 0, 1, 2; MMR demotes the clone
    assert(got == Seq((1, 0L), (2, 2L), (3, 1L)))
  }

  test("mmrTopK with lambda=1 reduces to plain relevance ranking") {
    val got = Search.mmrTopK(corpus, Seq(1.0, 0.0), k = 3, lambda = 1.0,
        poolSize = 5)
      .select($"rank", $"vec_id").as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 0L), (2, 1L), (3, 2L)))
  }

  test("mmrTopK validates parameters") {
    intercept[IllegalArgumentException](
      Search.mmrTopK(corpus, Seq(1.0, 0.0), k = 10, poolSize = 5))
    intercept[IllegalArgumentException](
      Search.mmrTopK(corpus, Seq(1.0, 0.0), k = 1, lambda = 1.5))
  }

  test("maxSimTopK: hand-computed MaxSim on orthogonal token bags; " +
    "per-token alignment beats pooling") {
    // doc 0 holds exactly the two query directions (MaxSim 2.0);
    // doc 1 matches one token (1.0); doc 2 matches none (0.0);
    // doc 3 holds BOTH query directions mixed into one pooled-ish
    // vector — each token maxes at cos 1/sqrt(2), total sqrt(2)
    val multi = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (0L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),
      (3L, Seq(1.0f, 1.0f, 0.0f, 0.0f)), (3L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("doc_id", "embedding")
    val q = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val got = Search.maxSimTopK(multi, q, k = 4)
      .select($"doc_id", $"n_vecs", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 3L, 1L, 2L), s"order wrong: $got")
    assert(got.map(_._2) == Seq(2L, 2L, 2L, 2L))
    val scores = got.map(_._3)
    assert(scores(0) == 2.0 && scores(2) == 1.0 && scores(3) == 0.0)
    assert(math.abs(scores(1) - math.sqrt(2.0)) < 1e-6,
      s"mixed-vector doc should score sqrt(2), got ${scores(1)}")
    // the pooled single-vector phrasing CANNOT distinguish doc 0 from
    // doc 3 (their vector sums are identical) — MaxSim does
    assert(scores(0) > scores(1))
  }

  test("maxSimPlaidTopK: full shortlist equals exact maxSimTopK; " +
    "stage-1 centroid pruning keeps the right doc at shortlist 1") {
    val centers = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // doc 0 lives on centroid 0's axis, doc 1 on centroid 1's,
    // doc 2 mixed — assignment hand-built to the nearest center
    val assigned = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (0L, Seq(0.9f, 0.1f), 0),
      (1L, Seq(0.0f, 1.0f), 1), (1L, Seq(0.1f, 0.9f), 1),
      (2L, Seq(0.8f, 0.2f), 0), (2L, Seq(0.2f, 0.8f), 1))
      .toDF("doc_id", "embedding", "centroid_id")
    val q = Seq(Seq(1.0, 0.0))
    val plaid = Search.maxSimPlaidTopK(assigned, centers, q, k = 3,
        shortlist = 3)
      .select($"doc_id", $"n_vecs", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    val exact = Search.maxSimTopK(assigned, q, k = 3)
      .select($"doc_id", $"n_vecs", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(plaid == exact, s"plaid=$plaid exact=$exact")
    // stage-1 approx: docs touching centroid 0 score cos=1.0 approx,
    // doc 1 (centroid 1 only) scores 0 — a shortlist of 1 keeps doc 0
    // (approx ties broken by doc asc) and still rescores it exactly
    val one = Search.maxSimPlaidTopK(assigned, centers, q, k = 1,
        shortlist = 1)
      .select($"doc_id", $"approx_score", $"score")
      .as[(Long, Double, Double)].collect().toSeq
    assert(one.map(_._1) == Seq(0L), s"got $one")
    assert(one.head._2 == 1.0 && one.head._3 == 1.0)
    intercept[IllegalArgumentException](
      Search.maxSimPlaidTopK(assigned, centers, q, k = 3, shortlist = 2))
    intercept[IllegalArgumentException](
      Search.maxSimPlaidTopK(assigned, centers, Seq.empty, k = 1))
  }

  test("maxSimTopK: single-token query reduces to best-vector-per-doc; " +
    "parameter validation") {
    val multi = Seq(
      (0L, Seq(1.0f, 0.0f)), (0L, Seq(0.6f, 0.8f)),
      (1L, Seq(0.0f, 1.0f)), (1L, Seq(0.8f, 0.6f)))
      .toDF("doc_id", "embedding")
    val got = Search.maxSimTopK(multi, Seq(Seq(1.0, 0.0)), k = 2)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1.0), (1L, 0.8)), s"got $got")
    intercept[IllegalArgumentException](
      Search.maxSimTopK(multi, Seq.empty, k = 1))
    intercept[IllegalArgumentException](
      Search.maxSimTopK(multi, Seq(Seq(1.0), Seq(1.0, 0.0)), k = 1))
    intercept[IllegalArgumentException](
      Search.maxSimTopK(multi, Seq(Seq(1.0, 0.0)), k = 0))
  }
}
