package graft

import org.apache.spark.sql.functions._
import graft.search.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Seq(1.0f, 1.0f, -1.0f, 1.0f)),
    (1L, Seq(0.9f, 1.1f, -0.5f, 2.0f)),  // same orthant as 0
    (2L, Seq(-1.0f, -1.0f, 1.0f, -1.0f)), // opposite orthant
    (3L, Seq(1.0f, 1.0f, 1.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("signBucket encodes component signs as bits") {
    val got = corpus.select($"vec_id", Ann.signBucket("embedding", 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got(0L) == 11L) // bits 0,1,3 → 1+2+8
    assert(got(1L) == 11L)
    assert(got(2L) == 4L)  // only bit 2
    assert(got(3L) == 15L)
  }

  test("ivfTopK searches only the query's bucket") {
    val qrow = corpus.filter($"vec_id" === 0)
      .select($"embedding".as("query_vec"))
    val got = Ann.ivfTopK(corpus, qrow, "query_vec", k = 5, bits = 4)
      .as[(Long, Double)].collect()
    // bucket 11 contains ids 0 and 1 only; self scores 1.0 first
    assert(got.map(_._1).toSeq == Seq(0L, 1L))
    assert(got.head._2 == 1.0)
  }

  test("nearDupPairs only pairs same-bucket vectors above threshold") {
    val got = Ann.nearDupPairs(corpus, threshold = 0.5, bits = 4)
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
    assert(got.head._3 > 0.5)
  }

  test("bucketStats partitions the corpus exactly") {
    val got = Ann.bucketStats(corpus, bits = 4).as[(Long, Long)].collect().toMap
    assert(got.values.sum == 4L)
    assert(got(11L) == 2L)
  }

  test("k-means IVF: self is top hit; probe lists cover the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qVec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val index = Ann.buildIvf(emb, nCentroids = 4, seed = 42L)
    // assignment is total and the centroid table matches
    assert(index.assigned.count() == emb.count())
    assert(index.centers.length == 4)
    val got = Ann.ivfSearch(index, qVec, k = 3, nprobe = 4) // all lists → exact
    val ids = got.collect().map(_.getLong(0)).toSeq
    assert(ids.head == 0L) // self-similarity 1.0 wins
    // with nprobe = all centroids, IVF must equal the exact scan's top-3
    val exact = graft.search.Search.topK(emb, qVec, k = 3, threshold = -2.0)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == exact)
  }

  test("countSketchProject: deterministic, linear, approximately angle-preserving") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val proj = vecs.select(col("vec_id"),
        Ann.countSketchProject(col("embedding"), 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(proj.values.forall(_.length == 16))
    // deterministic across plans
    val again = vecs.repartition(3).select(col("vec_id"),
        Ann.countSketchProject(col("embedding"), 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(again == proj)
    // linearity: project(2x) == 2*project(x) exactly
    val doubled = vecs.select(col("vec_id"),
        Ann.countSketchProject(expr("transform(embedding, x -> x * 2)"), 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    doubled.foreach { case (id, p) =>
      p.zip(proj(id)).foreach { case (d2, d1) => assert(d2 == 2 * d1) }
    }
    // JL-style preservation: projected cosine correlates strongly with
    // the original cosine over random pairs (count-sketch is unbiased
    // for inner products; 64→16 keeps the signal well above noise)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val orig = vecs.as[(Long, Seq[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    val ids = orig.keys.toSeq.sorted
    val pairs = for (i <- ids; j <- ids if i < j) yield (i, j)
    val xs = pairs.map { case (i, j) => cos(orig(i), orig(j)) }
    val ys = pairs.map { case (i, j) => cos(proj(i), proj(j)) }
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val r = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(r > 0.5, s"projected/original cosine correlation too weak: $r")
  }

  test("countSketchProject validates dimensions") {
    intercept[IllegalArgumentException] {
      Ann.countSketchProject(col("embedding"), 16, 64)
    }
  }
}
