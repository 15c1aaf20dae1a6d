package graft

import org.apache.spark.sql.functions._
import graft.search.Whiten

class WhitenSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4

  private def emb = Seq(
    (0L, Seq(1.0f, 0.2f, -0.5f, 0.9f)),
    (1L, Seq(0.8f, 0.1f, -0.4f, 0.7f)),
    (2L, Seq(-0.3f, 0.9f, 0.2f, -0.1f)),
    (3L, Seq(-0.2f, 0.8f, 0.3f, 0.0f)),
    (4L, Seq(0.5f, -0.5f, 0.5f, -0.5f)),
    (5L, Seq(0.1f, 0.3f, -0.9f, 0.6f))
  ).toDF("vec_id", "embedding")

  test("covarianceFixedPoint matches a hand-computed entry exactly") {
    val rows = Whiten.covarianceFixedPoint(emb, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == dims * (dims + 1) / 2)
    // dim (1,1): Σ floor(x·1e6)² over the 6 vectors, computed independently
    val xs = Seq(1.0f, 0.8f, -0.3f, -0.2f, 0.5f, 0.1f)
      .map(x => math.floor(x.toDouble * 1e6).toLong)
    assert(rows((1L, 1L)) == ((xs.map(q => q * q).sum, 6L)))
    // symmetric pair only stored once, upper triangle
    assert(!rows.contains((2L, 1L)))
  }

  test("jacobiEigen recovers a known symmetric decomposition") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0)) // eigenvalues 1 and 3
    val (lam, u) = Whiten.jacobiEigen(a)
    assert(lam.sorted.zip(Seq(1.0, 3.0)).forall { case (x, y) => math.abs(x - y) < 1e-9 })
    // U orthonormal: UᵀU = I
    for (i <- 0 until 2; j <- 0 until 2) {
      val dot = (0 until 2).map(k => u(k)(i) * u(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("whitened data has identity covariance") {
    val (c, mean) = Whiten.covMatrix(
      Whiten.covarianceFixedPoint(emb, dims = dims),
      Whiten.momentsFixedPoint(emb, dims = dims), dims)
    val w = Whiten.whiteningMatrix(c)
    val white = emb.select(Whiten.applyWhitening(col("embedding"), w, mean).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = white.length.toDouble
    for (i <- 0 until dims; j <- 0 until dims) {
      val m_i = white.map(_(i)).sum / n
      val m_j = white.map(_(j)).sum / n
      val cov = white.map(v => (v(i) - m_i) * (v(j) - m_j)).sum / n
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - expect) < 1e-3, s"cov($i,$j)=$cov")
    }
  }

  test("moment aggregates validate dims and skip null/short vectors") {
    intercept[IllegalArgumentException](Whiten.momentsFixedPoint(emb, dims = 0))
    intercept[IllegalArgumentException](Whiten.momentsFixedPoint(emb, dims = 65))
    // a null row and a too-short row must not skew the mean: sum would
    // silently drop them but count(1) would still count the row
    val dirty = emb.unionAll(Seq(
      (100L, null.asInstanceOf[Seq[Float]]),
      (101L, Seq(1.0f, 2.0f)) // shorter than dims=4
    ).toDF("vec_id", "embedding"))
    val clean = Whiten.momentsFixedPoint(emb, dims = dims).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Whiten.momentsFixedPoint(dirty, dims = dims).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == clean, s"dirty rows leaked into moments: $got vs $clean")
    val cleanCov = Whiten.covarianceFixedPoint(emb, dims = dims).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val gotCov = Whiten.covarianceFixedPoint(dirty, dims = dims).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotCov == cleanCov)
  }

  test("momentsLarge accumulates the exact same integers as the explode aggregates") {
    val (xy, x, n) = Whiten.momentsLarge(emb, dims = dims)
    assert(n == 6L)
    val wantMoments = Whiten.momentsFixedPoint(emb, dims = dims).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to dims).foreach(i => assert(x(i - 1) == wantMoments(i.toLong)))
    val wantCov = Whiten.covarianceFixedPoint(emb, dims = dims).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var idx = 0
    for (i <- 1 to dims; j <- i to dims) {
      assert(xy(idx) == wantCov((i.toLong, j.toLong)), s"($i,$j)")
      idx += 1
    }
  }

  test("large-dim whitening at d=384 (the reference's embedding dim): identity covariance") {
    val d = 384
    val nRows = 450 // > d so the sample covariance is full rank
    val rng = new scala.util.Random(5)
    // anisotropic: scale each dim differently so whitening has work to do
    val scales = Array.tabulate(d)(i => 0.2 + (i % 7) * 0.3)
    val data = (0L until nRows.toLong).map { id =>
      (id, Seq.tabulate(d)(j => ((rng.nextDouble() - 0.5) * scales(j)).toFloat))
    }.toDF("vec_id", "embedding")
    val (w, mean) = Whiten.fitWhitenLarge(data, dims = d)
    assert(w.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
    val white = data
      .select(Whiten.applyWhiteningLarge(w, mean)(col("embedding").cast("array<double>")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    assert(white.forall(_.length == d))
    // sample covariance of the whitened rows ≈ I (spot-check a band of
    // entries — the full 384² loop is slow in a unit test for no extra
    // coverage)
    val nD = white.length.toDouble
    for (i <- 0 until 24; j <- i until 24) {
      val mi = white.map(_(i)).sum / nD
      val mj = white.map(_(j)).sum / nD
      val cov = white.map(v => (v(i) - mi) * (v(j) - mj)).sum / nD
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - expect) < 5e-2, s"cov($i,$j)=$cov")
    }
    // null and short vectors whiten to null, mirroring the fit-side filter
    val dirty = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    assert(dirty.select(Whiten.applyWhiteningLarge(w, mean)(col("embedding")))
      .head().isNullAt(0))
  }

  test("applyWhitening with identity matrix and zero mean is a no-op") {
    val eye = Array.tabulate(dims, dims)((i, j) => if (i == j) 1.0 else 0.0)
    val zero = Array.fill(dims)(0.0)
    val got = emb.orderBy("vec_id")
      .select(Whiten.applyWhitening(col("embedding"), eye, zero).as("v"))
      .collect().map(_.getSeq[Double](0))
    val want = emb.orderBy("vec_id").collect().map(_.getSeq[Float](1).map(_.toDouble))
    got.zip(want).foreach { case (g, w) =>
      g.zip(w).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }
}
