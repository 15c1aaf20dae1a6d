package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(1.0, 0.0), Seq(0.0, 1.0)),
    (Seq(2.0, 0.0), Seq(-3.0, 0.0)),
    (Seq(0.0, 0.0), Seq(1.0, 1.0))
  ).toDF("a", "b")

  test("dotProduct matches hand computation") {
    val got = pairs.select(dotProduct($"a", $"b")).as[Double].collect()
    assert(got.toSeq == Seq(32.0, 0.0, -6.0, 0.0))
  }

  test("l2Norm") {
    val got = pairs.select(l2Norm($"a")).as[Double].collect()
    assert(math.abs(got(0) - math.sqrt(14.0)) < 1e-12)
    assert(got(3) == 0.0)
  }

  test("cosine bounds and exact values, zero-norm guard") {
    val got = pairs.select(cosineSimilarity($"a", $"b")).as[Double].collect()
    assert(got.forall(s => s >= -1.0 - 1e-12 && s <= 1.0 + 1e-12))
    assert(got(1) == 0.0)       // orthogonal
    assert(got(2) == -1.0)      // antiparallel
    assert(got(3) == 0.0)       // zero-norm → 0, not NaN
    assert(!got.exists(_.isNaN))
  }

  test("asDouble upcasts float arrays") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val got = df.select(dotProduct(asDouble($"v"), asDouble($"v"))).as[Double].head()
    assert(got == 5.0)
  }

  test("l2DistanceSq") {
    val got = pairs.select(l2DistanceSq($"a", $"b")).as[Double].collect()
    assert(got(0) == 27.0)
    assert(got(1) == 2.0)
  }

  test("int8 quantization: codes in range, bounded reconstruction error, zero-safe") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val vecs = (Seq.fill(20)(Seq.fill(32)(rnd.nextGaussian())) :+
      Seq.fill(32)(0.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = vecs
      .withColumn("scale", maxAbs(col("v")))
      .select(col("id"), col("v"), col("scale"),
        quantizeInt8(col("v"), col("scale")).as("q"))
      .withColumn("back", dequantizeInt8(col("q"), col("scale")))
      .as[(Long, Seq[Double], Double, Seq[Int], Seq[Double])].collect()
    out.foreach { case (id, v, scale, q, back) =>
      assert(q.forall(c => c >= -127 && c <= 127), s"code out of range for $id")
      if (scale == 0.0) assert(q.forall(_ == 0) && back.forall(_ == 0.0))
      else v.zip(back).foreach { case (x, y) =>
        // floor(t+0.5) lands within 1/2 code step of t
        assert(math.abs(x - y) <= scale / 127.0 / 2.0 + 1e-12,
          s"reconstruction error too large for $id: $x vs $y")
      }
    }
    // the max-abs component quantizes to exactly ±127
    out.filter(_._3 > 0).foreach { case (_, v, _, q, _) =>
      assert(q.map(math.abs).max == 127)
      assert(v.map(math.abs).max > 0)
    }
  }
}
