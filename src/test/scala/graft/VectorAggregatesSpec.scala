package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAggregates

class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("centroid: hand-computed, ignores null/empty rows") {
    val df = Seq(
      (0, Some(Seq(1.0, 2.0))),
      (0, Some(Seq(3.0, 4.0))),
      (0, None),
      (1, Some(Seq(10.0, 0.0)))
    ).toDF("label", "e")
      .select($"label", $"e".as("e"))
    val got = df.groupBy($"label")
      .agg(VectorAggregates.centroid(col("e")).as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) == Seq(2.0, 3.0))
    assert(got(1) == Seq(10.0, 0.0))
  }

  test("matches the posexplode phrasing on real embeddings (shuffle-heavy oracle form)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"label", $"embedding".cast("array<double>").as("e"))
    val viaAgg = emb.groupBy($"label")
      .agg(VectorAggregates.centroid(col("e")).as("c"))
      .select($"label", transform($"c", x => round(x, 9)).as("c"))
    val viaExplode = emb
      .select($"label", posexplode($"e").as(Seq("idx", "v")))
      .groupBy($"label", $"idx").agg(avg($"v").as("m"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"idx", $"m"))),
        s => round(s.getField("m"), 9)).as("c"))
    val a = viaAgg.orderBy("label").as[(Int, Seq[Double])].collect()
    val b = viaExplode.orderBy("label").as[(Int, Seq[Double])].collect()
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case ((la, ca), (lb, cb)) =>
      assert(la == lb)
      ca.zip(cb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("moments: hand-computed sums, null rows ignored, mismatch throws") {
    val df = Seq(
      Some(Seq(1.0, -2.0)), Some(Seq(3.0, 0.0)), None, Some(Seq(5.0, 2.0))
    ).toDF("e")
    val got = df.agg(VectorAggregates.moments(col("e")).as("m"))
      .select($"m.sum", $"m.sumsq", $"m.n")
      .as[(Seq[Double], Seq[Double], Long)].collect().head
    assert(got._1 == Seq(9.0, 0.0))   // 1+3+5, -2+0+2
    assert(got._2 == Seq(35.0, 8.0))  // 1+9+25, 4+0+4
    assert(got._3 == 3L)
    val bad = Seq(Seq(1.0), Seq(1.0, 2.0)).toDF("e")
    val e = intercept[Exception] {
      bad.agg(VectorAggregates.moments(col("e"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(m =>
      m.getMessage != null && m.getMessage.contains("dimension mismatch")))
  }

  test("moments matches the posexplode phrasing on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("e"))
    val viaAgg = emb.agg(VectorAggregates.moments(col("e")).as("m"))
      .select(posexplode(arrays_zip($"m.sum", $"m.sumsq")))
      .select($"pos", round($"col.sum", 9).as("s"), round($"col.sumsq", 9).as("ss"))
      .orderBy("pos").as[(Int, Double, Double)].collect()
    val viaExplode = emb.select(posexplode($"e").as(Seq("pos", "v")))
      .groupBy($"pos")
      .agg(round(sum($"v"), 9).as("s"), round(sum($"v" * $"v"), 9).as("ss"))
      .orderBy("pos").as[(Int, Double, Double)].collect()
    assert(viaAgg.nonEmpty && viaAgg.length == viaExplode.length)
    viaAgg.zip(viaExplode).foreach { case ((pa, sa, ssa), (pb, sb, ssb)) =>
      assert(pa == pb)
      assert(math.abs(sa - sb) < 1e-8 && math.abs(ssa - ssb) < 1e-8,
        s"dim $pa: ($sa,$ssa) vs ($sb,$ssb)")
    }
  }

  test("dimension mismatch throws (homogeneous-corpus contract)") {
    val df = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("e")
    val e = intercept[Exception] {
      df.agg(VectorAggregates.centroid(col("e"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(m =>
      m.getMessage != null && m.getMessage.contains("dimension mismatch")))
  }
}
