package graft

import org.apache.spark.sql.functions._

import graft.stats.QuantileSketch

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucket index and lower bound are exact over a swept range") {
    // lb(bucket(v)) <= v for every v, and v < lb(next non-empty bucket):
    // proven by round-tripping each value through sketch -> quantile
    // read at p=100 on single-value groups
    val vals = (0L to 300L) ++ Seq(1023L, 1024L, 1025L, 65535L, 65536L,
      1000000L, (1L << 40) + 12345L)
    val df = vals.map(v => (s"g$v", v)).toDF("g", "v")
    val got = QuantileSketch.quantiles(df, "g", "v", Seq(100))
      .select("g", "est_value").as[(String, Long)].collect().toMap
    vals.foreach { v =>
      val est = got(s"g$v")
      assert(est <= v, s"lb must not exceed v: v=$v est=$est")
      // relative error bound 1/M (exact below 2^6 where buckets are unit)
      assert(v - est <= math.max(0L, v / QuantileSketch.M),
        s"err bound violated: v=$v est=$est")
    }
  }

  test("sketch is mergeable bucket-for-bucket: whole == merged halves") {
    val vals = (1 to 5000).map(i => ("s", (i * 2654435761L % 100000) + 1))
    val df = vals.toDF("g", "v")
    val (h1, h2) = (df.filter($"v" % 2 === 0), df.filter($"v" % 2 =!= 0))
    val whole = QuantileSketch.sketch(df, "g", "v")
      .as[(String, Long, Long)].collect().toSet
    val merged = QuantileSketch.merge(
      QuantileSketch.sketch(h1, "g", "v"),
      QuantileSketch.sketch(h2, "g", "v"))
      .as[(String, Long, Long)].collect().toSet
    assert(whole == merged)
    // and the quantile read off either is identical
    val qa = QuantileSketch.quantiles(df, "g", "v", Seq(50, 90, 99))
      .as[(String, Int, Long)].collect().toSet
    val qb = QuantileSketch.quantilesFromSketch(QuantileSketch.merge(
      QuantileSketch.sketch(h1, "g", "v"),
      QuantileSketch.sketch(h2, "g", "v")), "g", Seq(50, 90, 99))
      .as[(String, Int, Long)].collect().toSet
    assert(qa == qb)
  }

  test("quantile read matches brute force within 1/M, audit agrees") {
    val vals = (1 to 2000).map(i => ("a", ((i * 48271L) % 9973) + 1)) ++
      (1 to 400).map(i => ("b", i.toLong))
    val df = vals.toDF("g", "v")
    val audit = QuantileSketch.quantileAudit(df, "g", "v", Seq(50, 90, 99))
      .as[(String, Int, Long, Long, Double)].collect()
    assert(audit.length == 6)
    audit.foreach { case (g, p, exact, est, rel) =>
      // brute-force the lower quantile with the same integer rank rule
      val sorted = vals.filter(_._1 == g).map(_._2).sorted
      val target = ((sorted.length.toLong * p) + 99) / 100
      val want = sorted((target - 1).toInt)
      assert(exact == want, s"exact side wrong: g=$g p=$p got=$exact want=$want")
      assert(est <= exact && exact - est <= exact / QuantileSketch.M,
        s"estimate out of bound: g=$g p=$p exact=$exact est=$est")
      assert(math.abs(rel) <= 1.0 / QuantileSketch.M + 1e-9, s"rel_err $rel")
    }
  }

  test("zero keeps its own exact bucket; negatives raise") {
    val df = Seq(("g", 0L), ("g", 0L), ("g", 5L)).toDF("g", "v")
    val q = QuantileSketch.quantiles(df, "g", "v", Seq(50))
      .as[(String, Int, Long)].collect()
    assert(q.toSeq == Seq(("g", 50, 0L))) // rank 1 of 3 -> the zero bucket
    val bad = Seq(("g", -1L)).toDF("g", "v")
    val e = intercept[Exception] {
      QuantileSketch.sketch(bad, "g", "v").collect()
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
  }

  test("sketch stays bounded: one group never exceeds 64*M rows") {
    val df = (1 to 20000).map(i => ("g", i.toLong)).toDF("g", "v")
    val n = QuantileSketch.sketch(df, "g", "v").count()
    assert(n <= 64L * QuantileSketch.M, s"sketch rows $n")
  }
}
