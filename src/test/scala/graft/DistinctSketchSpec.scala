package graft

import graft.stats.DistinctSketch

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  private def values(g: String, n: Int, prefix: String) =
    (1 to n).map(i => (g, s"$prefix$i"))

  test("hllDistinct estimates within HLL error bounds (m=64 → ~13% rse)") {
    val df = (values("big", 2000, "tok") ++ values("small", 50, "w"))
      .toDF("source", "tok")
    val got = DistinctSketch.hllDistinct(df, "source", "tok")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // 5x the 13% relative standard error — loose, but catches any
    // structural bug (wrong register split, wrong ρ, off-by-one shifts)
    assert(math.abs(got("big") - 2000) / 2000.0 < 0.65, s"big=${got("big")}")
    assert(got("small") > 10 && got("small") < 500, s"small=${got("small")}")
  }

  test("hllDistinct is insensitive to duplication (cardinality, not count)") {
    val once = values("g", 500, "t").toDF("source", "tok")
    val thrice = (values("g", 500, "t") ++ values("g", 500, "t") ++
      values("g", 500, "t")).toDF("source", "tok")
    val a = DistinctSketch.hllDistinct(once, "source", "tok").head.getDouble(2)
    val b = DistinctSketch.hllDistinct(thrice, "source", "tok").head.getDouble(2)
    assert(a == b)
  }

  test("kmvSketch keeps the k smallest distinct hashes per group") {
    val df = (values("a", 100, "x") ++ values("b", 5, "y")).toDF("source", "tok")
    val sk = DistinctSketch.kmvSketch(df, "source", "tok", k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val aRows = sk.filter(_._1 == "a")
    assert(aRows.length == 16)
    assert(sk.count(_._1 == "b") == 5) // fewer distinct values than k
    // ranks are 1..k and hashes ascend with rank
    assert(aRows.sortBy(_._3).map(_._2).sameElements(
      aRows.map(_._2).sorted))
  }

  test("kmvPairStats: identical groups → jaccard 1, disjoint → 0") {
    val df = (values("a", 300, "t") ++ values("b", 300, "t") ++
      values("c", 300, "zzz")).toDF("source", "tok")
    val sk = DistinctSketch.kmvSketch(df, "source", "tok", k = 64)
    val got = DistinctSketch.kmvPairStats(sk, "source", k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (abOverlap, _, abJac) = got(("a", "b"))
    assert(abOverlap == 64L && abJac == 1.0)
    val (acOverlap, _, acJac) = got(("a", "c"))
    assert(acOverlap == 0L && acJac == 0.0)
    // union estimate for a∪c (600 distinct values) within loose bounds
    val acUnion = got(("a", "c"))._2
    assert(acUnion > 300 && acUnion < 1200, s"acUnion=$acUnion")
  }

  test("kmvPairStats n_merged < k degrades to exact union") {
    val df = (values("a", 10, "p") ++ values("b", 10, "q")).toDF("source", "tok")
    val sk = DistinctSketch.kmvSketch(df, "source", "tok", k = 256)
    val row = DistinctSketch.kmvPairStats(sk, "source", k = 256).head
    assert(row.getDouble(3) == 20.0) // exact union cardinality
    assert(row.getLong(2) == 0L)
  }
}
