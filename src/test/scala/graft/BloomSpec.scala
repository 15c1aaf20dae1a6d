package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** Portable Bloom pre-filter: no false negatives ever, false positives
  * bounded and resolved by the exact join that follows (q68 shape).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (0L until 50L).toDF("k")
    val bloom = Bloom.build(keys, "k", words = 8, probes = 3)
    val pass = Bloom.mightContain(keys, bloom, "k", words = 8, probes = 3)
    assert(pass.count() == 50L)
  }

  test("false-positive rate is small for a correctly sized filter") {
    val keys = (0L until 50L).toDF("k")
    // 8 words × 32 bits = 256 bits for 50×3 = 150 set-bit draws
    val bloom = Bloom.build(keys, "k", words = 8, probes = 3)
    val strangers = (1000L until 2000L).toDF("k")
    val fp = Bloom.mightContain(strangers, bloom, "k", words = 8, probes = 3)
      .count()
    // fill ≈ 1-e^(-150/256) ≈ 0.44 → expected FP ≈ 0.44³ ≈ 8.8%
    assert(fp < 200L, s"false-positive rate too high: $fp/1000")
  }

  test("bloom output shape: one row, `words` bigint words") {
    val bloom = Bloom.build(Seq(1L, 2L).toDF("k"), "k", words = 4, probes = 2)
    val rows = bloom.as[Seq[Long]].collect()
    assert(rows.length == 1 && rows.head.length == 4)
    // all used bits live in the low 32 bits of each word
    assert(rows.head.forall(w => (w >>> 32) == 0L))
  }

  test("native probe kernel == Column-expression witness phrasing") {
    val keys = (0L until 80L by 3L).toDF("k")
    val bloom = Bloom.build(keys, "k", words = 4, probes = 3)
    val mixed = (0L until 500L).toDF("k")
    val native = Bloom.mightContain(mixed, bloom, "k", words = 4, probes = 3)
      .as[Long].collect().sorted
    val witness = Bloom.mightContainExpr(mixed, bloom, "k", words = 4, probes = 3)
      .as[Long].collect().sorted
    assert(native.sameElements(witness))
    assert(native.nonEmpty)
  }

  test("helper columns are dropped and input validated") {
    val keys = Seq(1L).toDF("k")
    val bloom = Bloom.build(keys, "k")
    val out = Bloom.mightContain(Seq(1L, 99L).toDF("k"), bloom, "k")
    assert(out.columns.toSeq == Seq("k"))
    intercept[IllegalArgumentException](Bloom.build(keys, "k", words = 0))
  }
}
