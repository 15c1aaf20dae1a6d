package graft

import graft.dedup.Dedup

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  // srcA and srcB share one long verbatim paragraph; srcC uses a fully
  // disjoint vocabulary, so no 16-char gram can coincide
  private val common =
    "the quick brown fox jumps over the lazy dog while the patient heron " +
    "watches the river bend slowly beneath the old stone bridge at dawn"
  private def docs = Seq(
    (1L, "srcA", common + " unique tail alpha for the first source here"),
    (2L, "srcA", "another srcA document with its own words entirely"),
    (3L, "srcB", common + " unique tail beta for the second source here"),
    (4L, "srcC", "zxqv wvut sqpo nmlk jihg fedc baaz yxwv utsr qpon mlkj " +
      "ihgf edcb zyxw vuts rqpo nmlk jihgf edcba zzyyxx wwvvuu ttssrr")
  ).toDF("doc_id", "source", "text").select($"source", $"text")

  test("sources sharing a verbatim paragraph share fingerprints; disjoint ones don't") {
    val out = Dedup.sourceOverlap(docs)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out.contains(("srcA", "srcB")), s"expected A-B overlap row: $out")
    val (shared, na, nb) = out(("srcA", "srcB"))
    assert(shared > 0)
    assert(shared <= math.min(na, nb))
    // pair orientation is always source_a < source_b
    assert(out.keys.forall { case (a, b) => a < b })
    // the disjoint-vocabulary source shares nothing with either
    assert(!out.contains(("srcA", "srcC")) && !out.contains(("srcB", "srcC")),
      s"srcC must not overlap: $out")
  }

  test("totals are per-source distinct fingerprint counts (repeats collapse)") {
    // the same source twice: duplicate text adds no new distinct fingerprints
    val dup = Seq(
      ("srcA", common), ("srcA", common), ("srcB", common)
    ).toDF("source", "text")
    val out = Dedup.sourceOverlap(dup)
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (a, b, shared, na, nb) = out.head match {
      case (x, y, s, n1, n2) => (x, y, s, n1, n2)
    }
    assert(a == "srcA" && b == "srcB")
    // identical text on both sides: full overlap, equal totals
    assert(shared == na && na == nb && shared > 0)
  }
}
