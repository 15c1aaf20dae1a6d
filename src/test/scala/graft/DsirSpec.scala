package graft

import graft.ops.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "the quick brown fox sleeps all day"),
    (3L, "de", "der schnelle braune fuchs springt"),
    (4L, "de", "ein ganz anderer text ohne gemeinsame worte"),
    (5L, "en", "quick brown quick brown quick brown")
  ).toDF("doc_id", "lang", "text")

  test("target-domain docs outscore off-domain docs") {
    val w = Dsir.importanceWeights(docs, col("lang") === "en")
      .as[(Long, Long)].collect().toMap
    // every doc with >= 1 bigram gets a row
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // docs made of target-domain bigrams score above the all-off-domain doc
    assert(w(5L) > w(4L), s"expected en-bigram doc above de-only doc: $w")
    assert(w(1L) > w(4L) && w(2L) > w(4L))
  }

  test("weights are exact integers and deterministic across reruns") {
    val a = Dsir.importanceWeights(docs, col("lang") === "en")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val b = Dsir.importanceWeights(docs, col("lang") === "en")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("single-word docs produce no feature rows") {
    val d = Seq((1L, "en", "hello"), (2L, "en", "hello world")).toDF("doc_id", "lang", "text")
    val w = Dsir.importanceWeights(d, col("lang") === "en")
      .as[(Long, Long)].collect().toMap
    assert(w.keySet == Set(2L))
  }

  test("bucket count must be >= 2") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs, col("lang") === "en", buckets = 1)
    }
  }

  test("native token-bigram kernel == composed form (md5Int60 parity)") {
    import spark.implicits._
    val edge = Seq(
      (1L, "en", "the quick brown fox jumps over the dog"),
      (2L, "de", "der schnelle braune fuchs springt"),
      (3L, "en", "single"),             // no bigrams on either path
      (4L, "en", "  Mixed CASE pad  "), // trim+lower
      (5L, "de", "tab\tsep tokens"))
      .toDF("doc_id", "lang", "text")
    val kernel = Dsir.importanceWeights(edge, col("lang") === "en")
      .as[(Long, Long)].collect().toSet
    val composed = Dsir.importanceWeights(edge, col("lang") === "en",
        kernelGrams = false)
      .as[(Long, Long)].collect().toSet
    assert(kernel == composed, s"kernel=$kernel composed=$composed")
  }
}
