package graft

import org.apache.spark.sql.functions._
import graft.search.Hybrid
import graft.text.Bm25

/** BM25 scoring and reciprocal-rank fusion (the lexical half + fusion of
  * the hybrid-retrieval path, q63/q64).
  */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  // 4-doc corpus with known token counts. dl counts non-empty tokens.
  private def docs = Seq(
    (0L, "cat dog cat"),        // dl 3, tf(cat)=2
    (1L, "cat fish"),           // dl 2, tf(cat)=1
    (2L, "dog dog dog dog"),    // dl 4, tf(dog)=4
    (3L, "bird")                // dl 1, no query terms
  ).toDF("doc_id", "text")

  /** Hand-computed BM25 (k1=1.2, b=0.75, rational idf) for one (tf, dl, df)
    * cell over N=4 docs, avgdl=10/4.
    */
  private def cell(tf: Double, dl: Double, df: Double): Double = {
    val n = 4.0; val avgdl = 10.0 / 4.0
    ((n - df + 0.5) / (df + 0.5)) *
      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
  }

  test("score matches the hand-computed BM25 formula") {
    val got = Bm25.score(docs, Seq("cat", "dog"))
      .as[(Long, Double)].collect().toMap
    // df(cat)=2 (docs 0,1), df(dog)=2 (docs 0,2)
    assert(math.abs(got(0L) - (cell(2, 3, 2) + cell(1, 3, 2))) < 1e-12)
    assert(math.abs(got(1L) - cell(1, 2, 2)) < 1e-12)
    assert(math.abs(got(2L) - cell(4, 4, 2)) < 1e-12)
    assert(!got.contains(3L), "doc with no query terms must not appear")
  }

  test("topK orders by rounded score desc with id tie-break and limits") {
    val got = Bm25.topK(docs, Seq("cat", "dog"), k = 2)
      .as[(Long, Double)].collect()
    // doc 2 (tf 4) outscores doc 0 (two smaller cells) outscores doc 1
    val full = Bm25.score(docs, Seq("cat", "dog"))
      .orderBy(round($"score", 6).desc, $"doc_id".asc)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got.map(_._1).toSeq == full.take(2))
    assert(got.map(_._2).forall(s => s == math.rint(s * 1e6) / 1e6))
  }

  test("rrf fuses ranks from both lists; single-list docs keep one term") {
    val text = Seq((10L, 3.0), (11L, 2.0), (12L, 1.0)).toDF("doc_id", "score")
    val vec = Seq((11L, 0.9), (13L, 0.8)).toDF("doc_id", "score")
    val got = Hybrid.rrf(text, vec, k = 10)
      .select($"doc_id", $"rrf").as[(Long, Double)].collect().toMap
    // text ranks: 10→1, 11→2, 12→3; vec ranks: 11→1, 13→2
    assert(math.abs(got(11L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(12L) - 1.0 / 63) < 1e-15)
    assert(math.abs(got(13L) - 1.0 / 62) < 1e-15)
    // doc in both lists wins here: 1/62+1/61 > 1/61
    val order = Hybrid.rrf(text, vec, k = 10)
      .select($"doc_id").as[Long].collect().toSeq
    assert(order.head == 11L)
  }

  test("rrf ties break by ascending id and k limits the output") {
    // two docs each rank-1 in exactly one list → equal rrf, id order
    val text = Seq((5L, 1.0)).toDF("doc_id", "score")
    val vec = Seq((4L, 1.0)).toDF("doc_id", "score")
    val got = Hybrid.rrf(text, vec, k = 1)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(4L))
  }

  test("bm25 guards: empty terms and non-positive k rejected") {
    intercept[IllegalArgumentException](Bm25.score(docs, Seq.empty))
    intercept[IllegalArgumentException](Bm25.topK(docs, Seq("cat"), k = 0))
    intercept[IllegalArgumentException](
      Hybrid.rrf(docs.select($"doc_id", lit(1.0).as("score")),
        docs.select($"doc_id", lit(1.0).as("score")), k = 0))
  }
}
