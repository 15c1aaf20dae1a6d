package graft

import org.apache.spark.sql.functions._
import graft.ops.Fim

class FimSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a", "hello world of spark"),
    (1L, "a", "x"),
    (2L, "b", "the quick brown fox jumps over the lazy dog"),
    (3L, "b", ""), // dropped: nothing to split
    (4L, "c", "0123456789" * 30)
  ).toDF("doc_id", "source", "text")

  test("spans reconstruct the document exactly and stay in bounds") {
    val sp = Fim.spans(docs, "doc_id", "text").collect()
    assert(sp.length == 4) // empty doc dropped
    sp.foreach { r =>
      val (c1, c2, n) = (r.getAs[Long]("c1"), r.getAs[Long]("c2"), r.getAs[Long]("n"))
      assert(0 <= c1 && c1 <= c2 && c2 <= n, s"span order violated: $c1 $c2 $n")
      val text = r.getAs[String]("text")
      assert(r.getAs[String]("prefix") + r.getAs[String]("middle") +
        r.getAs[String]("suffix") == text, "spans must partition the text")
      if (!r.getAs[Boolean]("applied"))
        assert(c1 == 0 && c2 == 0 && r.getAs[String]("prefix") == text,
          "unapplied docs keep the whole text as prefix")
    }
  }

  test("spans are deterministic across runs and partitionings") {
    val a = Fim.spans(docs, "doc_id", "text").select("doc_id", "c1", "c2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Fim.spans(docs.repartition(7), "doc_id", "text")
      .select("doc_id", "c1", "c2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("rate gate: 0 per mille applies nowhere, 1000 everywhere") {
    val none = Fim.spans(docs, "doc_id", "text", ratePerMille = 0)
    assert(none.filter(col("applied")).count() == 0)
    val all = Fim.spans(docs, "doc_id", "text", ratePerMille = 1000)
    assert(all.filter(!col("applied")).count() == 0)
    assertThrows[IllegalArgumentException](
      Fim.spans(docs, "doc_id", "text", ratePerMille = 1001))
  }

  test("gate hits ~ratePerMille on a wide id range") {
    val wide = spark.range(2000).select(col("id").as("doc_id"),
      lit("s").as("source"), lit("some text body").as("text"))
    val hit = Fim.spans(wide, "doc_id", "text", ratePerMille = 900)
      .filter(col("applied")).count()
    assert(hit > 1600 && hit < 2000, s"gate rate off: $hit/2000 at 900 per mille")
  }

  test("sourceStats accounting is consistent with the per-doc spans") {
    val sp = Fim.spans(docs, "doc_id", "text").collect()
    val st = Fim.sourceStats(docs, "doc_id", "text", "source").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(st.keySet == Set("a", "b", "c"))
    val expectedMiddleA = sp.filter(r => r.getAs[String]("source") == "a" &&
      r.getAs[Boolean]("applied")).map(r => r.getAs[Long]("c2") - r.getAs[Long]("c1")).sum
    assert(st("a").getAs[Long]("middle_chars") == expectedMiddleA)
    assert(st("b").getAs[Long]("n_docs") == 1) // empty doc excluded
    st.values.foreach { r =>
      if (r.getAs[Long]("n_fim") > 0) {
        val fr = Seq("avg_prefix_frac", "avg_middle_frac", "avg_suffix_frac")
          .map(c => r.getAs[Double](c))
        assert(math.abs(fr.sum - 1.0) < 1e-5, s"span fractions must sum to 1: $fr")
      }
    }
  }
}
