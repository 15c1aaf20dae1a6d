package graft

import graft.ops.Ppl
import org.apache.spark.sql.functions._

class PplSpec extends SparkSpec {
  import spark.implicits._

  // 6 en docs: 1-3 reuse the target phrasing (low NLL), 4-6 don't
  private def docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "the quick brown fox jumps again and again today"),
    (3L, "en", "the quick brown fox sleeps near the lazy dog"),
    (4L, "en", "zxq vvw qqj plm okn ijb uhv ygc tfx"),
    (5L, "en", "aaa bbb ccc ddd eee fff ggg hhh iii"),
    (6L, "en", "completely novel phrasing unseen elsewhere in corpus"),
    (7L, "de", "der schnelle braune fuchs springt heute"),
    (8L, "de", "vollkommen anderer deutscher text ohne muster"),
    (9L, "de", "noch ein ganz anderer deutscher text")
  ).toDF("doc_id", "lang", "text")

  test("thirds per language: counts balanced, every scored doc assigned") {
    val out = Ppl.pplBuckets(docs, col("lang") === "en")
      .as[(String, Long, Long, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    assert(byLang.keySet == Set("en", "de"))
    for ((lang, rows) <- byLang) {
      val counts = rows.map(_._3)
      assert(counts.sum == (if (lang == "en") 6 else 3), s"$lang: $rows")
      // a thirds cut can't put bucket sizes more than 1 apart
      assert(counts.max - counts.min <= 1, s"$lang unbalanced: $rows")
      assert(rows.map(_._2).toSet.subsetOf(Set(0L, 1L, 2L)))
    }
  }

  test("head bucket has lower mean NLL than tail within a language") {
    val out = Ppl.pplBuckets(docs, col("lang") === "en")
      .filter($"lang" === "en")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._4.toDouble / r._5)).toMap
    assert(out(0L) < out(2L), s"head !< tail: $out")
  }

  test("deterministic across reruns; all-integer outputs") {
    val a = Ppl.pplBuckets(docs, col("lang") === "en")
      .orderBy("lang", "bucket").collect().toSeq
    val b = Ppl.pplBuckets(docs, col("lang") === "en")
      .orderBy("lang", "bucket").collect().toSeq
    assert(a == b)
    val schema = Ppl.pplBuckets(docs, col("lang") === "en").schema
    assert(schema.fields.drop(1).forall(_.dataType ==
      org.apache.spark.sql.types.LongType), schema.treeString)
  }

  test("bucket count must be >= 2") {
    intercept[IllegalArgumentException] {
      Ppl.pplBuckets(docs, col("lang") === "en", buckets = 1)
    }
  }

  test("kernel bigram stream == composed (r19): identical rows on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = Ppl.pplBuckets(real, col("lang") === "en", kernelGrams = true)
      .orderBy("lang", "bucket").collect().toSeq
    val c = Ppl.pplBuckets(real, col("lang") === "en", kernelGrams = false)
      .orderBy("lang", "bucket").collect().toSeq
    assert(k.nonEmpty)
    assert(k == c)
  }
}
