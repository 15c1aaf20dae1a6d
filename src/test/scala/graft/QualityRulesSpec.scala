package graft

import graft.text.{QualityRules, TextAnalysis}
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def flagsOf(text: String, minWords: Int = 3): Map[String, Boolean] = {
    val df = Seq(("s", text)).toDF("source", "text")
      .withColumn("__w", TextAnalysis.tokens(col("text")))
      .select(QualityRules.ruleFlags(col("text"), col("__w"), minWords = minWords).as("r"))
      .select("r.*")
    val row = df.collect().head
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getBoolean(i) }.toMap
  }

  test("clean English text passes the whole battery") {
    val f = flagsOf("the quick brown fox jumps over a lazy dog and it is fine")
    assert(f.values.forall(identity), f.toString)
  }

  test("word_count rejects short docs") {
    assert(!flagsOf("too short", minWords = 3)("word_count"))
  }

  test("word_length rejects single-char word soup and over-long tokens") {
    assert(!flagsOf("a b c d e f g h i j the of", minWords = 3)("word_length"))
    assert(!flagsOf("antidisestablishmentarianism incomprehensibilities " +
      "floccinaucinihilipilification the of", minWords = 3)("word_length"))
  }

  test("symbol_ratio rejects hashtag/ellipsis-heavy text") {
    assert(!flagsOf("buy now ### wow ### deal ... more ... stuff the of",
      minWords = 3)("symbol_ratio"))
    assert(flagsOf("the quick brown fox jumps over a lazy dog and it is fine",
      minWords = 3)("symbol_ratio"))
  }

  test("alpha_words rejects digit-soup; stopwords rejects stopword-free text") {
    val f = flagsOf("12 34 56 78 90 11 22 33 44 55 the of", minWords = 3)
    assert(!f("alpha_words"))
    val g = flagsOf("quick brown fox jumps high over lazy dogs", minWords = 3)
    assert(!g("stopwords")) // zero distinct en stopwords... 'over' is not in the list
  }

  test("funnelBySource conserves doc counts and n_kept matches the AND") {
    val docs = Seq(
      ("s0", "the quick brown fox jumps over a lazy dog and it is fine today"),
      ("s0", "x"),
      ("s1", "the cat sat on a mat and it is still there with the hat")
    ).toDF("source", "text")
    val got = QualityRules.funnelBySource(docs, minWords = 5)
      .orderBy("source").collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == 3L)
    val s0 = got(0)
    assert(s0.getAs[Long]("n_kept") == 1L) // "x" fails, the full sentence passes
    assert(s0.getAs[Long]("n_fail_word_count") == 1L)
  }

  test("tokenFunnel: cumulative stages, dedup among survivors, token math") {
    import spark.implicits._
    // 40 tokens, mean length 3.1 (within [3,10]), 2 distinct stopwords
    val good = ("the cat sat on a mat with some more text " * 4).trim
    val d = Seq(
      (1L, good, "en"),            // survives all stages
      (2L, good, "en"),            // exact dup of 1 -> dropped at stage 3
      (3L, good, "fr"),            // dropped at stage 1 (lang)
      (4L, "short text", "en"),    // dropped at stage 2 (word_count)
      (5L, ("the cat sat on a mat with some more text " * 9).trim, "en")) // 90 toks -> stage 4 cap
      .toDF("doc_id", "text", "lang")
    val got = QualityRules.tokenFunnel(d)
      .as[(Long, String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._3 == 5L && got(0L)._4 == 40L + 40L + 40L + 2L + 90L)
    assert(got(1L)._3 == 4L && got(1L)._4 == 40L + 40L + 2L + 90L)
    assert(got(2L)._3 == 3L && got(2L)._4 == 40L + 40L + 90L)
    assert(got(3L)._3 == 2L && got(3L)._4 == 40L + 90L)
    assert(got(4L)._3 == 1L && got(4L)._4 == 40L)
    assert(got(0L)._5.contains(1.0))
    // a doc whose smaller-id clone FAILED a filter is still kept at dedup
    val d2 = Seq(
      (1L, good, "fr"),   // clone with smaller id, killed by lang
      (2L, good, "en"))   // must survive dedup (rank among survivors)
      .toDF("doc_id", "text", "lang")
    val got2 = QualityRules.tokenFunnel(d2)
      .as[(Long, String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got2(3L)._3 == 1L, got2.toString)
    assert(got2(4L)._3 == 1L, got2.toString)
  }

}

class NbLangSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog in the park"),
    (2L, "en", "it is a truth universally acknowledged that the man is rich"),
    (3L, "en", "to be or not to be that is the question of the day"),
    (4L, "de", "der schnelle braune fuchs springt ueber den faulen hund im park"),
    (5L, "de", "es ist eine allgemein anerkannte wahrheit dass der mann reich ist"),
    (6L, "de", "sein oder nicht sein das ist die frage des tages heute")
  ).toDF("doc_id", "lang", "text")

  test("self-trained classifier separates distinct languages perfectly") {
    val got = graft.ops.NbLang.confusion(corpus)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("en", "en", 3L), ("de", "de", 3L)), got.toString)
  }

  test("confusion matrix conserves the doc count and is deterministic") {
    val a = graft.ops.NbLang.confusion(corpus).as[(String, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val b = graft.ops.NbLang.confusion(corpus).as[(String, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
    assert(a.map(_._3).sum == 6L)
  }

  test("buckets must be >= 2") {
    intercept[IllegalArgumentException] {
      graft.ops.NbLang.confusion(corpus, buckets = 1)
    }
  }

  test("native trigram kernel == composed per-position form") {
    // includes a doc of exactly 3 chars (one trigram) and one of 2
    // (drops on both paths), plus mixed case/whitespace normalization
    val edge = corpus.union(Seq(
      (7L, "en", "abc"), (8L, "de", "ab"), (9L, "en", "  MiXeD Case  ")
    ).toDF("doc_id", "lang", "text"))
    val kernel = graft.ops.NbLang.confusion(edge)
      .as[(String, String, Long)].collect().toSet
    val composed = graft.ops.NbLang.confusion(edge, kernelGrams = false)
      .as[(String, String, Long)].collect().toSet
    assert(kernel == composed, s"kernel=$kernel composed=$composed")
  }

}
