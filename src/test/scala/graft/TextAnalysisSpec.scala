package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId: stopword-hit heuristic with priority tie-break and unknown") {
    val got = Seq(
      "the cat sat on a mat and it is fine",   // en
      "le chat est sur la table et les murs",  // fr
      "der hund und die katze ist ein tier",   // de
      "xyzzy qwerty plugh"                     // no stopwords → unknown
    ).toDF("text").select(TextAnalysis.langId($"text")).as[String].collect()
    assert(got.toSeq == Seq("en", "fr", "de", "unknown"))
  }

  test("qualityScore lies in [0,1] and rewards diverse, stopword-bearing text") {
    val df = Seq(
      "the quick brown fox jumps over a lazy dog near the old riverbank today",
      "aa aa aa aa aa aa aa aa"
    ).toDF("text").select(TextAnalysis.qualityScore($"text").as("q"))
    val Array(good, bad) = df.as[Double].collect()
    assert(good >= 0 && good <= 1 && bad >= 0 && bad <= 1)
    assert(good > bad)
  }

  test("token counts: whitespace vs BPE-ish") {
    val row = Seq("Hello world, it's 42 degrees!").toDF("text")
      .select(TextAnalysis.tokenCount($"text"),
        TextAnalysis.bpeTokenCount($"text"))
      .as[(Int, Int)].head()
    assert(row._1 == 5)
    // hello | world | , | it | ' | s | 42 | degrees | ! = 9
    assert(row._2 == 9)
  }

  test("native LangId equals the expression phrasing on real docs (null-safe)") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq(Some(""), Some("la de la de"), Some("the of la de und ist"),
        Some("xyzzy qwerty"), None).toDF("text"))
      .withColumn("w", TextAnalysis.tokens(col("text")))
    val mism = docs.select(
        graft.functions.LangId(col("w")).as("native"),
        TextAnalysis.langIdFromTokens(col("w")).as("hof"))
      .filter(!(col("native") <=> col("hof"))) // null-safe: nulls can't hide
      .count()
    assert(mism == 0L)
    // null token array classifies as 'unknown' on BOTH forms, never null
    val nulls = docs.filter(col("w").isNull)
      .select(graft.functions.LangId(col("w"))).collect()
    assert(nulls.nonEmpty && nulls.forall(_.getString(0) == "unknown"))
  }

  test("native BPE count equals the regex phrasing on real docs + edge cases") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "   ", "a1b2!", "héllo wörld 中文 12a..b",
        "tab\tnewline\nmix 0x0B", "🎉🎉 emoji42").toDF("text"))
    val mism = docs.select(
        TextAnalysis.bpeTokenCount(col("text")).as("native"),
        TextAnalysis.bpeTokenCountRegex(col("text")).as("regex"))
      .filter(col("native") =!= col("regex"))
      .count()
    assert(mism == 0L)
  }

  test("native Fingerprints equals the expression phrasing on real docs") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "short", "exactly sixteen!", "🎉 unicode 中文 padding text here")
        .toDF("text"))
      .select(lower(trim(col("text"))).as("t"))
    val mism = docs.select(
        graft.functions.Fingerprints(col("t")).as("native"),
        TextAnalysis.fingerprintsOfNormalized("t").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mism == 0L)
  }

  test("fingerprints: deterministic, thinned, within 32-bit range") {
    val df = Seq("the quick brown fox jumps over the lazy dog repeatedly and often")
      .toDF("text")
    val a = df.select(TextAnalysis.fingerprints("text")).as[Seq[Long]].head()
    val b = df.select(TextAnalysis.fingerprints("text")).as[Seq[Long]].head()
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall(h => h % 16 == 0 && h >= 0 && h < (1L << 32)))
    assert(a.distinct == a)
  }

  test("fingerprints of short text (< k chars) hash the whole text") {
    val got = Seq("tiny").toDF("text")
      .select(TextAnalysis.fingerprints("text")).as[Seq[Long]].head()
    assert(got.length <= 1) // one gram, kept only if ≡0 mod 16
  }

  test("cleaningReasonFromTokens buckets by first matching reason") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      "one two three",  // 3 tokens → too_short
      // 16 distinct tokens incl stopwords → kept
      "the quick brown fox jumps over a lazy dog while it rains in march today again",
      // 16 tokens, only 2 distinct → low_diversity (checked before lang)
      "spam ham spam ham spam ham spam ham spam ham spam ham spam ham spam ham",
      // 16 distinct tokens, no stopwords from any list → unknown_lang
      "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12 k13 k14 k15 k16"
    ).toDF("text")
    val got = docs
      .select(TextAnalysis.cleaningReasonFromTokens(
        TextAnalysis.tokens(col("text"))).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("too_short", "kept", "low_diversity", "unknown_lang"))
  }

  test("native RepetitionRatio equals the expression phrasing on real docs") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "a b c d e", "x y z w v x y z w v x y z w v",
        "  leading spaces and  double  gaps here okay then",
        "\tTAB lead with Upper Case REPEAT repeat Repeat case upper")
        .toDF("text"))
    for (n <- Seq(2, 5)) {
      val mism = docs.select(
          graft.functions.RepetitionRatio(col("text"), n).as("native"),
          TextAnalysis.repetitionRatio(col("text"), n).as("hof"))
        .filter(!(col("native") <=> col("hof")))
        .count()
      assert(mism == 0L, s"native/HOF divergence at n=$n")
    }
  }

  test("repetitionRatio: 0 for short/distinct text, positive for repeats") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      "one two three",                          // < 5 words → 0
      "a b c d e f g h",                        // all 5-grams distinct → 0
      "x y z w v x y z w v x y z w v",          // heavy 5-gram repetition
      ""                                        // empty → 0
    ).toDF("text")
    val got = docs.select(TextAnalysis.repetitionRatio(col("text"), 5).as("r"))
      .as[Double].collect()
    assert(got(0) == 0.0)
    assert(got(1) == 0.0)
    // 15 words → 11 grams; unique grams of period-5 sequence = 5 → 6/11 repeats
    assert(math.abs(got(2) - 6.0 / 11.0) < 1e-12)
    assert(got(3) == 0.0)
  }

  test("redactPii replaces every class and leaves clean text untouched") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call 415-555-0199 or 415.555.0100",
      "card 4111111111111111 on file",
      "mixed a@b.io 415-555-0199 ref 123456789012",
      "clean text, short digits 12345, v1.2.3"
    ).toDF("text")
    val got = docs.select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect()
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "call <PHONE> or <PHONE>")
    assert(got(2) == "card <NUM> on file")
    assert(got(3) == "mixed <EMAIL> <PHONE> ref <NUM>")
    assert(got(4) == "clean text, short digits 12345, v1.2.3")
  }

  test("piiCounts audits each class on the unredacted text") {
    import org.apache.spark.sql.functions.col
    val got = Seq("a@b.io c@d.net 415-555-0100 9999888877776666 x")
      .toDF("text")
      .select(TextAnalysis.piiCounts(col("text")).as("p"))
      .select(col("p.emails"), col("p.phones"), col("p.long_nums"))
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 1L, 1L)))
  }
}
