package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv:2112.11446, Appendix A1.1) — the rule battery every web-scale
  * pretraining pipeline runs before anything model-based. Each rule is
  * a document-level predicate; a doc is kept iff it passes all of them.
  *
  * Engine-stable by construction: every threshold is a RATIO test
  * evaluated by integer cross-multiplication (`3·nTok ≤ sumLen`, never
  * `sumLen/nTok ≥ 3.0`), so there is no float division, no rounding
  * mode, and nothing transcendental anywhere — the rule booleans and
  * the per-source counts are exact in any engine.
  *
  * Scale shape: one narrow map pass per document (token array built
  * once and shared by all rules), then a per-source count aggregate —
  * at 100 TB this fuses into the scan with a tiny final shuffle
  * (one row per source).
  */
object QualityRules {

  /** Per-rule pass flags over the text and its precomputed token array.
    * Returns a struct of booleans:
    *   word_count  — minWords ≤ nTok ≤ maxWords
    *   word_length — 3 ≤ mean token length ≤ 10 (cross-multiplied)
    *   symbol_ratio — (#'#' + #'...') · 10 ≤ nTok (symbol-to-word ≤ 0.1)
    *   alpha_words — ≥ 80% of tokens contain a letter (·5 ≥ ·4)
    *   stopwords   — ≥ 2 DISTINCT English stopwords present
    */
  def ruleFlags(text: Column, w: Column,
                minWords: Int = 30, maxWords: Int = 100000): Column = {
    val t = lower(trim(text))
    val nTok = size(w).cast("long")
    val sumLen = aggregate(transform(w, x => length(x).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val nEllipsis = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
    val stopHits = size(array_intersect(array_distinct(w),
      array(TextAnalysis.StopwordLists.head._2.map(lit): _*)))
    struct(
      (nTok >= minWords && nTok <= maxWords).as("word_count"),
      (lit(3L) * nTok <= sumLen && sumLen <= lit(10L) * nTok).as("word_length"),
      ((nHash + nEllipsis) * 10 <= nTok).as("symbol_ratio"),
      (nAlpha * 5 >= nTok * 4).as("alpha_words"),
      (stopHits >= 2).as("stopwords"))
  }

  /** Per-source funnel report: how many docs each rule rejects and how
    * many survive the whole battery — the observability summary a
    * cleaning job publishes per input source. One row per source.
    */
  def funnelBySource(docs: DataFrame, minWords: Int = 30,
                     sourceCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val flagged = docs
      .withColumn("__w", TextAnalysis.tokens(col(textCol)))
      .withColumn("__r", ruleFlags(col(textCol), col("__w"), minWords = minWords))
    def fails(rule: String): Column =
      sum(when(col(s"__r.$rule"), 0L).otherwise(1L)).as(s"n_fail_$rule")
    flagged.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        fails("word_count"), fails("word_length"), fails("symbol_ratio"),
        fails("alpha_words"), fails("stopwords"),
        sum(when(col("__r.word_count") && col("__r.word_length") &&
          col("__r.symbol_ratio") && col("__r.alpha_words") &&
          col("__r.stopwords"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Token-mass filter funnel: how many TOKENS (not docs) survive each
    * stage of the standard cleaning stack applied cumulatively —
    * raw → language gate → Gopher rule battery → exact-dedup keep →
    * length cap. Docs-surviving funnels (q94, [[funnelBySource]])
    * answer "how many documents"; a training-budget owner asks "how
    * many TOKENS", because that is what epochs are priced in and the
    * stages remove very differently-sized documents (dedup kills big
    * boilerplate, the length cap kills the longest tail — doc counts
    * hide both).
    *
    * Stage semantics (cumulative conjunction, all integer-exact):
    * lang = `keepLang`; gopher = all five [[ruleFlags]]; dedup keep =
    * the smallest doc_id of each exact-text (md5) group; cap =
    * token count ≤ `maxTokens`.
    *
    * Scale shape: one tokenize+flags projection per doc; the ONLY
    * exchange is the md5-partitioned rank window (bounded per dup
    * group) feeding a 5-row aggregate; stage rows ride one explode of
    * a 5-element literal-shaped array. Integer sums throughout — the
    * percentage is the only division, applied to two scalars per row.
    */
  def tokenFunnel(docs: DataFrame, keepLang: String = "en",
                  minWords: Int = 30, maxTokens: Int = 80,
                  idCol: String = "doc_id", textCol: String = "text",
                  langCol: String = "lang"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol).asc)
    // ADVICE r13: null text tokenizes/hashes as '' on BOTH engines
    // (Spark legacy sizeOfNull would yield -1 and md5(NULL) splits
    // hash groups differently than the oracle)
    val txt = coalesce(col(textCol), lit(""))
    val per = docs
      .withColumn("__w", TextAnalysis.tokens(txt))
      .withColumn("__nt", size(col("__w")).cast("long"))
      .withColumn("__r", ruleFlags(txt, col("__w"), minWords = minWords))
      .withColumn("__h", md5(txt.cast("binary")))
      .withColumn("__c1", col(langCol) === keepLang)
      .withColumn("__c2", col("__c1") &&
        col("__r.word_count") && col("__r.word_length") &&
        col("__r.symbol_ratio") && col("__r.alpha_words") &&
        col("__r.stopwords"))
      // dedup keep AMONG stage-2 survivors (pipelines dedup what they
      // kept, not the raw crawl): keep iff this doc survived stage 2
      // and no smaller-id stage-2 survivor shares its exact text
      .withColumn("__prior", coalesce(
        sum(when(col("__c2"), 1L).otherwise(0L)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .withColumn("__c3", col("__c2") && col("__prior") === 0L)
      .withColumn("__c4", col("__c3") && col("__nt") <= maxTokens)
    def stage(flag: Column, nm: String): Column = struct(
      sum(when(flag, 1L).otherwise(0L)).as(s"d"),
      coalesce(sum(when(flag, col("__nt"))), lit(0L)).as(s"t"),
      lit(nm).as("nm"))
    val agg = per.agg(
      stage(lit(true), "0_raw").as("s0"),
      stage(col("__c1"), "1_lang").as("s1"),
      stage(col("__c2"), "2_gopher").as("s2"),
      stage(col("__c3"), "3_dedup").as("s3"),
      stage(col("__c4"), "4_len_cap").as("s4"))
    agg
      .select(posexplode(array(col("s0"), col("s1"), col("s2"), col("s3"),
        col("s4"))).as(Seq("__i", "__s")), col("s0.t").as("__raw"))
      .select(col("__i").cast("long").as("stage"),
        col("__s.nm").as("stage_name"),
        col("__s.d").as("n_docs"),
        col("__s.t").as("n_tokens"),
        when(col("__raw") > 0,
          round(col("__s.t").cast("double") / col("__raw").cast("double"), 6))
          .as("token_frac_of_raw"))
  }
}
