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
}
