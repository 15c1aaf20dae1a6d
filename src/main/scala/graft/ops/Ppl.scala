package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020,
  * arXiv:1911.00359): score every document by its cross-entropy under a
  * language model trained on a TRUSTED target corpus, then split each
  * language into head / middle / tail thirds by that score — the
  * classic web-crawl quality triage (keep head, inspect middle, drop
  * tail). The paper uses a KenLM 5-gram model; offline here, the LM is
  * an add-one-smoothed hashed word-bigram unigram-of-features model
  * trained on the `isTarget` subset in one aggregate pass — the same
  * feature family as [[Dsir]], which cites the same engine-stability
  * rules.
  *
  * Engine-stable by the DSIR rule (the r7 q101 lesson): the only
  * transcendental — the per-feature smoothed negative log-likelihood —
  * is computed from exact integer counts and immediately quantized to
  * integer micro-nats, so each doc's total NLL is an exact integer.
  * Bucket assignment orders docs within a language by mean NLL
  * (integer ÷ integer — one exactly-rounded IEEE division, stable
  * across engines) with an id tie-break, then cuts thirds by row
  * number — rank-based, like the repo's other comparison surfaces.
  *
  * Scale shape: features are a map-side explode carrying no text; the
  * model is ONE hash-partitioned aggregate over ≤ `buckets` keys and
  * broadcasts back; per-doc NLL shuffles (id, long) pairs only. The
  * thirds-cut runs row_number + count over a per-language window — at
  * 100 TB you would instead take per-language NLL cutoffs from a
  * sample (approx percentiles) and assign map-side; the windowed form
  * is the exact-gate phrasing and the largest partition is one
  * language, not the corpus.
  */
object Ppl {

  /** Per-(lang, bucket) triage summary: (langCol, bucket, n_docs,
    * sum_nll, sum_bigrams) where bucket 0/1/2 = head/middle/tail by
    * ascending mean NLL. Docs with no bigram carry no LM evidence and
    * are omitted.
    */
  def pplBuckets(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
                 idCol: String = "doc_id", langCol: String = "lang",
                 textCol: String = "text",
                 kernelGrams: Boolean = true): DataFrame = {
    require(buckets >= 2, s"Ppl: buckets must be >= 2, got $buckets")
    // hashed word-bigram features — the same md5Int60("tok1 SP tok2")
    // values as Dsir's stream, so the two operators share one oracle
    // vocabulary. Kernel path (r19, guide §1.2): TokenBigramHashes
    // digests each bigram window in one codegen pass — no per-bigram
    // string construction or md5-hex-parse tree; this stream is walked
    // TWICE (LM training pass + scoring pass), so the per-row saving
    // lands double. Composed form kept as PplSpec's equivalence witness.
    val bgs =
      if (kernelGrams)
        docs.select(col(idCol), col(langCol), isTarget.as("__tgt"),
            explode(graft.functions.TokenBigramHashes(col(textCol))).as("__h"))
          .select(col(idCol), col(langCol), col("__tgt"),
            (col("__h") % buckets).as("b"))
      else {
        val w = graft.text.TextAnalysis.tokens(col(textCol))
        docs
          .select(col(idCol), col(langCol), isTarget.as("__tgt"), w.as("__w"))
          .select(col(idCol), col(langCol), col("__tgt"),
            explode(when(size(col("__w")) >= 2,
              transform(sequence(lit(0), size(col("__w")) - 2),
                i => concat_ws(" ", element_at(col("__w"), i + 1),
                  element_at(col("__w"), i + 2))))
              .otherwise(array().cast("array<string>"))).as("bg"))
          .select(col(idCol), col(langCol),
            col("__tgt"),
            (graft.functions.HashFunctions.md5Int60(col("bg")) % buckets).as("b"))
      }
    // LM: target-subset feature counts; unseen buckets get the same
    // smoothed floor via the left join's coalesce
    // ≤ buckets rows, used by the total AND the scoring join —
    // checkpoint so the training pass over the corpus runs exactly once
    val counts = bgs.filter(col("__tgt")).groupBy(col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val total = counts.agg(sum(col("c")).as("n"))
    val scored = bgs
      .join(broadcast(counts), Seq("b"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol), col(langCol),
        (-round(log(
          (coalesce(col("c"), lit(0L)) + 1).cast("double") /
            (col("n") + buckets).cast("double")) * 1e6)).cast("long").as("l"))
      .groupBy(col(idCol), col(langCol))
      .agg(sum(col("l")).as("nll"), count(lit(1)).as("nb"))
    val byLang = Window.partitionBy(col(langCol))
    val ordered = byLang.orderBy(
      (col("nll").cast("double") / col("nb")).asc, col(idCol).asc)
    scored
      .withColumn("__r", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(byLang))
      // integer division (`div`), NOT floor(a/b): the double division
      // rounds to nearest, so a quotient a hair under an integer can
      // round up and misassign the boundary doc at large __n
      .withColumn("bucket", expr("((__r - 1) * 3) div __n"))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nll")).as("sum_nll"),
        sum(col("nb")).as("sum_bigrams"))
  }
}
