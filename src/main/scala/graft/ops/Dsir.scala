package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET distribution (the
  * domain you want more of — e.g. a trusted high-quality subset) than
  * under the raw corpus distribution. Selecting/resampling by this
  * importance weight tilts a 100 TB crawl toward the target domain
  * without training a classifier.
  *
  * Faithful to the paper's recipe: features are hashed word bigrams in
  * `buckets` buckets, both distributions are add-one smoothed bag-of-
  * feature models, and a doc's log importance weight is the sum of its
  * features' log-likelihood ratios ln(p_target(b) / p_raw(b)).
  *
  * Engine-stable by construction (the r7 q101 lesson): the ONLY
  * transcendental — the per-BUCKET log ratio — is computed once per
  * bucket from exact integer counts and immediately quantized to
  * integer micro-nats (round(ln(·)·1e6) as LONG). Per-doc weights are
  * then pure integer sums, so summation order, libm-vs-Math.log ulps,
  * and float rounding modes cannot flip a comparison: the weight
  * column itself is hash-exact across engines, not just the ranking.
  *
  * Scale shape: one map-side explode to (id, bucket) — never the text;
  * one hash-partitioned count over ≤ `buckets` keys yields BOTH
  * distributions (target counted by a conditional sum inside the same
  * aggregate — one shuffle, not two); the ≤ `buckets`-row ratio table
  * broadcasts back onto the feature stream; the per-doc sum shuffles
  * (id, long) pairs only. Nothing driver-side, no global sort.
  */
object Dsir {

  /** Per-doc integer importance weight in micro-nats.
    * `isTarget` marks the target-domain rows (a Column predicate over
    * `docs`); output = (idCol, weight: long), one row per doc with at
    * least one bigram.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        buckets: Int = 1024,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        kernelGrams: Boolean = true): DataFrame = {
    require(buckets >= 2, s"Dsir: buckets must be >= 2, got $buckets")
    // kernel path: one long-array of token-bigram md5Int60 hashes per
    // doc (TokenBigramHashes, the r12 kernel discipline) — no per-bigram
    // string construction or md5-hex-parse tree. Composed form kept as
    // DsirSpec's equivalence witness.
    val bgs =
      if (kernelGrams)
        docs.select(col(idCol), isTarget.as("__tgt"),
            explode(graft.functions.TokenBigramHashes(col(textCol))).as("__h"))
          .select(col(idCol), col("__tgt"), (col("__h") % buckets).as("b"))
      else {
        val w = graft.text.TextAnalysis.tokens(col(textCol))
        docs
          .select(col(idCol), isTarget.as("__tgt"), w.as("__w"))
          .select(col(idCol), col("__tgt"),
            explode(when(size(col("__w")) >= 2,
              transform(sequence(lit(0), size(col("__w")) - 2),
                i => concat_ws(" ", element_at(col("__w"), i + 1),
                  element_at(col("__w"), i + 2))))
              .otherwise(array().cast("array<string>"))).as("bg"))
          .select(col(idCol), col("__tgt"),
            (graft.functions.HashFunctions.md5Int60(col("bg")) % buckets).as("b"))
      }
    // one aggregate, both distributions: raw count + target-flagged count
    // (≤ buckets rows; checkpointed because totals AND the ratio join
    // both read it — otherwise the feature pass over the corpus reruns)
    val counts = bgs.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
      .localCheckpoint(eager = true)
    val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    // add-one smoothed log ratio, quantized to integer micro-nats PER
    // BUCKET — the only transcendental in the operator
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log(
          ((col("ct") + 1).cast("double") / (col("nt") + buckets).cast("double")) /
          ((col("cr") + 1).cast("double") / (col("nr") + buckets).cast("double"))
        ) * 1e6).cast("long").as("l"))
    bgs.join(broadcast(ratios), "b")
      .groupBy(col(idCol))
      .agg(sum(col("l")).as("weight"))
  }
}
