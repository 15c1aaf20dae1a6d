package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture optimization for pretraining data: a deterministic,
  * all-integer variant of DoReMi's multiplicative-weights reweighting
  * ("DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining", Xie et al. 2023). DoReMi trains a proxy model and
  * upweights domains with high excess loss; offline, with no model in the
  * loop, the same control law runs against a static per-domain difficulty
  * proxy — here the mean CLIPPED INVERSE TOKEN FREQUENCY of the domain's
  * text under the corpus unigram distribution (rarer tokens ⇒ "harder"
  * domain), which needs no transcendentals, so both engines agree
  * bit-for-bit (the q101/q132 lesson: ln/exp boundary rounding is the
  * cross-engine hash-miss factory; integer rationals are not).
  *
  * The reference engine has no mixture tooling at all; this is part of the
  * training-data surface the Spark build adds on top of it.
  *
  * All arithmetic is 64-bit integer with explicit `div` floors:
  *  - rarity_milli(tok)  = min((T * 1000) div c_tok, capMilli)
  *  - loss_d             = (Σ_occurrences rarity_milli) div n_tokens_d
  *  - iterate `iterations`× over the |domains|-row frame:
  *      avg   = (Σ w·loss) div (Σ w)         (weighted mean difficulty)
  *      f     = 1e6 ± (|loss−avg|·etaPpm) div max(avg,1), clamped to
  *              [250_000, 4_000_000]          (multiplicative-weights step)
  *      w     = max((w·f) div 1e6, 1)
  *  - weight_ppm = (w · 1e6) div Σ w
  * The CASE-split on the sign of (loss − avg) keeps every division
  * non-negative: Spark's `div` truncates toward zero while DuckDB's `//`
  * floors, and they only disagree on negative operands.
  *
  * Scale posture: two hash aggregates over the token stream (corpus-scale,
  * map-side combined), one vocabulary-scale join (token counts never
  * broadcast — vocabulary is unbounded at 100 TB), then every window runs
  * on the |domains|-row frame (tens of rows). The token-count pass is
  * localCheckpointed because both the vocabulary totals and the per-domain
  * join consume it (the q112 lesson: reused heavy subplans recompute
  * unless cut).
  *
  * Overflow audit (64-bit): w ≤ 1e6·4^iterations (2.56e8 at 4); loss ≤
  * capMilli = 1e9; w·loss ≤ 2.56e17; (loss−avg)·etaPpm ≤ 2.5e14;
  * Σ cnt·rarity ≤ n_d·1e9 — safe for domains up to ~9e9 tokens, far past
  * any single domain this runs on per-job. The iteration count is
  * REQUIRED into the audited range at call time (derived from
  * rarityCapMilli, 16× dispersion allowance): past it the window sums
  * wrap silently, which is worse than failing.
  */
object Mixture {

  def doremiWeights(docs: DataFrame, iterations: Int = 4,
                    etaPpm: Long = 250000L, rarityCapMilli: Long = 1000000000L,
                    sourceCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    require(etaPpm > 0 && rarityCapMilli > 0,
      s"need positive etaPpm/rarityCapMilli, got $etaPpm/$rarityCapMilli")
    // 64-bit guard, derived from the actual cap rather than a fixed 16:
    // w ≤ 1e6·4^i and loss ≤ rarityCapMilli, so the dominant window term
    // w·loss reaches 1e6·4^i·cap; a 16× dispersion allowance covers the
    // other domains' (necessarily smaller — growth requires being above
    // the weighted average) contributions to Σ w·loss. Beyond this the
    // sums wrap SILENTLY (no ANSI error inside window partials), so fail
    // fast here. Default cap 1e9 → max 4 iterations, exactly the default.
    val maxSafeIters = Iterator.from(1)
      .takeWhile(i => BigInt(16) * BigInt(1000000L) * BigInt(4).pow(i) *
        BigInt(rarityCapMilli) <= BigInt(Long.MaxValue))
      .foldLeft(0)((_, i) => i)
    require(iterations >= 1 && iterations <= maxSafeIters,
      s"need 1 <= iterations <= $maxSafeIters (64-bit-safe bound at " +
        s"rarityCapMilli=$rarityCapMilli), got $iterations")
    val toks = docs.select(col(sourceCol),
      explode(filter(graft.text.TextAnalysis.tokens(col(textCol)),
        t => t =!= "")).as("tok"))
    val stc = toks.groupBy(col(sourceCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tokc = stc.groupBy("tok").agg(sum("cnt").as("c"))
    val tot = tokc.agg(sum("c").as("t"))
    val rarity = tokc.crossJoin(broadcast(tot))
      .select(col("tok"), col("t"),
        least(expr("(t * 1000) div c"), lit(rarityCapMilli)).as("rarity_milli"))
    val perSource = stc.join(rarity, "tok")
      .groupBy(sourceCol)
      .agg(sum("cnt").as("n_tokens"),
        sum(expr("cnt * rarity_milli")).as("sum_rarity"),
        max("t").as("t"))
      .withColumn("loss", expr("sum_rarity div n_tokens"))
      .withColumn("w", lit(1000000L))
    val wAll = Window.partitionBy()
    val iterated = (1 to iterations).foldLeft(perSource) { (d, _) =>
      d.withColumn("__wl", sum(col("w") * col("loss")).over(wAll))
        .withColumn("__ws", sum(col("w")).over(wAll))
        .withColumn("__avg", expr("__wl div __ws"))
        .withColumn("__f",
          when(col("loss") >= col("__avg"),
            lit(1000000L) + expr(s"((loss - __avg) * $etaPpm) div greatest(__avg, 1)"))
          .otherwise(
            lit(1000000L) - expr(s"((__avg - loss) * $etaPpm) div greatest(__avg, 1)")))
        .withColumn("__fc", least(greatest(col("__f"), lit(250000L)), lit(4000000L)))
        .withColumn("w", greatest(expr("(w * __fc) div 1000000"), lit(1L)))
        .drop("__wl", "__ws", "__avg", "__f", "__fc")
    }
    iterated
      .withColumn("base_ppm", expr("(n_tokens * 1000000) div t"))
      .withColumn("__wsum", sum(col("w")).over(wAll))
      .withColumn("weight_ppm", expr("(w * 1000000) div __wsum"))
      .select(col(sourceCol), col("n_tokens"), col("loss"),
        col("base_ppm"), col("weight_ppm"))
  }
}
