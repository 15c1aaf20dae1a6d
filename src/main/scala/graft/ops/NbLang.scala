package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes language classifier over hashed character
  * trigrams — the classic generative text classifier (McCallum & Nigam
  * 1998), trained from the corpus's own labels in ONE aggregate pass
  * (closed-form counts, no iterative optimization) and applied back to
  * every document. The confusion matrix it emits is the standard
  * audit for a labeling model before it is trusted to pseudo-label
  * unlabeled data (complements q93's centroid pseudo-labeler, which is
  * embedding-space; this one is surface-text).
  *
  * Engine-stable by the DSIR rule (the r7 q101 lesson): the only
  * transcendentals — per-(bucket, class) smoothed log-likelihoods and
  * per-class log-priors — are computed once from exact integer counts
  * and immediately quantized to integer micro-nats; per-document
  * class scores are then integer dot products and the argmax compares
  * integers, so no float ever crosses an engine boundary.
  *
  * Scale shape: features are a map-side explode to (doc, bucket)
  * carrying no text; training is one hash-partitioned aggregate over
  * ≤ `buckets` keys (map-side combine does the heavy lifting); the
  * model — `buckets` rows × nLangs integer columns — broadcasts back
  * onto the feature stream; scoring is one per-doc sum. The corpus
  * shuffles only (doc_id, small-int) pairs. At 100 TB: train on a
  * labeled sample, broadcast the same model over the full corpus.
  */
object NbLang {

  /** Class labels in tie-break priority order (argmax ties resolve to
    * the earliest). Matches the synthetic corpus's lang domain.
    */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  private def md560(c: Column): Column =
    graft.functions.HashFunctions.md5Int60(c)

  /** Confusion matrix of the self-trained classifier: one row per
    * (lang, pred_lang) observed pair — (lang, pred_lang, n_docs).
    * Docs shorter than 3 chars carry no trigram evidence and are
    * omitted from the matrix.
    */
  def confusion(docs: DataFrame, buckets: Int = 2048,
                idCol: String = "doc_id", langCol: String = "lang",
                textCol: String = "text",
                kernelGrams: Boolean = true): DataFrame = {
    require(buckets >= 2, s"NbLang: buckets must be >= 2, got $buckets")
    // kernel path: one long-array of trigram hashes per doc (the q108
    // KgramHashes kernel at k=3 — identical md5Int60 contract), then an
    // explode that carries NO text. The composed path explodes a row
    // PER CHARACTER POSITION with the full document string attached —
    // at the 100× battery that materialized ~148 M text copies through
    // the checkpoint and died with UNABLE_TO_ACQUIRE_MEMORY (r12); the
    // kernel form runs the same corpus in seconds. Composed form kept
    // as the spec-asserted equivalence witness.
    val grams =
      if (kernelGrams)
        docs
          .select(col(idCol), col(langCol), lower(trim(col(textCol))).as("__t"))
          .filter(length(col("__t")) >= 3)
          .select(col(idCol), col(langCol),
            explode(graft.functions.KgramHashes(col("__t"), 3)).as("__h"))
          .select(col(idCol), col(langCol), (col("__h") % buckets).as("b"))
      else docs
        .select(col(idCol), col(langCol), lower(trim(col(textCol))).as("__t"))
        .filter(length(col("__t")) >= 3)
        .select(col(idCol), col(langCol),
          explode(sequence(lit(1), length(col("__t")) - 2)).as("pos"), col("__t"))
        .select(col(idCol), col(langCol),
          (md560(expr("substring(__t, pos, 3)")) % buckets).as("b"))
    // NO corpus-sized intermediate anywhere (the r12 lesson — the old
    // per-(doc, bucket) feats frame, ~250 rows/doc, was materialized for
    // reuse and starved the aggregates' execution memory at the 100×
    // battery: AGGREGATE_OUT_OF_MEMORY under the 8g harness heap).
    // Instead the gram stream is consumed TWICE — once by training, once
    // by scoring — and both consumers collapse it map-side: training
    // partial-aggregates to ≤ `buckets` keys per task, scoring to
    // docs-per-partition keys. Recomputing the grams costs one extra
    // kernel pass (seconds at 100×, now that KgramHashes replaced the
    // per-position expression tree); in exchange nothing corpus-sized is
    // ever stored, shuffled wide, or spilled — the shape that survives
    // 100 TB, and measured 4.6× faster than the persist form at 100×
    // (88.9 s → 19.2 s).

    // training: per-(bucket, class) occurrence counts — one shuffle over
    // <= `buckets` keys (each gram contributes 1; map-side combine does
    // the heavy lifting)
    val ccCols = Langs.map(l =>
      sum(when(col(langCol) === l, 1L).otherwise(0L)).as(s"c_$l"))
    // ≤ buckets rows, read by totals AND the model projection —
    // checkpoint so the training aggregate over the corpus runs once
    val classCounts = grams.groupBy(col("b")).agg(ccCols.head, ccCols.tail: _*)
      .localCheckpoint(eager = true)
    // per-class feature totals + per-class doc counts (priors)
    val ttCols = Langs.map(l => sum(col(s"c_$l")).as(s"t_$l"))
    val totals = classCounts.agg(ttCols.head, ttCols.tail: _*)
    val dcCols = count(lit(1)).as("n_all") +:
      Langs.map(l => sum(when(col(langCol) === l, 1L).otherwise(0L)).as(s"d_$l"))
    val docCounts = docs.agg(dcCols.head, dcCols.tail: _*)

    // model: add-one smoothed log-likelihood per (bucket, class) in
    // integer micro-nats — the ONLY transcendental, quantized at the
    // bucket, never at the doc
    val model = classCounts.crossJoin(broadcast(totals))
      .select((col("b") +: Langs.map(l =>
        round(log((col(s"c_$l") + 1).cast("double") /
          (col(s"t_$l") + buckets).cast("double")) * 1e6)
          .cast("long").as(s"l_$l"))): _*)
    val priors = docCounts.select(Langs.map(l =>
      round(log(col(s"d_$l").cast("double") / col("n_all").cast("double")) * 1e6)
        .cast("long").as(s"p_$l")): _*)

    // scoring: second gram pass, model broadcast onto the stream, one
    // integer sum per (doc, class) — each occurrence adds its bucket's
    // log-likelihood once, identical totals to the old n × loglik form
    val ssCols = Langs.map(l => sum(col(s"l_$l")).as(s"s_$l"))
    val scored = grams.join(broadcast(model), "b")
      .groupBy(col(idCol), col(langCol))
      .agg(ssCols.head, ssCols.tail: _*)
      .crossJoin(broadcast(priors))
      .select((col(idCol) +: col(langCol) +:
        Langs.map(l => (col(s"s_$l") + col(s"p_$l")).as(s"s_$l"))): _*)
    val best = greatest(Langs.map(l => col(s"s_$l")): _*)
    val pred = Langs.foldRight[Column](lit("unknown")) { (l, rest) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
      .groupBy(col(langCol), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
