package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) span transform — the training-data mechanic
  * that rewrites a fraction of documents as (prefix, middle, suffix) so a
  * causal LM learns infilling (Bavarian et al. 2022, "Efficient Training
  * of Language Models to Fill in the Middle", arXiv:2207.14255; the
  * PSM/SPM permutation happens at sequence assembly — this operator owns
  * the deterministic span selection and its corpus-level accounting).
  *
  * Everything is RNG-free: the apply gate and both cut points derive from
  * md5(doc_id) buckets, the same replayable-hash discipline as the q42
  * hash split, so any engine (and the DuckDB oracle) reconstructs the
  * exact same spans. Per doc of length n (chars, n > 0):
  *
  *  - applied      iff h("fim:"+id)   % 1000 < ratePerMille
  *  - c1         = h("fimc1:"+id) % (n+1)          — 0 <= c1 <= n
  *  - c2         = c1 + h("fimc2:"+id) % (n-c1+1)  — c1 <= c2 <= n
  *  - prefix = text[0, c1), middle = text[c1, c2), suffix = text[c2, n)
  *
  * (h = first 8 hex chars of md5, so uniform in [0, 2^32) — far above
  * any document length; the mod bias is ~n/2^32, irrelevant for span
  * statistics.) Unapplied docs keep the whole text as prefix.
  *
  * Scale shape: [[spans]] is a pure per-row projection (codegen, zero
  * shuffle) — the 100 TB plan is scan → project, embarrassingly
  * parallel; [[sourceStats]] adds one hash aggregate on the source key.
  */
object Fim {
  private def h32(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string")).cast("binary")), 1, 8),
      16, 10).cast("long")

  /** Per-document FIM spans over `textCol` (rows with empty text are
    * dropped — there is nothing to split). Output columns: idCol,
    * `applied`, `c1`, `c2`, `n`, and the three span strings `prefix`,
    * `middle`, `suffix` (substr is 1-based; middle = (c1, c2]).
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            ratePerMille: Int = 900): DataFrame = {
    require(ratePerMille >= 0 && ratePerMille <= 1000,
      s"ratePerMille must be in [0, 1000], got $ratePerMille")
    val id = col(idCol)
    val n = length(col(textCol))
    val applied = h32("fim:", id) % 1000 < lit(ratePerMille)
    val c1Raw = h32("fimc1:", id) % (n + lit(1))
    val c1 = when(applied, c1Raw).otherwise(lit(0L))
    val c2 = when(applied, c1Raw + h32("fimc2:", id) % (n - c1Raw + lit(1)))
      .otherwise(lit(0L))
    docs.filter(n > 0)
      .withColumn("applied", applied)
      .withColumn("c1", c1.cast("long"))
      .withColumn("c2", c2.cast("long"))
      .withColumn("n", n.cast("long"))
      // substring(Column, Int, Int) only takes literal lengths; expr-based
      // slicing keeps the span lengths columnar.
      .withColumn("prefix", expr(s"substr($textCol, 1, c1)"))
      .withColumn("middle", expr(s"substr($textCol, c1 + 1, c2 - c1)"))
      .withColumn("suffix", expr(s"substr($textCol, c2 + 1, n - c2)"))
  }

  /** Corpus accounting of the FIM transform per `groupCol`: how many docs
    * were rewritten, the mean span fractions among rewritten docs, and
    * the total middle-span mass (the infilling training signal volume).
    * Fractions are doubles rounded to 6 (cross-engine discipline).
    */
  def sourceStats(docs: DataFrame, idCol: String, textCol: String,
                  groupCol: String, ratePerMille: Int = 900): DataFrame = {
    val sp = spans(docs, idCol, textCol, ratePerMille)
    val nd = col("n").cast("double")
    sp.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("applied"), 1L).otherwise(0L)).as("n_fim"),
        round(avg(when(col("applied"), col("c1") / nd)), 6).as("avg_prefix_frac"),
        round(avg(when(col("applied"), (col("c2") - col("c1")) / nd)), 6).as("avg_middle_frac"),
        round(avg(when(col("applied"), (col("n") - col("c2")) / nd)), 6).as("avg_suffix_frac"),
        sum(when(col("applied"), col("c2") - col("c1")).otherwise(0L)).as("middle_chars"))
  }
}
