package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Quality-first corpus selection under a token budget: keep the
  * best-scored documents whose running token total fits the budget —
  * the "fill a 10B-token training mix with the highest-quality docs"
  * step of an LLM data pipeline.
  *
  * Semantics: order docs by (quality DESC, id ASC), take the maximal
  * prefix whose inclusive running token sum is ≤ `budget`.
  *
  * The naive phrasing is a running sum over a GLOBAL ordering — a
  * single-partition Window, i.e. one reducer scanning the whole corpus;
  * a non-starter at 100 TB. This implementation gets the identical
  * result with no global sort:
  *   1. bucket docs by quality (`floor(q·buckets)` — monotone in q, so
  *      bucket order refines the global order),
  *   2. aggregate per-bucket token sums — the only full-data pass, a
  *      two-phase hash aggregate shuffling ≤ `buckets` rows,
  *   3. the driver prefix-sums the ≤ `buckets`-row bucket histogram
  *      into per-bucket offsets and DROPS every bucket whose offset
  *      already exceeds the budget (those docs can never be kept — the
  *      filter prunes them before any window work),
  *   4. a Window PARTITIONED BY bucket (never global) adds the
  *      within-bucket running sum to the broadcast-joined offset.
  * The largest window partition is one quality bucket (~1/`buckets` of
  * the corpus under any non-degenerate score distribution), and
  * surviving buckets are roughly those inside the budget, so the
  * window input is close to the OUTPUT size, not the corpus size.
  *
  * `qualityCol` must be in [0, 1) ∪ {1} and deterministic (round it —
  * ordering on an unrounded double is not reproducible across engines);
  * `idCol` must be unique, making the window ordering total and the
  * running sums exact.
  */
object TokenBudget {

  /** docs(idCol, qualityCol, tokenCol, …) → the kept prefix, original
    * columns plus `cum_tokens` (global inclusive running token sum).
    */
  def select(docs: DataFrame, idCol: String, qualityCol: String,
             tokenCol: String, budget: Long, buckets: Int = 1000): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val spark = docs.sparkSession
    val bucketed = docs.withColumn("__bucket",
      floor(col(qualityCol) * buckets).cast(LongType))

    // full-data pass #1: per-bucket token totals; ≤ buckets+1 rows reach
    // the driver, never documents
    val hist = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(tokenCol)).cast(LongType).as("__btok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)

    // offset(b) = tokens in strictly-higher buckets; a bucket whose
    // offset exceeds the budget is entirely outside the kept prefix
    // (token counts are non-negative), so it is pruned pre-window
    var acc = 0L
    val offsets = hist.map { case (b, tok) =>
      val row = Row(b, acc); acc += tok; row
    }.filter(_.getLong(1) <= budget)

    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      StructType(Seq(StructField("__bucket", LongType, nullable = false),
        StructField("__offset", LongType, nullable = false))))

    // within-bucket running sum; (quality, id) is a total order inside
    // the bucket, so offset + running = the global inclusive cumsum
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    bucketed
      .join(broadcast(offDf), "__bucket")
      .withColumn("cum_tokens",
        col("__offset") + sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__bucket", "__offset")
  }
}
