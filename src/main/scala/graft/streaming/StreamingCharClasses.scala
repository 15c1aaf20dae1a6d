package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuously-maintained per-source character-class profile: the
  * streaming form of q196's entropy audit. The 28 class counts
  * ([[graft.functions.CharClassCounts]] — a–z, space, other) are
  * mergeable by SUM, so each micro-batch appends its own
  * (source, cls, cnt) partial rows — the same [[PartialStore]] layout
  * as the drift/HLL/quantile sketches — and "the source's aggregate
  * character distribution (and its entropy) over the stream so far"
  * is one groupBy-sum + a ≤-28-term finisher whenever anyone asks.
  * The monitoring loop a crawl pipeline runs: a source whose aggregate
  * char entropy collapses (one repeated char, binary junk) or spikes
  * (encoding noise) flags mid-crawl, without rescanning history.
  *
  * Note the streamed quantity is the entropy of the source's AGGREGATE
  * distribution (counts summed over all docs) — the natural mergeable
  * form — not q196's mean of per-doc entropies; both use the same
  * kernel counts and the same 9dp-ln / micro-unit float discipline,
  * and StreamingSpec pins stream == batch over the same rows plus
  * compaction idempotence.
  */
object StreamingCharClasses {

  /** Mergeable partial: (source, cls, cnt) — cls 0..27 in
    * [[graft.functions.CharClassCounts]] order, one kernel pass per doc.
    */
  def classCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        posexplode(graft.functions.CharClassCounts(
          coalesce(col("text"), lit("")))).as(Seq("cls", "cnt")))
      .groupBy(col("source"), col("cls"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Stream document files from `srcDir`, append each micro-batch's
    * class-count partial.
    */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val rs = spark.readStream.schema(StreamingIngest.DocumentSchema)
    val rs2 = if (maxFilesPerTrigger > 0)
      rs.option("maxFilesPerTrigger", maxFilesPerTrigger) else rs
    rs2
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        classCounts(batch)
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** Current stream-side counts (fold the partials with one more sum). */
  def countsFromStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.guardedRead(spark, storeDir, "countsFromStore")
      .groupBy(col("source"), col("cls"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Entropy of each source's aggregate character distribution from a
    * (source, cls, cnt) table: the q180/q187 float discipline — terms
    * folded in a deterministic (cls-sorted) order, each ln rounded to
    * 9dp, the result micro-integered. Zero-char sources read 0.
    */
  def finishEntropy(hist: DataFrame): DataFrame =
    hist.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_chars"),
        sort_array(collect_list(struct(col("cls"), col("cnt")))).as("__h"))
      .withColumn("entropy_micro", expr(
        "cast(round(-aggregate(__h, cast(0 as double), (a, e) -> a + " +
          "CASE WHEN e.cnt > 0 THEN (e.cnt / n_chars) * " +
          "round(ln(e.cnt / n_chars), 9) ELSE cast(0 as double) END) " +
          "* 1000000, 0) as long)"))
      .select(col("source"), col("n_chars"), col("entropy_micro"))

  /** Stream-so-far entropy per source. */
  def entropyFromStore(spark: SparkSession, storeDir: String): DataFrame =
    finishEntropy(countsFromStore(spark, storeDir))

  /** Collapse per-batch partials into `batch_id=-1`. */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) =
    PartialStore.compact(spark, storeDir, countsFromStore(spark, storeDir))
}
