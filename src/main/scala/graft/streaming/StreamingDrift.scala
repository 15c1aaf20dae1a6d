package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.text.TextAnalysis

/** Continuously-maintained snapshot-drift monitor: the streaming form of
  * q106's PSI gate. Histogram counts are mergeable by SUM, so each
  * micro-batch appends its own (feature, bucket, cnt) partial rows —
  * same [[PartialStore]] layout as the HLL/quantile sketches — and
  * "PSI of the stream so far vs the reference snapshot" is a
  * groupBy-sum + one ≤-21-row join whenever anyone asks. The alerting
  * loop a crawl pipeline runs: reference = last trained-on snapshot,
  * stream = the incoming crawl; PSI above threshold pauses ingestion.
  *
  * Buckets mirror q106 exactly (quality ×10 → 11 buckets, token count
  * /20 capped → 10 buckets, add-one smoothing by the bucket-range
  * cardinality), so the streamed PSI equals the batch PSI over the same
  * rows (StreamingSpec asserts it).
  */
object StreamingDrift {

  val QualityBuckets = 11
  val LengthBuckets = 10

  /** (feature, bucket) rows of a document batch — TWO rows per doc (one
    * per feature), from a single scan. The one bucket definition every
    * consumer shares: the streaming partials, the batch PSI gate (q106),
    * and any future drift feature extension.
    */
  def featureBuckets(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val base = docs
      .withColumn("__w", TextAnalysis.tokens(col("text")))
      .select(keep.map(col) ++ Seq(
        TextAnalysis.qualityScoreFromTokens(col("text"), col("__w")).as("__q"),
        size(col("__w")).cast("long").as("__n_tokens")): _*)
    val q = base.select(keep.map(col) ++ Seq(lit("quality").as("feature"),
      floor(col("__q") * 10).cast("long").as("bucket")): _*)
    val l = base.select(keep.map(col) ++ Seq(lit("length").as("feature"),
      least(floor(col("__n_tokens") / 20), lit(9L)).cast("long").as("bucket")): _*)
    q.unionByName(l)
  }

  /** (feature, bucket, cnt) histogram of a document batch — the
    * mergeable partial both the stream and the reference side use.
    */
  def histogram(docs: DataFrame): DataFrame =
    featureBuckets(docs).groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** PSI between the two halves of ONE corpus scan, split by a boolean
    * column — the batch-gate (q106) form: at 100 TB, one pass with a
    * flag beats scanning the corpus once per side.
    */
  def psiPaired(docs: DataFrame, isRefCol: String): DataFrame =
    finishPsi(featureBuckets(docs, keep = Seq(isRefCol))
      .groupBy(col("feature"), col("bucket"))
      .agg(sum(when(col(isRefCol), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col(isRefCol), 1L).otherwise(0L)).as("n_cur")))

  /** Stream document files from `srcDir`, append each micro-batch's
    * histogram partial.
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
        histogram(batch)
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** Current stream-side histogram (fold the partials with one more sum). */
  def histogramFromStore(spark: SparkSession, storeDir: String): DataFrame = {
    PartialStore.guardedRead(spark, storeDir, "histogramFromStore")
      .groupBy(col("feature"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** PSI per feature between a reference histogram and a current one —
    * q106's math (add-one smoothing over the feature's full bucket-range
    * cardinality) over two ≤-21-row inputs. Buckets absent on one side
    * participate with count 0, exactly as q106's two-sided aggregate.
    */
  def psi(ref: DataFrame, cur: DataFrame): DataFrame =
    finishPsi(ref.withColumnRenamed("cnt", "n_ref")
      .join(cur.withColumnRenamed("cnt", "n_cur"),
        Seq("feature", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur")))

  /** Shared PSI finisher over a (feature, bucket, n_ref, n_cur) table. */
  private def finishPsi(wide: DataFrame): DataFrame = {
    val flagged = wide.withColumn("__nb",
      when(col("feature") === "quality", lit(QualityBuckets))
        .otherwise(lit(LengthBuckets)))
    val totals = flagged.groupBy(col("feature"))
      .agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    flagged.join(broadcast(totals), Seq("feature"))
      .withColumn("p_ref",
        (col("n_ref") + 1).cast("double") / (col("t_ref") + col("__nb")))
      .withColumn("p_cur",
        (col("n_cur") + 1).cast("double") / (col("t_cur") + col("__nb")))
      .groupBy(col("feature"))
      .agg(count(lit(1)).as("n_buckets"),
        round(sum((col("p_cur") - col("p_ref")) *
          log(col("p_cur") / col("p_ref"))), 6).as("psi"))
  }

  /** PSI of the stream so far against a reference document snapshot. */
  def psiFromStore(spark: SparkSession, storeDir: String,
                   refDocs: DataFrame): DataFrame =
    psi(histogram(refDocs), histogramFromStore(spark, storeDir))

  /** Collapse per-batch histogram partials into `batch_id=-1`. */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) =
    PartialStore.compact(spark, storeDir, histogramFromStore(spark, storeDir))
}
