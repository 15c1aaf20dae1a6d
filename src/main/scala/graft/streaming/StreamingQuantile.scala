package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.stats.QuantileSketch

/** Continuously-maintained log-linear quantile sketch: the streaming
  * form of [[graft.stats.QuantileSketch]] (q134), exploiting the
  * sketch's mergeability — bucket counts combine by SUM, so each
  * micro-batch appends its own ≤ |groups|·64·M partial bucket rows and
  * the current sketch is a groupBy-sum over the store. No state store,
  * no read-modify-write; "p50/p90/p99 document length per source so
  * far" over a 100 TB firehose for a few thousand stored longs, exactly
  * the q130 HLL discipline with sum in place of max.
  *
  * Sum is NOT idempotent, so the batchId-keyed subdir + overwrite
  * layout is what makes foreachBatch's at-least-once replay safe: a
  * replayed batch overwrites its own partial instead of double-adding.
  */
object StreamingQuantile {

  /** Stream document files from `srcDir`, append each micro-batch's
    * partial (source, bucket, cnt) rows over `n_chars`.
    * `maxFilesPerTrigger` > 0 caps files per micro-batch (AvailableNow
    * then drains the backlog as MANY batches — how the soak run drives
    * hundreds of micro-batches through one session).
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
        QuantileSketch.sketch(batch, "source", "n_chars")
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** Current sketch: fold the per-batch partials with one more sum (the
    * batch_id partition column from the idempotent layout is ignored).
    */
  def sketchFromStore(spark: SparkSession, storeDir: String): DataFrame = {
    PartialStore.guardedRead(spark, storeDir, "sketchFromStore")
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Current per-source quantile estimates at the given integer
    * percents — identical read-off rule to the batch path, so
    * stream == batch exactly (StreamingSpec asserts it).
    */
  def quantilesFromStore(spark: SparkSession, storeDir: String,
                         percents: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    QuantileSketch.quantilesFromSketch(
      sketchFromStore(spark, storeDir), "source", percents)

  /** Collapse the append-accumulated per-batch partials into one merged
    * partial under `batch_id=-1`. Sum-merge is associative and each
    * batch dir holds disjoint partials, so the merged sketch is
    * unchanged bucket-for-bucket (StreamingSpec asserts it).
    */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) =
    PartialStore.compact(spark, storeDir, sketchFromStore(spark, storeDir))

  /** Recover a store a compaction crash left mid-swap (the state
    * [[compactStore]] refuses to run over) — see [[PartialStore.restore]]
    * for the three recovery outcomes. The layout is shared by every
    * partial store, so this surface recovers the HLL and drift stores
    * too; it lives here so specs and operators reach it without opening
    * the `private[streaming]` plumbing.
    */
  def restoreStore(storeDir: String): String =
    PartialStore.restore(storeDir)
}
