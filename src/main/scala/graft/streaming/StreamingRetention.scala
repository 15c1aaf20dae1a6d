package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.stats.Stats

/** Continuously-maintained cohort retention: the streaming form of q158.
  *
  * Retention's minimal sufficient statistic is the distinct
  * (user, ISO-week) activity grid ([[graft.stats.Stats.activityGrid]]),
  * and grids are mergeable by union-distinct — so each micro-batch
  * appends its own grid partial under the shared [[PartialStore]]
  * batch_id layout, and "retention so far" is distinct-of-the-store fed
  * through the SAME batch finisher ([[graft.stats.Stats.retentionFromGrid]]).
  * One grid/retention definition, so stream == batch is structural (the
  * q106 drift-kernel discipline; StreamingSpec asserts it).
  *
  * State size: the store holds at most |users|·|weeks| rows — the
  * smallest exact mergeable state retention admits (cohort membership
  * depends on user identity, so per-(cohort, offset) counters alone
  * cannot merge); compaction collapses duplicate rows re-observed
  * across micro-batches. An approximate alternative would HLL the
  * user sets per (cohort-week, offset) — but cohort assignment still
  * needs each user's first week, so it shrinks state from
  * |users|·|weeks| to |users| + |weeks|²-bounded registers (a |weeks|
  * factor, not constant) at ±2% counts. The exact grid is the right
  * default at |users| ≪ |events|, which is what event streams look
  * like.
  */
object StreamingRetention {

  /** The events table shape (TESTDATA.md), for schema-on-read streams. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream event files from `srcDir`, appending each micro-batch's
    * distinct (user_id, week) grid partial.
    */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val rs = spark.readStream.schema(EventSchema)
    val rs2 = if (maxFilesPerTrigger > 0)
      rs.option("maxFilesPerTrigger", maxFilesPerTrigger) else rs
    rs2
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Stats.activityGrid(batch)
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** The stream-so-far activity grid: distinct of the stored partials
    * (a user re-active in the same week across micro-batches folds to
    * one row — union-distinct IS the merge).
    */
  def gridFromStore(spark: SparkSession, storeDir: String): DataFrame = {
    PartialStore.guardedRead(spark, storeDir, "gridFromStore")
      .select(col("user_id"), col("week"))
      .distinct()
  }

  /** Cohort retention of the stream so far — the batch finisher over the
    * merged grid.
    */
  def retentionFromStore(spark: SparkSession, storeDir: String): DataFrame =
    Stats.retentionFromGrid(gridFromStore(spark, storeDir))

  /** Collapse per-batch grid partials into `batch_id=-1` (dedups rows
    * re-observed across micro-batches; same crash-safe swap discipline
    * as every [[PartialStore]] consumer).
    */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) =
    PartialStore.compact(spark, storeDir, gridFromStore(spark, storeDir))
}
