package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.stats.Stats

/** Continuously-maintained event-time disorder monitor — the streaming
  * twin of q171's watermark-sizing audit. The batch audit answers "what
  * watermark should this pipeline have?" once; production needs the same
  * answer MAINTAINED, because disorder drifts (a new upstream buffer, a
  * mobile client cohort, a backfill) and a watermark sized last quarter
  * silently starts dropping today's tail.
  *
  * Lateness histograms are mergeable by SUM — with one catch: lateness
  * is measured against the RUNNING MAX event time over arrival order, so
  * a later segment's histogram is only correct if it knows the max the
  * earlier segments reached. That scalar is the high-water mark, carried
  * across micro-batches as a dedicated `__hwm` row in the same
  * [[PartialStore]] layout (merged by MAX where the histogram rows merge
  * by SUM). Read side feeds the summed histogram through the SAME
  * finisher as the batch audit ([[Stats.finishLateness]]), so
  * stream == batch is structural, not coincidental (StreamingSpec
  * asserts it).
  *
  * At-least-once caveat: if a micro-batch crashes after writing its
  * partial and is retried, the retry reads a floor that already includes
  * its own batch's max — re-measured lateness can only be HIGHER, so a
  * retry degrades conservatively (over-reports disorder) rather than
  * under-sizing the watermark.
  */
object StreamingLateness {

  /** The `events` table shape for file-source streams. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** Reserved event_type for the high-water-mark carrier row. */
  val HwmType = "__hwm"

  /** Current high-water mark recorded in the store (None before the
    * first non-empty batch).
    */
  def hwmFromStore(spark: SparkSession, storeDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) return None
    spark.read.parquet(storeDir)
      .filter(col("event_type") === HwmType)
      .agg(max(col("lateness_s"))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  /** Stream event files from `srcDir`; append one partial per
    * micro-batch. Sequential micro-batch execution is what makes the
    * hwm chain sound — structured streaming runs one batch at a time,
    * so the mark is read from the store ONCE per run and threaded
    * forward in memory (re-reading the whole store before every batch
    * would make the run O(batches²) in store reads just to recover a
    * scalar the driver already knows).
    */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val rs = spark.readStream.schema(EventSchema)
    val rs2 = if (maxFilesPerTrigger > 0)
      rs.option("maxFilesPerTrigger", maxFilesPerTrigger) else rs
    var hwm: Option[Long] = hwmFromStore(spark, storeDir)
    rs2
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist() // read twice: batch max + lateness histogram
        try {
          val bmaxRow = batch.agg(max(unix_timestamp(col("ts")))).collect().head
          val bmax = if (bmaxRow.isNullAt(0)) None else Some(bmaxRow.getLong(0))
          val newHwm = (hwm.toSeq ++ bmax.toSeq).reduceOption(_ max _)
          val hist = Stats.latenessHistogram(batch, floorSec = hwm)
          val partial = newHwm match {
            case Some(h) => hist.unionByName(
              batch.sparkSession.range(1).select(
                lit(HwmType).as("event_type"), lit(h).as("lateness_s"),
                lit(1L).as("cnt")))
            case None => hist // empty first batch: no hwm yet
          }
          partial.write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
          hwm = newHwm
        } finally batch.unpersist()
      }
      .start()
  }

  /** Stream-so-far lateness histogram (hwm rows excluded, partials
    * summed) — the exact input shape [[Stats.finishLateness]] takes.
    */
  def histogramFromStore(spark: SparkSession, storeDir: String): DataFrame = {
    PartialStore.guardedRead(spark, storeDir, "histogramFromStore")
      .filter(col("event_type") =!= HwmType)
      .groupBy(col("event_type"), col("lateness_s"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** The q171 audit over everything streamed so far — same finisher as
    * the batch audit, by construction.
    */
  def auditFromStore(spark: SparkSession, storeDir: String): DataFrame =
    Stats.finishLateness(histogramFromStore(spark, storeDir))

  /** Collapse per-batch partials into `batch_id=-1`: histogram rows
    * merge by SUM, the hwm row by MAX — both closed under re-merging.
    */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) = {
    val hwm = spark.read.parquet(storeDir)
      .filter(col("event_type") === HwmType)
      .agg(max(col("lateness_s")).as("lateness_s"))
      .select(lit(HwmType).as("event_type"), col("lateness_s"),
        lit(1L).as("cnt"))
      .filter(col("lateness_s").isNotNull)
    PartialStore.compact(spark, storeDir,
      histogramFromStore(spark, storeDir).unionByName(hwm))
  }
}
