package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.stats.CountMin
import graft.text.TextAnalysis

/** Continuously-maintained count-min sketch: the streaming form of
  * [[graft.stats.CountMin]], exploiting the sketch's mergeability —
  * cell counts are additive, so each micro-batch appends its own
  * partial cells (≤ depth × width rows per batch) and the current
  * sketch is a groupBy-sum over the store. No state store, no
  * read-modify-write: per-batch cost is O(batch tokens), store size is
  * O(batches × depth × width) until compaction, and the merged sketch
  * equals the batch sketch over all data EXACTLY (asserted in
  * StreamingSpec) — the heavy-hitter monitor a 100 TB token firehose
  * needs.
  */
object StreamingCountMin {

  /** Stream document files from `srcDir`, append each micro-batch's
    * partial sketch cells to `storeDir`.
    */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
            checkpointDir: String, depth: Int = 4,
            width: Int = 64): StreamingQuery =
    spark.readStream
      .schema(StreamingIngest.DocumentSchema)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val toks = batch
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .filter(col("token") =!= "")
        // batchId-keyed subdir + overwrite = idempotent under foreachBatch's
        // at-least-once replay (a crash between append and checkpoint
        // commit re-runs the batch; a blind append would double-count it)
        CountMin.build(toks, "token", depth, width)
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()

  /** The current sketch: merge all partial cells by addition (the
    * batch_id partition column from the idempotent layout is ignored).
    */
  def sketchFromStore(spark: SparkSession, storeDir: String): DataFrame = {
    PartialStore.guardedRead(spark, storeDir, "sketchFromStore")
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }
}
