package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.stats.DistinctSketch

/** Continuously-maintained HyperLogLog registers: the streaming form of
  * [[graft.stats.DistinctSketch]], exploiting HLL's mergeability —
  * registers combine by max, so each micro-batch appends its own
  * ≤ |groups|·m partial register rows and the current sketch is a
  * groupBy-max over the store. No state store, no read-modify-write,
  * and the merged estimate equals the batch estimate over all data
  * EXACTLY (max is idempotent and associative; asserted in
  * StreamingSpec) — "distinct shingles per source so far" over a
  * 100 TB firehose for the cost of a few thousand stored longs.
  *
  * Same idempotency layout as [[StreamingCountMin]]: batchId-keyed
  * subdir + overwrite, so foreachBatch's at-least-once replay cannot
  * double-apply a batch (harmless for max, but the layout also keeps
  * the store compactable by batch).
  */
object StreamingDistinct {

  /** Stream document files from `srcDir`, append each micro-batch's
    * partial HLL registers over 3-word shingles per source.
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
        val sh = batch.select(col("source"),
          explode(Dedup.shingles(col("text"), 3)).as("sh"))
        DistinctSketch.hllRegisters(sh, "source", "sh")
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** Current registers: fold the per-batch partials with one more max
    * (the batch_id partition column from the idempotent layout is
    * ignored).
    */
  def registersFromStore(spark: SparkSession, storeDir: String): DataFrame = {
    PartialStore.guardedRead(spark, storeDir, "registersFromStore")
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rmax")).as("rmax"))
  }

  /** Current per-source distinct-shingle estimate. */
  def estimateFromStore(spark: SparkSession, storeDir: String): DataFrame =
    DistinctSketch.hllEstimate(registersFromStore(spark, storeDir), "source")

  /** Collapse the append-accumulated per-batch register partials into a
    * single merged partial under `batch_id=-1` — the same small-files
    * problem [[graft.api.VectorDb.compact]] solves for the doc store: a
    * long-lived stream leaves one parquet file per micro-batch, and a
    * year of 1-minute batches is half a million tiny files under a
    * groupBy. Max-merge is idempotent and associative, so the merged
    * estimate is UNCHANGED register-for-register (StreamingSpec asserts
    * it). Run between stream runs: checkpointed batch ids are
    * monotonically non-negative, so the -1 slot never collides with a
    * live batch, and the next run simply appends new partials beside it.
    *
    * Same tmp-write → verify → swap discipline as VectorDb.compact:
    * the merged registers land in a side directory first and the old
    * partials are only removed after the rewrite row count checks out.
    * Returns (registerRows, batchDirsBefore).
    */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) =
    PartialStore.compact(spark, storeDir, registersFromStore(spark, storeDir))
}
