package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuously-maintained embedding-health profile: the streaming form
  * of q209's norm-degeneracy audit, giving the VECTOR ingest loop the
  * same at-ingest monitor every other family has. Per (label) the
  * partial carries (n, n_zero, min, max, sum) of the integer-micro
  * squared L2 norm — COUNT/SUM are SUM-mergeable and MIN/MAX
  * MIN/MAX-mergeable, all closed under re-merging, so "the stream's
  * norm profile so far" is one groupBy whenever anyone asks. A batch
  * of all-zero vectors (a failed encoder), an unnormalized model mix
  * (min/max spread explodes), or scale drift between ingest runs flags
  * mid-ingest, without rescanning vector history. Per-row norm² uses
  * the cosine kernel's fold order, micro-integered BEFORE any
  * aggregation — the q209 discipline, so stream == batch is exact.
  */
object StreamingNormAudit {

  val EmbeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Mergeable partial: one row per label in the batch. */
  def normPartial(vecs: DataFrame): DataFrame = {
    val e = col("embedding").cast("array<double>")
    val norm2 = aggregate(e, lit(0.0), (acc, x) => acc + x * x)
    vecs.filter(col("embedding").isNotNull)
      .select(col("label"), round(norm2 * 1000000, 0).cast("long").as("__n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("__n2") === 0, 1L).otherwise(0L)).as("n_zero_norm"),
        min(col("__n2")).as("min_norm2_micro"),
        max(col("__n2")).as("max_norm2_micro"),
        sum(col("__n2")).as("sum_norm2_micro"))
  }

  /** Stream embedding files from `srcDir`, append each micro-batch's
    * norm partial.
    */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val rs = spark.readStream.schema(EmbeddingSchema)
    val rs2 = if (maxFilesPerTrigger > 0)
      rs.option("maxFilesPerTrigger", maxFilesPerTrigger) else rs
    rs2
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        normPartial(batch)
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** Stream-so-far audit per label (merge the partials; mean derived
    * from the exact integer sum — q209's output shape plus the sum).
    */
  def auditFromStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.guardedRead(spark, storeDir, "auditFromStore")
      .groupBy(col("label"))
      .agg(sum(col("n_vectors")).as("n_vectors"),
        sum(col("n_zero_norm")).as("n_zero_norm"),
        min(col("min_norm2_micro")).as("min_norm2_micro"),
        max(col("max_norm2_micro")).as("max_norm2_micro"),
        sum(col("sum_norm2_micro")).as("sum_norm2_micro"))
      .select(col("label"), col("n_vectors"), col("n_zero_norm"),
        col("min_norm2_micro"),
        expr("sum_norm2_micro div n_vectors").as("mean_norm2_micro"),
        col("max_norm2_micro"))

  /** Collapse per-batch partials into `batch_id=-1`. */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) = {
    val merged = PartialStore.guardedRead(spark, storeDir, "compactStore")
      .groupBy(col("label"))
      .agg(sum(col("n_vectors")).as("n_vectors"),
        sum(col("n_zero_norm")).as("n_zero_norm"),
        min(col("min_norm2_micro")).as("min_norm2_micro"),
        max(col("max_norm2_micro")).as("max_norm2_micro"),
        sum(col("sum_norm2_micro")).as("sum_norm2_micro"))
    PartialStore.compact(spark, storeDir, merged)
  }
}
