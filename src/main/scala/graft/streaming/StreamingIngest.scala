package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.embed.Embedder
import graft.ingest.Ingest

/** Incremental corpus ingest: the streaming generalization of the
  * reference's batched `/add_documents` append loop
  * (`/root/reference/repo_to_vector.py:376-450` →
  * `mock_vector_db_api.py:150-228`).
  *
  * The reference rewrites the ENTIRE corpus JSON on every 100-doc batch —
  * O(corpus) per batch, measured to degrade 0.03 s → ~3 s per batch at
  * 13 k docs (BASELINE.md). Here each micro-batch appends only its own
  * Parquet files — O(batch) — with exactly-once tracking via the
  * checkpoint; corpus size never enters the per-batch cost, which is the
  * property that lets the same pipeline run at 100 TB.
  */
object StreamingIngest {

  /** Schema of the incoming documents directory (the testdata
    * `documents` shape).
    */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Chunk + embed + timestamp a (possibly streaming) documents frame —
    * identical code path to the batch `Ingest.ingestDocuments`, which is
    * the point: one lazy plan serves both engines.
    */
  def transform(docs: DataFrame, chunkSize: Int = 200, overlap: Int = 50,
                embedder: Embedder = Embedder.Default): DataFrame =
    Ingest.ingestDocuments(docs, "text", chunkSize, overlap, embedder)

  /** Start the incremental ingest: watch `sourceDir` for new Parquet
    * files, chunk+embed, append to `sinkDir`. `availableNow` processes the
    * current backlog then stops (the batch-refresh mode); otherwise the
    * query runs continuously per micro-batch.
    */
  def start(spark: SparkSession, sourceDir: String, sinkDir: String,
            checkpointDir: String, chunkSize: Int = 200, overlap: Int = 50,
            availableNow: Boolean = true): StreamingQuery = {
    val docs = spark.readStream
      .schema(DocumentSchema)
      .option("maxFilesPerTrigger", "32") // bound micro-batch size
      .parquet(sourceDir)
    val writer = transform(docs, chunkSize, overlap).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
