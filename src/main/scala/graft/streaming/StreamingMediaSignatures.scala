package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.Multimodal

/** Continuously-maintained media near-dup signature groups: the
  * streaming form of q138's byte-histogram sign hashes (VERDICT r14
  * item 7 — the last family without a [[PartialStore]] twin). Each
  * micro-batch appends its own signature-GROUP partial
  * (sig, rep, n_media): count is SUM-mergeable and the representative
  * id MIN-mergeable, both closed under re-merging, so "the crawl's
  * signature groups so far" is one groupBy whenever anyone asks, and
  * the banded Hamming near-dup join ([[Multimodal.mediaNearDupGroups]]'s
  * exact shape) runs over the MERGED groups — distinct-signature-sized,
  * never corpus-sized. This is the at-ingest media-dedup monitor: a
  * crawl loop sees re-encoded/cropped copies cluster (small Hamming
  * distance) or exact copies collapse (n_media grows on one sig)
  * mid-crawl, without rescanning payload history.
  *
  * The stream source is the document-file fixture with payloads derived
  * exactly as the batch media table (text bytes — the documented stub
  * stand-in at the [[Multimodal.MediaCodec]] seam); the signature,
  * grouping, merge, and near-dup plumbing are the production-real
  * parts. StreamingSpec pins stream == batch over the same rows plus
  * compaction idempotence.
  */
object StreamingMediaSignatures {

  /** Mergeable partial: one row per distinct signature in the batch —
    * (sig, rep = min media_id, n_media). Exact copies collapse HERE,
    * inside the micro-batch, before anything persists.
    */
  def signatureGroups(media: DataFrame, buckets: Int = 32): DataFrame =
    Multimodal.byteSignHash(media, buckets)
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("rep"), count(lit(1)).as("n_media"))

  /** The document→media derivation the batch fixtures use (payload =
    * UTF-8 text bytes, id = doc_id).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"))

  /** Stream document files from `srcDir`, append each micro-batch's
    * signature-group partial.
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
        signatureGroups(mediaFromDocs(batch))
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      }
      .start()
  }

  /** Stream-so-far signature groups (merge the partials: min rep,
    * sum count).
    */
  def groupsFromStore(spark: SparkSession, storeDir: String): DataFrame =
    PartialStore.guardedRead(spark, storeDir, "groupsFromStore")
      .groupBy(col("sig"))
      .agg(min(col("rep")).as("rep"), sum(col("n_media")).as("n_media"))

  /** Banded Hamming near-dup pairs over the merged store groups — the
    * read-side twin of [[Multimodal.mediaNearDupGroups]], same pigeonhole
    * recall contract (exact for Hamming ≤ bands−1), same output columns.
    * The self-join runs over distinct signatures only; the store never
    * held a payload byte.
    */
  def nearDupsFromStore(spark: SparkSession, storeDir: String,
                        maxHamming: Int = 3, bands: Int = 4,
                        buckets: Int = 32): DataFrame = {
    require(bands > 0 && buckets % bands == 0,
      s"bands must divide buckets, got $bands/$buckets")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands, got $maxHamming/$bands")
    val width = buckets / bands
    val mask = (1L << width) - 1
    // merged-group table feeds both self-join sides; signature-count
    // sized, so the localCheckpoint is tiny (the q138 shape)
    val grp = groupsFromStore(spark, storeDir).localCheckpoint()
    val banded = grp.select(col("sig"), col("rep"), col("n_media"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "band_val")))
    val x = banded.select(col("band"), col("band_val"),
      col("sig").as("sig_a"), col("rep").as("rep_a"), col("n_media").as("n_a"))
    val y = banded.select(col("band"), col("band_val"),
      col("sig").as("sig_b"), col("rep").as("rep_b"), col("n_media").as("n_b"))
    x.join(y, Seq("band", "band_val"))
      .filter(col("sig_a") < col("sig_b"))
      .select("sig_a", "sig_b", "rep_a", "rep_b", "n_a", "n_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("rep_a", "rep_b", "n_a", "n_b", "hamming")
  }

  /** Collapse per-batch partials into `batch_id=-1`. */
  def compactStore(spark: SparkSession, storeDir: String): (Long, Long) =
    PartialStore.compact(spark, storeDir, groupsFromStore(spark, storeDir))
}
