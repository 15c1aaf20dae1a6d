package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for batchId-keyed partial-sketch stores
  * ([[StreamingDistinct]] HLL registers, [[StreamingQuantile]] bucket
  * counts): a long-lived stream appends one `batch_id=N` parquet dir per
  * micro-batch, and compaction collapses them into a single merged
  * partial under `batch_id=-1` — the same small-files problem
  * [[graft.api.VectorDb.compact]] solves for the doc store. The merge
  * function must be associative and closed under re-merging (max for
  * HLL, sum for count sketches); checkpointed batch ids are
  * non-negative, so the -1 slot never collides with a live batch and the
  * next stream run appends new partials beside it.
  *
  * Same tmp-write → verify → swap discipline as VectorDb.compact: the
  * merged rows land in a side directory first and the old partials are
  * only removed after the rewrite row count checks out.
  */
private[streaming] object PartialStore {

  /** Collapse every `batch_id=*` dir of `storeDir` into `batch_id=-1`
    * holding `merged` (the caller's already-merged view of the store).
    * Returns (mergedRows, batchDirsBefore).
    */
  def compact(spark: SparkSession, storeDir: String,
              merged: DataFrame): (Long, Long) = {
    import java.nio.file.{Files, Paths, Path}
    val root = Paths.get(storeDir)
    require(Files.exists(root), s"nothing to compact at $storeDir")
    def batchDirs(): Seq[Path] = {
      val s = Files.list(root)
      try {
        val b = Seq.newBuilder[Path]
        s.forEach(p =>
          if (Files.isDirectory(p) && p.getFileName.toString.startsWith("batch_id="))
            b += p)
        b.result()
      } finally s.close()
    }
    val before = batchDirs()
    val n = merged.count()
    val tmp = Paths.get(storeDir + ".compact-tmp")
    merged.coalesce(1) // sketch-sized by construction — one file is the point
      .write.mode("overwrite").parquet(tmp.toString)
    val m = spark.read.parquet(tmp.toString).count()
    require(m == n, s"partial compaction row mismatch: $n vs $m — aborting swap")
    before.foreach { d =>
      val w = Files.walk(d)
      try {
        val all = { val b = Seq.newBuilder[Path]; w.forEach(b += _); b.result() }
        all.reverse.foreach(Files.deleteIfExists)
      } finally w.close()
    }
    Files.move(tmp, root.resolve("batch_id=-1"))
    (n, before.length.toLong)
  }
}
