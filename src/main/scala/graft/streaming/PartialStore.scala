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
    *
    * Crash discipline: the old partials are never deleted before the
    * merged replacement is safe on disk. Sequence: write merged to a
    * `.compact-tmp` sibling → verify row count → RENAME the old batch
    * dirs out to a `.compact-old` sibling (out of the reader's path, one
    * atomic rename each — never a delete of live data) → move tmp in as
    * `batch_id=-1` → delete the trash. A crash mid-swap leaves both the
    * merged tmp and every original dir intact on disk under the named
    * siblings; the require below then fails the NEXT compaction loudly
    * instead of silently merging a partial store, and the operator
    * restores by moving the `.compact-old` children back.
    */
  def compact(spark: SparkSession, storeDir: String,
              merged: DataFrame): (Long, Long) = {
    import java.nio.file.{Files, Paths, Path}
    val root = Paths.get(storeDir)
    require(Files.exists(root), s"nothing to compact at $storeDir")
    val tmp = Paths.get(storeDir + ".compact-tmp")
    val trash = Paths.get(storeDir + ".compact-old")
    require(!Files.exists(trash),
      s"leftover $trash from an interrupted compaction — restore or remove it first")
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
    merged.coalesce(1) // sketch-sized by construction — one file is the point
      .write.mode("overwrite").parquet(tmp.toString)
    val m = spark.read.parquet(tmp.toString).count()
    require(m == n, s"partial compaction row mismatch: $n vs $m — aborting swap")
    Files.createDirectory(trash)
    before.foreach(d => Files.move(d, trash.resolve(d.getFileName)))
    Files.move(tmp, root.resolve("batch_id=-1"))
    def deleteRecursively(p: Path): Unit = {
      val w = Files.walk(p)
      try {
        val all = { val b = Seq.newBuilder[Path]; w.forEach(b += _); b.result() }
        all.reverse.foreach(Files.deleteIfExists)
      } finally w.close()
    }
    deleteRecursively(trash)
    (n, before.length.toLong)
  }
}
