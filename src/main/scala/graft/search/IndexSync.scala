package graft.search

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** CDC-driven incremental index maintenance (VERDICT r18 item 6): keep
  * a persisted IVF index in lockstep with a LIVING corpus stored as a
  * [[graft.sources.Versioned]] table, consuming the table's typed
  * change feed instead of rebuilding — the operator a 100 TB corpus
  * needs, because "reassign and rewrite every inverted list" is a
  * full-corpus job while a day's changes are a batch.
  *
  * One [[sync]] call maps a corpus version range onto index mutations:
  *
  *  - `insert` rows of [[Versioned.readChangesTyped]] (brand-new keys
  *    AND the post-images of updates) become ONE
  *    [[Ann.upsertIntoIvf]] — it tombstones any replaced id across
  *    lists and appends the fresh vectors as a new generation;
  *  - `delete` rows whose key does NOT reappear as an insert (pure
  *    deletes — an update's pre-image cancels against its post-image
  *    by key) become ONE [[Ann.deleteFromIvf]] tombstone commit.
  *
  * Both mutations commit under the index's v3 manifest protocol, so
  * probes in flight during a sync keep resolving their planned
  * version, and a crash mid-sync leaves the index at a committed
  * version (possibly one mutation short — re-running the sync from
  * the recorded corpus version is idempotent in effect: the upsert
  * re-replaces the same ids, the delete re-tombstones).
  *
  * The corpus-version ↔ index-version mapping is AUDITABLE: after
  * each sync the index root records the synced corpus version
  * (`_corpus_sync` — `corpusV\tindexV` per line, append-shaped), and
  * [[syncedCorpusVersion]] reads the latest back, so an incremental
  * pipeline resumes with `sync(table, index, from = synced, to =
  * latest)` and an auditor can ask "which corpus version does this
  * index serve?" without trusting the pipeline's logs.
  *
  * Scale shape: the change frames are file-diff-bounded
  * ([[Versioned.readChangesTyped]] opens only the files the version
  * range touched), the pure-delete key set is driver-collected under
  * the same `maxBatch` bound every key-batch operator enforces, and
  * the index mutations are O(changed rows), never O(corpus).
  */
object IndexSync {

  /** What one sync did: the consumed corpus range, mutation row
    * counts, and the index version the corpus range now maps to.
    */
  final case class SyncReport(corpusFromV: Long, corpusToV: Long,
                              nUpserted: Long, nDeleted: Long,
                              indexVersion: Long)

  private def syncLog(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath, "_corpus_sync")

  private def fsOf(spark: SparkSession, indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The most recently recorded synced corpus version, None on an
    * index no sync (or [[markSynced]]) ever stamped.
    */
  def syncedCorpusVersion(spark: SparkSession,
                          indexPath: String): Option[Long] = {
    val f = fsOf(spark, indexPath)
    val p = syncLog(indexPath)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    lines.lastOption.map(_.split('\t')(0).toLong)
  }

  /** Record "this index serves corpus version `corpusV`" — called by
    * [[sync]] after its mutations, and by the INITIAL build (an index
    * built from a snapshot read of version N starts its audit trail
    * at N). The log is rewritten whole (it is one line per sync —
    * metadata, not data) with the usual tmp + rename.
    */
  def markSynced(spark: SparkSession, indexPath: String,
                 corpusV: Long): Unit = {
    val f = fsOf(spark, indexPath)
    val p = syncLog(indexPath)
    val prior =
      if (!f.exists(p)) Nil
      else {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
      }
    val indexV = Ann.latestIvfVersion(spark, indexPath)
    val tmp = new org.apache.hadoop.fs.Path(indexPath, "._corpus_sync.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write(((prior :+ s"$corpusV\t$indexV").mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"sync stamp at $indexPath failed")
  }

  /** Apply the corpus changes (fromV, toV] to the index. Requires the
    * change rows to carry `idCol` (non-null — an index row without an
    * id cannot be replaced or deleted) and `vecCol`. Returns the
    * report; also stamps the audit log. No-change ranges are refused
    * by [[Versioned.readChangesTyped]] itself.
    */
  def sync(spark: SparkSession, tableRoot: String, indexPath: String,
           fromV: Long, toV: Long, idCol: String = "vec_id",
           vecCol: String = "embedding",
           maxBatch: Int = 1000000): SyncReport = {
    val cdc = Versioned.readChangesTyped(spark, tableRoot, fromV, toV)
      .cache()
    try {
      val inserts = cdc.filter(col("_change_type") === "insert")
        .drop("_change_type")
      val deletes = cdc.filter(col("_change_type") === "delete")
        .select(col(idCol).cast("long").as(idCol))
      // pure deletes = deleted keys that do not reappear as inserts
      // (an update surfaces as delete+insert of the SAME key and is
      // fully handled by the upsert's tombstone-and-replace)
      val pureDeleteRows = deletes
        .join(inserts.select(col(idCol).cast("long").as(idCol)),
          Seq(idCol), "left_anti")
        .distinct().limit(maxBatch + 1).collect()
      require(pureDeleteRows.length <= maxBatch,
        s"sync($tableRoot -> $indexPath): more than $maxBatch deleted " +
        "keys in one version range — sync narrower ranges")
      require(!pureDeleteRows.exists(_.isNullAt(0)),
        s"sync($tableRoot -> $indexPath): a delete row carries a null " +
        s"$idCol — the index cannot tombstone it")
      val pureDeletes = pureDeleteRows.map(_.getLong(0)).sorted.toSeq
      val nUpserts = inserts.count()
      if (nUpserts > 0) Ann.upsertIntoIvf(spark, indexPath, inserts,
        idCol = idCol, vecCol = vecCol)
      if (pureDeletes.nonEmpty)
        Ann.deleteFromIvf(spark, indexPath, pureDeletes, idCol = idCol)
      markSynced(spark, indexPath, toV)
      SyncReport(fromV, toV, nUpserts, pureDeletes.size.toLong,
        Ann.latestIvfVersion(spark, indexPath))
    } finally cdc.unpersist()
  }

  /** Resume-shaped sync: consume everything from the recorded synced
    * corpus version up to the table's latest. Refuses an index whose
    * audit trail was never initialized ([[markSynced]] at build time)
    * — guessing a baseline would silently double-apply or skip
    * changes. Returns None when already caught up.
    */
  def syncToLatest(spark: SparkSession, tableRoot: String,
                   indexPath: String, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   maxBatch: Int = 1000000): Option[SyncReport] = {
    val from = syncedCorpusVersion(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"$indexPath has no _corpus_sync stamp — markSynced(corpusV) " +
        "at initial build time to anchor the incremental feed"))
    val to = Versioned.latestVersion(spark, tableRoot)
    if (to <= from) None
    else Some(sync(spark, tableRoot, indexPath, from, to, idCol, vecCol,
      maxBatch))
  }
}
