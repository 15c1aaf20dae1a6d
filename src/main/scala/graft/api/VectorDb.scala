package graft.api

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.search.Search
import graft.stats.Stats

/** The reference store's full endpoint surface as one library facade —
  * what a user of `mock_vector_db_api.py` programs against, re-expressed
  * over a parquet-backed corpus:
  *
  *   POST /add_documents → [[addDocuments]]  (S7 append, F5 validation)
  *   POST /query         → [[query]]/[[queryVec]] (Q1-Q5 + quirks 7/8)
  *   GET  /stats         → [[stats]]         (A1-A5 report)
  *   POST /clear         → [[clear]]         (S8 backup-then-truncate)
  *   GET  /health        → [[health]]        (S9 probe)
  *
  * Reference parity quirks preserved (SURVEY.md §2.9): re-ingest APPENDS
  * duplicates (5); invalid `topK` silently coerces to 5 (7,
  * `mock_vector_db_api.py:254-256`); a query-vector dimension mismatch is
  * a hard error checked against the corpus (8, `:270-272`); schema-invalid
  * rows are dropped, not fatal (F5, `:181-190`); the score threshold
  * applies AFTER the top-k slice (1).
  *
  * Where the reference rewrites the entire JSON store on every 100-doc
  * batch (its measured O(corpus) bottleneck, SURVEY.md §1.4), this
  * facade appends parquet — O(batch) — and inherits Spark's scan
  * parallelism for every read path.
  */
final class VectorDb(spark: SparkSession, path: String,
                     embedder: Embedder = Embedder.Default) {

  /** Rows appended / rows dropped by validation (the reference's
    * add_documents response counts).
    */
  final case class AddResult(added: Long, dropped: Long)

  /** Corpus report — the `/stats` JSON shape. */
  final case class DbStats(totalDocuments: Long, uniqueFiles: Long,
                           totalContentKb: Double, avgChunksPerFile: Double,
                           byExtension: Map[String, Long])

  /** Store liveness — the `/health` shape. */
  final case class Health(status: String, documents: Long, storeExists: Boolean)

  private def storeDir: Path = Paths.get(path)

  /** Run `f` over the store's file listing, closing the stream (a leaked
    * DirectoryStream exhausts fds in a long-lived service).
    */
  private def withListing[A](f: java.util.stream.Stream[Path] => A): A = {
    val s = Files.list(storeDir)
    try f(s) finally s.close()
  }

  private def exists: Boolean =
    Files.exists(storeDir) && withListing(_.findFirst().isPresent)

  /** The corpus as a DataFrame (empty-schema-free: callers should check
    * [[health]] first; reads of a never-written store throw like a
    * missing table would).
    */
  def corpus(): DataFrame = spark.read.parquet(path)

  /** S7/F5: validate (embedding + content present) and append. Duplicate
    * content accumulates — append is the reference's contract (§2.9.5),
    * dedup is an explicit downstream operator (graft.dedup).
    */
  def addDocuments(docs: DataFrame): AddResult = {
    require(docs.columns.contains("embedding") && docs.columns.contains("content"),
      "documents need `embedding` and `content` columns " +
        s"(got: ${docs.columns.mkString(", ")})")
    val n = docs.count()
    val valid = docs.filter(col("embedding").isNotNull && col("content").isNotNull)
    val nValid = valid.count()
    valid.write.mode("append").parquet(path)
    AddResult(nValid, n - nValid)
  }

  /** Q1-Q5: embed the query text with the store's embedder and run the
    * exact cosine top-k (threshold 0.1 AFTER the limit — §2.9.1).
    * Invalid `topK` (≤ 0) silently coerces to 5 (§2.9.7).
    */
  def query(text: String, topK: Int = 5, idCol: String = "path"): DataFrame =
    queryVec(embedder.embed(text).map(_.toDouble).toSeq, topK, idCol)

  /** Query with a caller-supplied vector; its dimension must match the
    * corpus's (checked against one stored row, like the reference checks
    * `embeddings[0]` — §2.9.8) and an empty corpus is a hard error
    * (`mock_vector_db_api.py:258-260`).
    */
  def queryVec(vec: Seq[Double], topK: Int = 5, idCol: String = "path"): DataFrame = {
    val k = if (topK <= 0) 5 else topK // quirk 7: silent coercion
    val c = corpus()
    // Sample a non-null embedding: rows written by paths other than
    // addDocuments may carry nulls, and size(null) would NPE here.
    val sample = c.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).head(1)
    if (sample.isEmpty) throw new IllegalStateException(
      "query against a corpus with no embeddings (reference returns HTTP 400 here)")
    val dim = sample.head.getInt(0)
    require(vec.length == dim,
      s"query vector dimension ${vec.length} != corpus dimension $dim")
    Search.topK(c, vec, k = k, threshold = 0.1, idCol = idCol,
      vecCol = "embedding")
  }

  /** A1-A5: the `/stats` report in one pass over the corpus (plus the
    * tiny per-extension histogram), computed with the same last-wins
    * semantics the reference's chunk map has (§2.9.6).
    */
  def stats(orderCol: String = "ingested_at"): DbStats = {
    val c = corpus()
    val base = Stats.corpusStats(c, "path", "content").head()
    val avg = Stats.avgChunksPerFile(c, "path", "total_chunks", orderCol)
      .head().getDouble(0)
    val byExt = c
      .groupBy(coalesce(col("extension"), lit("unknown")).as("extension"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    DbStats(base.getLong(0), base.getLong(1), base.getDouble(2), avg, byExt)
  }

  /** S8: timestamped backup copy, then truncate. Returns the backup
    * location (None when there was nothing to back up). The backup is a
    * file-level copy — the parquet analog of the reference's
    * `documents.json.backup_<ts>` (`mock_vector_db_api.py:66-74`).
    */
  /** Depth-first listing of everything under `root` except `root` itself,
    * deepest entries last — reverse it to delete children before parents.
    * A partitioned parquet write produces subdirectories, so both backup
    * and truncate must walk the tree, not just the top-level listing.
    */
  private def walkTree(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try {
      val b = Seq.newBuilder[Path]
      s.forEach(p => if (p != root) b += p)
      b.result()
    } finally s.close()
  }

  /** Store maintenance: rewrite the append-accumulated store into
    * `targetFiles` parquet files. Every [[addDocuments]] batch appends
    * its own files, so a long-lived store degrades into thousands of
    * tiny parquet files — at 100 TB that is the classic small-files
    * failure (footer-read storms, per-file task overhead, starved
    * scans). Compaction range-partitions by `orderCol` and sorts
    * within partitions, so the rewritten files are both bounded in
    * count and clustered (min/max footer stats prune `orderCol`
    * predicates after compaction).
    *
    * The rewrite goes to a temp directory first and is row-count
    * verified BEFORE the old store is swapped out (move old → `.old`,
    * move temp → store, delete `.old`). Directory moves are not
    * jointly atomic: a crash in the window between the two moves
    * leaves no live dir at `path` with the data intact in `.old`.
    * [[recoverCompact]] (run automatically at the start of every
    * compact) heals every crash state: live store missing + `.old`
    * present → restore `.old`; both present → the live store won the
    * swap, drop the stale `.old`; stale `.compact-tmp` → drop (it is
    * always re-derivable from the live store). So the worst outcome of
    * any crash is one recovery pass, never data loss.
    *
    * Returns (rows, filesBefore, filesAfter).
    */
  def compact(targetFiles: Int = 8,
              orderCol: String = "path"): (Long, Long, Long) = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    recoverCompact()
    require(exists, s"nothing to compact at $path")
    def parquetFiles(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
        .count()
      finally s.close()
    }
    val before = parquetFiles(storeDir)
    val df = corpus()
    require(df.columns.contains(orderCol),
      s"compact orderCol `$orderCol` not in store schema ${df.columns.mkString(",")}")
    val n = df.count()
    val tmp = Paths.get(path + ".compact-tmp")
    val old = Paths.get(path + ".old")
    df.repartitionByRange(targetFiles, org.apache.spark.sql.functions.col(orderCol))
      .sortWithinPartitions(org.apache.spark.sql.functions.col(orderCol))
      .write.mode("overwrite").parquet(tmp.toString)
    val m = spark.read.parquet(tmp.toString).count()
    require(m == n, s"compaction row mismatch: store $n, rewrite $m — aborting swap")
    Files.move(storeDir, old)
    Files.move(tmp, storeDir)
    walkTree(old).reverse.foreach(Files.deleteIfExists)
    Files.deleteIfExists(old)
    (n, before, parquetFiles(storeDir))
  }

  /** Heal any state a crashed [[compact]] can leave behind. Idempotent;
    * called automatically by compact, and safe to call at open time.
    * Returns a short description of what (if anything) was repaired.
    */
  def recoverCompact(): Option[String] = {
    val tmp = Paths.get(path + ".compact-tmp")
    val old = Paths.get(path + ".old")
    def drop(p: Path): Unit =
      if (Files.exists(p)) { walkTree(p).reverse.foreach(Files.deleteIfExists); Files.deleteIfExists(p) }
    val repaired =
      if (Files.exists(old) && !Files.exists(storeDir)) {
        // crash between the two moves: the verified data lives in .old
        Files.move(old, storeDir)
        Some(s"restored store from $old")
      } else if (Files.exists(old)) {
        // crash after the swap, before cleanup: live store is the rewrite
        drop(old)
        Some(s"dropped stale $old")
      } else None
    // a stale rewrite is always re-derivable from the live store
    if (Files.exists(tmp)) { drop(tmp); return Some(repaired.fold("")(_ + "; ") + s"dropped stale $tmp") }
    repaired
  }

  def clear(backup: Boolean = true): Option[String] = {
    if (!Files.exists(storeDir)) return None
    val entries = walkTree(storeDir)
    val bak =
      if (backup && exists) {
        val dst = Paths.get(s"$path.backup_${System.currentTimeMillis()}")
        Files.createDirectories(dst)
        entries.foreach { f =>
          val target = dst.resolve(storeDir.relativize(f))
          if (Files.isDirectory(f)) Files.createDirectories(target)
          else {
            Files.createDirectories(target.getParent)
            Files.copy(f, target, StandardCopyOption.COPY_ATTRIBUTES)
          }
        }
        Some(dst.toString)
      } else None
    // truncate: remove contents deepest-first; the directory stays (an
    // empty store)
    entries.reverse.foreach(f => Files.deleteIfExists(f))
    bak
  }

  /** S9: row count + store existence (the reference's health payload). */
  def health(): Health = {
    val ok = exists
    val n = if (ok) corpus().count() else 0L
    Health(if (ok) "healthy" else "empty", n, ok)
  }
}
