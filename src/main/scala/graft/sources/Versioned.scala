package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with manifest-committed snapshot reads —
  * the Iceberg/Delta commit protocol in miniature (public knowledge),
  * for the two things a 100 TB table cannot live without:
  *
  *  - **O(1) metadata reads.** A reader opens ONE manifest file and
  *    gets the exact file list — never a recursive directory listing
  *    (at millions of files, listing IS the query latency).
  *  - **Snapshot isolation + time travel.** The manifest rename is the
  *    atomic commit point: a reader of version N sees exactly N's
  *    files forever, concurrent appends land in NEW files referenced
  *    only by NEW manifests, and a crashed append leaves an orphan
  *    data directory that no manifest references — invisible to every
  *    reader, reclaimed by [[vacuum]].
  *
  * Layout: `root/data/batch-<v>/part-*.parquet` (immutable),
  * `root/_manifests/v<00000v>.manifest` (one line per file path,
  * relative to root). Manifests are written to a hidden `.tmp` and
  * renamed in — same discipline as
  * [[graft.search.Ann.recoverIvf]]'s mutators. Single writer assumed
  * (the usual external-coordination contract); readers need no
  * coordination at all.
  */
object Versioned {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%06d.manifest")

  /** Highest committed version, or 0 if the table has none. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) return 0L
    val V = """v(\d+)\.manifest""".r
    f.listStatus(dir).map(_.getPath.getName).collect {
      case V(n) => n.toLong
    }.foldLeft(0L)(math.max)
  }

  private def readManifest(spark: SparkSession, root: String,
                           v: Long): Seq[String] = {
    val f = fs(spark, root)
    val p = manifestPath(root, v)
    require(f.exists(p), s"no version $v at $root (missing ${p.getName})")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The relpath of a manifest line — lines are `relpath` (v1) or
    * `relpath\tmin\tmax` (stats); every path consumer MUST strip the
    * stats columns.
    */
  private def pathOf(line: String): String = line.split('\t').head

  /** Append `df` as the next version: the data lands in a fresh
    * immutable `data/batch-<v>` directory, and the commit is ONE
    * manifest rename (prior files + the new ones). A crash before the
    * rename leaves an orphan batch directory no reader can see.
    * Returns the committed version.
    */
  def append(spark: SparkSession, root: String, df: DataFrame): Long =
    appendNamed(spark, root, df, dirName = null)

  /** [[append]] with an explicit batch directory name (default
    * `batch-<v>`): the hook the streaming sink uses to make commits
    * IDEMPOTENT — a replayed micro-batch reuses its epoch-keyed name,
    * so "is this batch already committed" is one manifest scan
    * ([[graft.streaming.StreamingVersionedSink]]).
    */
  def appendNamed(spark: SparkSession, root: String, df: DataFrame,
                  dirName: String): Long = {
    require(!df.isEmpty, s"refusing to commit an empty version to $root")
    val f = fs(spark, root)
    val v = latestVersion(spark, root) + 1
    val name = Option(dirName).getOrElse(s"batch-$v")
    require(!name.contains('/') && !name.contains('\t'),
      s"bad batch dir name: $name")
    val batch = new Path(root, s"data/$name")
    if (f.exists(batch)) f.delete(batch, true) // dead prior attempt
    df.write.mode("overwrite").parquet(batch.toString)
    val newFiles = f.listStatus(batch)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/$name/${s.getPath.getName}").sorted
    val prior = if (v == 1) Seq.empty else readManifest(spark, root, v - 1)
    val all = prior ++ newFiles
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".v$v.manifest.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write((all.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, manifestPath(root, v)),
      s"append($root): manifest commit for v$v failed")
    v
  }

  /** True iff the latest manifest references any file under
    * `data/<dirName>/` — the streaming sink's replay test.
    */
  def hasBatchDir(spark: SparkSession, root: String,
                  dirName: String): Boolean = {
    val latest = latestVersion(spark, root)
    latest > 0 && readManifest(spark, root, latest)
      .exists(l => pathOf(l).startsWith(s"data/$dirName/"))
  }

  /** Snapshot read of `version` (default: latest): exactly that
    * manifest's file list, handed to the parquet reader directly — no
    * directory listing, and later appends can never change the result.
    */
  def readAsOf(spark: SparkSession, root: String,
               version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, root) else version
    require(v > 0, s"no committed versions at $root")
    val files = readManifest(spark, root, v)
      .map(line => s"$root/${pathOf(line)}")
    spark.read.parquet(files: _*)
  }

  /** [[append]] that ALSO records per-file min/max zone stats of
    * `statCol` (an integer column) in the manifest — Iceberg-style
    * file-level stats (public knowledge). Stats ride the manifest as
    * `relpath\tmin\tmax` lines (stat-less v1 lines stay readable and
    * are simply never skipped), computed with ONE pass over the
    * just-written batch grouped by `input_file_name()`. A
    * [[readWhere]] on `statCol` then opens ONLY the overlapping files
    * — the manifest IS the zone map, so a selective read on a 100 TB
    * table is decided by one small metadata file, before any footer
    * is touched.
    */
  def appendWithStats(spark: SparkSession, root: String, df: DataFrame,
                      statCol: String): Long = {
    import org.apache.spark.sql.functions._
    require(!df.isEmpty, s"refusing to commit an empty version to $root")
    val f = fs(spark, root)
    val v = latestVersion(spark, root) + 1
    val batch = new Path(root, s"data/batch-$v")
    if (f.exists(batch)) f.delete(batch, true)
    df.write.mode("overwrite").parquet(batch.toString)
    val stats = spark.read.parquet(batch.toString)
      .groupBy(input_file_name().as("__f"))
      .agg(min(col(statCol).cast("long")).as("__mn"),
        max(col(statCol).cast("long")).as("__mx"))
      .collect()
      .map { r =>
        // URI scheme spellings vary (file:/ vs file:///): key on the
        // basename — batch files sit flat under data/batch-<v>/
        val name = r.getString(0).split('/').last
        (s"data/batch-$v/$name", r.getLong(1), r.getLong(2))
      }
      .sortBy(_._1)
    val newLines = stats.map { case (p, mn, mx) => s"$p\t$mn\t$mx" }
    val prior = if (v == 1) Seq.empty else readManifest(spark, root, v - 1)
    val all = prior ++ newLines
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".v$v.manifest.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write((all.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, manifestPath(root, v)),
      s"appendWithStats($root): manifest commit for v$v failed")
    v
  }

  /** Stats-pruned snapshot read: keep only the files whose recorded
    * [min, max] overlaps [lo, hi] — file skipping decided entirely
    * from the manifest — then apply the exact predicate on the
    * survivors (pruning is a superset cut, never a semantic change).
    * Files committed without stats are conservatively always read.
    * Returns (frame, filesRead, filesTotal) so callers can report the
    * skipping win.
    */
  def readWhere(spark: SparkSession, root: String, statCol: String,
                lo: Long, hi: Long,
                version: Long = -1L): (DataFrame, Int, Int) = {
    val v = if (version < 0) latestVersion(spark, root) else version
    import org.apache.spark.sql.functions._
    require(v > 0, s"no committed versions at $root")
    val entries = readManifest(spark, root, v).map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => (p, Some((mn.toLong, mx.toLong)))
        case Array(p)         => (p, None)
      }
    }
    val keep = entries.filter {
      case (_, Some((mn, mx))) => mx >= lo && mn <= hi
      case (_, None)           => true // stat-less: cannot skip
    }
    require(keep.nonEmpty || entries.isEmpty,
      s"readWhere($root): every file skipped — empty frame has no " +
      "schema; read a wider range or readAsOf + filter")
    val frame = spark.read.parquet(keep.map(e => s"$root/${e._1}"): _*)
      .filter(col(statCol).cast("long").between(lo, hi))
    (frame, keep.size, entries.size)
  }

  /** Copy-on-write MERGE by key — Delta/Iceberg's upsert, at FILE
    * granularity: rows of `updates` replace same-key rows, new keys
    * insert. Only the files whose manifest [min, max] key range
    * overlaps the update keys are rewritten (everything the zone
    * stats can prove untouched keeps its EXACT file path in the new
    * manifest — zero data movement, the property that makes a 1%-key
    * merge on a 100 TB table cost 1%, not 100%). The rewritten
    * survivors and the update rows land in the new version's batch
    * directory with fresh stats; the commit is the usual manifest
    * rename, so a crash mid-merge leaves only an orphan batch and
    * every committed version still time-travels.
    *
    * Requires a table whose commits all carried stats on `keyCol`
    * ([[appendWithStats]]) — a stat-less file cannot be proven
    * untouched, and this refuses rather than silently rewriting the
    * world. Update keys are collected driver-side (an update batch is
    * an ingest batch, not a corpus — the [[graft.search.Ann
    * .upsertIntoIvf]] bound). Returns (newVersion, filesRewritten,
    * filesKept).
    */
  def mergeByKey(spark: SparkSession, root: String, updates: DataFrame,
                 keyCol: String): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(!updates.isEmpty, s"refusing an empty merge into $root")
    val f = fs(spark, root)
    val prev = latestVersion(spark, root)
    require(prev > 0, s"no committed versions at $root to merge into")
    val keys = updates.select(col(keyCol).cast("long"))
      .distinct().collect().map(_.getLong(0))
    val (kLo, kHi) = (keys.min, keys.max)
    val entries = readManifest(spark, root, prev).map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => (p, mn.toLong, mx.toLong)
        case Array(p) => throw new IllegalArgumentException(
          s"mergeByKey($root): file $p carries no $keyCol stats — " +
          "merge needs a fully stat-committed table (appendWithStats)")
      }
    }
    // file-level pruning: range first, then the exact key set (a file
    // overlapping [kLo, kHi] may still hold none of the keys)
    val keySet = keys.toSet
    val (affected, kept) = entries.partition { case (_, mn, mx) =>
      mx >= kLo && mn <= kHi && keys.exists(k => k >= mn && k <= mx)
    }
    val v = prev + 1
    val batch = new Path(root, s"data/batch-$v")
    if (f.exists(batch)) f.delete(batch, true)
    val survivors =
      if (affected.isEmpty) updates
      else spark.read.parquet(affected.map(e => s"$root/${e._1}"): _*)
        .filter(!col(keyCol).cast("long").isin(keySet.toSeq: _*))
        .unionByName(updates)
    survivors.write.mode("overwrite").parquet(batch.toString)
    val stats = spark.read.parquet(batch.toString)
      .groupBy(input_file_name().as("__f"))
      .agg(min(col(keyCol).cast("long")).as("__mn"),
        max(col(keyCol).cast("long")).as("__mx"))
      .collect()
      .map { r =>
        val name = r.getString(0).split('/').last
        s"data/batch-$v/$name\t${r.getLong(1)}\t${r.getLong(2)}"
      }.sorted
    val all = kept.map { case (p, mn, mx) => s"$p\t$mn\t$mx" } ++ stats
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".v$v.manifest.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write((all.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, manifestPath(root, v)),
      s"mergeByKey($root): manifest commit for v$v failed")
    (v, affected.size, kept.size)
  }

  /** Change-data-feed read between two committed versions — Delta's
    * `readChangeFeed` in miniature: the manifests' file-list DIFF
    * bounds the I/O (only files ADDED or REMOVED between the versions
    * are opened; a 1-file append on a million-file table reads 1
    * file), and the row-level change set is
    * `read(added) EXCEPT ALL read(removed)` — exact for pure appends
    * (removed is empty → the new rows) AND for copy-on-write merges
    * (a rewritten file's carried-over rows cancel against the removed
    * file, leaving exactly the updated/inserted rows). The EXCEPT ALL
    * shuffles only the changed files' rows, never the table. Returns
    * the net-new row multiset of `toV` relative to `fromV`.
    */
  def readChanges(spark: SparkSession, root: String,
                  fromV: Long, toV: Long): DataFrame = {
    require(fromV >= 0 && toV > fromV,
      s"need 0 <= fromV < toV, got $fromV, $toV")
    val fromFiles =
      if (fromV == 0) Set.empty[String]
      else readManifest(spark, root, fromV).map(pathOf).toSet
    val toFiles = readManifest(spark, root, toV).map(pathOf).toSet
    val added = (toFiles -- fromFiles).toSeq.sorted
    val removed = (fromFiles -- toFiles).toSeq.sorted
    require(added.nonEmpty || removed.nonEmpty, {
      s"readChanges($root): v$fromV and v$toV share every file — no changes"
    })
    val addedDf =
      if (added.isEmpty)
        // removal-only version: nothing new; surface the empty frame
        // with the table's schema via an impossible filter on removed
        spark.read.parquet(removed.map(p => s"$root/$p"): _*).limit(0)
      else spark.read.parquet(added.map(p => s"$root/$p"): _*)
    if (removed.isEmpty) addedDf
    else addedDf.exceptAll(
      spark.read.parquet(removed.map(p => s"$root/$p"): _*))
  }

  /** Drop data files referenced by NO manifest (crashed appends,
    * aborted writers). Returns the deleted paths. Never touches a
    * file any committed version can still read — time travel to every
    * version stays intact.
    */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val dataDir = new Path(root, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val latest = latestVersion(spark, root)
    val referenced: Set[String] =
      if (latest == 0) Set.empty
      else (1L to latest).flatMap(v =>
        if (f.exists(manifestPath(root, v)))
          readManifest(spark, root, v).map(pathOf)
        else Seq.empty).toSet
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    for (batch <- f.listStatus(dataDir) if batch.isDirectory) {
      val rels = f.listStatus(batch.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => s"data/${batch.getPath.getName}/${s.getPath.getName}")
      if (rels.nonEmpty && rels.forall(r => !referenced.contains(r))) {
        f.delete(batch.getPath, true)
        deleted += batch.getPath.getName
      }
    }
    deleted.toSeq
  }
}
