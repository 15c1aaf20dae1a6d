package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Versioned parquet table with manifest-committed snapshot reads —
  * the Iceberg/Delta commit protocol in miniature (public knowledge),
  * for the things a 100 TB table cannot live without:
  *
  *  - **O(1) metadata reads.** A reader resolves ONE checkpoint plus
  *    at most [[CheckpointEvery]] tiny deltas and gets the exact file
  *    list — never a recursive directory listing (at millions of
  *    files, listing IS the query latency).
  *  - **O(delta) commits.** A commit writes only what it changed
  *    (`+`/`-` lines), not the full file list — a long-running
  *    streaming sink's epoch cost stays flat in table size; a full
  *    checkpoint lands every [[CheckpointEvery]] versions to bound
  *    replay.
  *  - **Snapshot isolation + time travel.** The delta rename is the
  *    atomic commit point: a reader of version N sees exactly N's
  *    files forever, concurrent appends land in NEW files referenced
  *    only by NEW deltas, and a crashed append leaves an orphan data
  *    directory that no manifest references — invisible to every
  *    reader, reclaimed by [[vacuum]].
  *  - **Additive schema evolution.** The table schema is recorded in
  *    the manifest (a `schema` line per evolving commit), so reads
  *    resolve it O(1) — never a `mergeSchema` footer sweep — old
  *    files null-fill evolved-in columns, and time travel reads each
  *    version under its OWN schema.
  *
  * Layout: `root/data/batch-<v>/part-*.parquet` (immutable),
  * `root/_manifests/v<00000v>.delta` (lines `+\t<entry>` /
  * `-\t<relpath>`; an entry is `relpath` or `relpath\tmin\tmax` with
  * zone stats) and `root/_manifests/v<00000v>.checkpoint` (the full
  * resolved entry list — a read CACHE, never the commit point: a
  * missing checkpoint only means a longer delta replay). Manifests
  * are written to a hidden `.tmp` and renamed in — the same
  * discipline as the IVF index's manifest protocol
  * ([[graft.search.Ann]]). Single writer assumed (the usual
  * external-coordination contract); readers need no coordination at
  * all.
  */
object Versioned {

  /** A full checkpoint is written every this-many versions: resolution
    * replays at most this many deltas past a checkpoint, and commit
    * cost is O(delta) on every version in between.
    */
  val CheckpointEvery = 10L

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  private def deltaPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%06d.delta")

  private def checkpointPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%06d.checkpoint")

  /** Highest committed version, or 0 if the table has none. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) return 0L
    val V = """v(\d+)\.delta""".r
    f.listStatus(dir).map(_.getPath.getName).collect {
      case V(n) => n.toLong
    }.foldLeft(0L)(math.max)
  }

  private def readLines(spark: SparkSession, root: String,
                        p: Path): Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The relpath of a manifest entry — entries are `relpath` (no
    * stats) or `relpath\tmin\tmax`; every path consumer MUST strip
    * the stats columns.
    */
  private def pathOf(entry: String): String = entry.split('\t').head

  /** Resolve version `v`'s full entry list plus its table schema (DDL,
    * when the table's commits recorded one): nearest checkpoint at or
    * below `v`, then the delta replay up to `v`. Entry order is
    * deterministic (checkpoint order, removals in place, additions
    * appended in commit order); the schema is the LAST one committed at
    * or below `v` — the Delta discipline: schema lives in the
    * transaction log, so resolving it is O(manifest), never a
    * footer-merge over the data files (`mergeSchema` reads every
    * footer — the wrong cost at a million files).
    */
  private def resolveState(spark: SparkSession, root: String,
                           v: Long): (Seq[String], Option[String]) = {
    val f = fs(spark, root)
    require(f.exists(deltaPath(root, v)),
      s"no version $v at $root (missing ${deltaPath(root, v).getName})")
    val base = (v to 1L by -1L).find(b => f.exists(checkpointPath(root, b)))
    val baseLines =
      base.map(b => readLines(spark, root, checkpointPath(root, b)))
        .getOrElse(Seq.empty)
    var schema: Option[String] = baseLines
      .find(_.startsWith("schema\t")).map(_.substring(7))
    var entries: Seq[String] = baseLines.filterNot(_.startsWith("schema\t"))
    var w = base.getOrElse(0L) + 1
    while (w <= v) {
      val p = deltaPath(root, w)
      require(f.exists(p),
        s"corrupt manifest chain at $root: v$w.delta missing below v$v")
      val lines = readLines(spark, root, p)
      lines.find(_.startsWith("schema\t"))
        .foreach(l => schema = Some(l.substring(7)))
      val removed = lines.collect { case l if l.startsWith("-\t") =>
        l.substring(2) }.toSet
      val added = lines.collect { case l if l.startsWith("+\t") =>
        l.substring(2) }
      entries = entries.filterNot(e => removed.contains(pathOf(e))) ++ added
      w += 1
    }
    (entries, schema)
  }

  private def resolveEntries(spark: SparkSession, root: String,
                             v: Long): Seq[String] =
    resolveState(spark, root, v)._1

  /** The file relpaths of a committed version — the manifest's answer,
    * no directory listing (used by callers that need to DIFF versions,
    * e.g. reporting what a merge rewrote).
    */
  def fileList(spark: SparkSession, root: String, v: Long): Seq[String] =
    resolveEntries(spark, root, v).map(pathOf)

  /** Atomically commit version `v` as a delta; the rename is the
    * commit point. A checkpoint (read cache) lands after the commit
    * every [[CheckpointEvery]] versions — a crash between the two
    * only lengthens later replays, never loses a commit.
    */
  private def commitDelta(spark: SparkSession, root: String, v: Long,
                          added: Seq[String], removed: Seq[String],
                          schema: Option[String] = None): Unit = {
    val f = fs(spark, root)
    val lines = schema.map(s => s"schema\t$s").toSeq ++
      removed.map(p => s"-\t$p") ++ added.map(e => s"+\t$e")
    require(lines.nonEmpty, s"refusing an empty commit to $root")
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), f".v$v%06d.delta.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, deltaPath(root, v)),
      s"commit of v$v at $root failed")
    if (v % CheckpointEvery == 0L) {
      val (entries, sch) = resolveState(spark, root, v)
      val ctmp = new Path(manifestDir(root), f".v$v%06d.checkpoint.tmp")
      if (f.exists(ctmp)) f.delete(ctmp, false)
      val cout = f.create(ctmp, true)
      val cLines = sch.map(s => s"schema\t$s").toSeq ++ entries
      try cout.write((cLines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally cout.close()
      require(f.rename(ctmp, checkpointPath(root, v)),
        s"checkpoint of v$v at $root failed")
    }
  }

  /** ADDITIVE schema evolution (Delta's default): the next table
    * schema is the prior columns followed by the batch's new ones. A
    * same-name column must keep its exact type (silent widening breaks
    * time-travel readers); a batch missing prior columns is fine —
    * old columns null-fill nothing, NEW files simply don't carry them
    * and reads under the table schema null-fill the gaps.
    */
  private def evolveSchema(prior: Option[String],
                           df: DataFrame, root: String): String = {
    val cur = df.schema
    prior match {
      case None => cur.toDDL
      case Some(ddl) =>
        val old = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        cur.fields.foreach { fNew =>
          old.fields.find(_.name == fNew.name).foreach { fOld =>
            require(fOld.dataType == fNew.dataType,
              s"schema evolution at $root: column ${fNew.name} would " +
              s"change type ${fOld.dataType.simpleString} -> " +
              s"${fNew.dataType.simpleString}; additive evolution only")
          }
        }
        val extra = cur.fields.filterNot(f => old.fieldNames.contains(f.name))
        org.apache.spark.sql.types.StructType(old.fields ++ extra).toDDL
    }
  }

  /** The schema a snapshot read applies: recorded DDL when present
    * (O(1) from the manifest — old files' missing columns null-fill
    * under it), else None (pre-schema tables read file-inferred).
    */
  private def readSchema(spark: SparkSession,
                         sch: Option[String]): Option[org.apache.spark.sql.types.StructType] =
    sch.map(org.apache.spark.sql.types.StructType.fromDDL)

  /** Write `df` into `data/<name>` and return its manifest entries
    * (with `statCol` zone stats when given — min/max per file,
    * computed in ONE pass over the just-written batch grouped by
    * `input_file_name()`).
    */
  private def writeBatchDir(spark: SparkSession, root: String,
                            name: String, df: DataFrame,
                            statCol: Option[String]): Seq[String] = {
    import org.apache.spark.sql.functions._
    val f = fs(spark, root)
    val batch = new Path(root, s"data/$name")
    if (f.exists(batch)) {
      // a leftover dir here is a crashed prior attempt ONLY if no
      // committed version references it — deleting a referenced dir
      // would break time travel for every version that reads it
      // (ADVICE r17: the replayed-epoch guard must not rely on the
      // latest manifest alone)
      require(!dirEverCommitted(spark, root, name),
        s"refusing to overwrite data/$name at $root: a committed " +
        "version references it (replayed batch names must be caught " +
        "by the caller's idempotence guard)")
      f.delete(batch, true)
    }
    df.write.mode("overwrite").parquet(batch.toString)
    statCol match {
      case None =>
        f.listStatus(batch)
          .filter(s => s.getPath.getName.endsWith(".parquet"))
          .map(s => s"data/$name/${s.getPath.getName}").sorted.toSeq
      case Some(c) =>
        spark.read.parquet(batch.toString)
          .groupBy(input_file_name().as("__f"))
          .agg(min(col(c).cast("long")).as("__mn"),
            max(col(c).cast("long")).as("__mx"))
          .collect()
          .map { r =>
            // URI scheme spellings vary (file:/ vs file:///): key on
            // the basename — batch files sit flat under data/<name>/
            val base = r.getString(0).split('/').last
            s"data/$name/$base\t${r.getLong(1)}\t${r.getLong(2)}"
          }.sorted.toSeq
    }
  }

  /** True iff ANY committed delta ever added a file under
    * `data/<dirName>/` — the durable form of the streaming sink's
    * replay test: a batch dir whose files were later rewritten out of
    * the current snapshot (compaction, merge) still counts as
    * committed, so a replayed epoch stays a no-op (ADVICE r17).
    */
  private def dirEverCommitted(spark: SparkSession, root: String,
                               dirName: String): Boolean = {
    val f = fs(spark, root)
    val prefix = s"+\tdata/$dirName/"
    (1L to latestVersion(spark, root)).exists { v =>
      f.exists(deltaPath(root, v)) &&
        readLines(spark, root, deltaPath(root, v))
          .exists(_.startsWith(prefix))
    }
  }

  /** Append `df` as the next version: the data lands in a fresh
    * immutable `data/batch-<v>` directory, and the commit is ONE
    * delta rename listing only the new files. A crash before the
    * rename leaves an orphan batch directory no reader can see.
    * Returns the committed version.
    */
  def append(spark: SparkSession, root: String, df: DataFrame): Long =
    appendNamed(spark, root, df, dirName = null)

  /** [[append]] with an explicit batch directory name (default
    * `batch-<v>`): the hook the streaming sink uses to make commits
    * IDEMPOTENT — a replayed micro-batch reuses its epoch-keyed name,
    * so "is this batch already committed" is one manifest-history
    * scan ([[graft.streaming.StreamingVersionedSink]]).
    */
  def appendNamed(spark: SparkSession, root: String, df: DataFrame,
                  dirName: String): Long = {
    require(!df.isEmpty, s"refusing to commit an empty version to $root")
    val v = latestVersion(spark, root) + 1
    val name = Option(dirName).getOrElse(s"batch-$v")
    require(!name.contains('/') && !name.contains('\t'),
      s"bad batch dir name: $name")
    val added = writeBatchDir(spark, root, name, df, None)
    commitDelta(spark, root, v, added, Seq.empty,
      schema = nextSchema(spark, root, v, df))
    v
  }

  /** The schema line the next commit records: additive evolution over
    * the prior version's recorded schema. A pre-schema table (older
    * commits never recorded one) stays schema-less — starting to
    * record mid-history could silently drop historical columns the
    * manifest never knew about.
    */
  private def nextSchema(spark: SparkSession, root: String, v: Long,
                         df: DataFrame): Option[String] = {
    val prior =
      if (v == 1) None else resolveState(spark, root, v - 1)._2
    if (v == 1 || prior.isDefined)
      Some(evolveSchema(prior, df, root))
    else None
  }

  /** True iff any committed version ever referenced a file under
    * `data/<dirName>/` — the streaming sink's replay test. Checked
    * against the FULL commit history, not just the latest snapshot:
    * a compaction or merge that rewrote the epoch's files out of the
    * current version must not open the door to committing the epoch
    * twice (ADVICE r17).
    */
  def hasBatchDir(spark: SparkSession, root: String,
                  dirName: String): Boolean =
    dirEverCommitted(spark, root, dirName)

  /** Snapshot read of `version` (default: latest): exactly that
    * manifest's file list, handed to the parquet reader directly — no
    * directory listing, and later appends can never change the result.
    */
  def readAsOf(spark: SparkSession, root: String,
               version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, root) else version
    require(v > 0, s"no committed versions at $root")
    val (entries, sch) = resolveState(spark, root, v)
    val files = entries.map(e => s"$root/${pathOf(e)}")
    require(files.nonEmpty,
      s"version $v at $root is removal-only down to zero files — " +
      "an empty frame has no schema; read an earlier version")
    readSchema(spark, sch) match {
      // the manifest-recorded schema AS OF v: evolved-away gaps
      // null-fill, later columns don't exist yet — and no footer merge
      case Some(st) => spark.read.schema(st).parquet(files: _*)
      case None     => spark.read.parquet(files: _*)
    }
  }

  /** [[append]] that ALSO records per-file min/max zone stats of
    * `statCol` (an integer column) in the manifest — Iceberg-style
    * file-level stats (public knowledge). Stats ride the manifest as
    * `relpath\tmin\tmax` entries (stat-less entries stay readable and
    * are simply never skipped). A [[readWhere]] on `statCol` then
    * opens ONLY the overlapping files — the manifest IS the zone map,
    * so a selective read on a 100 TB table is decided by small
    * metadata files, before any footer is touched.
    */
  def appendWithStats(spark: SparkSession, root: String, df: DataFrame,
                      statCol: String): Long = {
    require(!df.isEmpty, s"refusing to commit an empty version to $root")
    val v = latestVersion(spark, root) + 1
    val added = writeBatchDir(spark, root, s"batch-$v", df, Some(statCol))
    commitDelta(spark, root, v, added, Seq.empty,
      schema = nextSchema(spark, root, v, df))
    v
  }

  /** [[append]] that records each file's DISTINCT VALUE SET of a
    * low-cardinality string column in the manifest — the categorical
    * complement of [[appendWithStats]]'s numeric zone stats, i.e.
    * Hive/Iceberg partition pruning without the physical partition
    * layout (the value set rides the manifest as
    * `relpath\t#v1|v2|…`). A [[readWhereEq]] on the column then opens
    * ONLY the files whose set contains the value. A file exceeding
    * `maxDistinct` values records `#*` (read-always — a high-cardinality
    * column belongs in numeric zone stats or a sort order, not a value
    * list); values must not contain tab/pipe/newline.
    */
  def appendWithValueStats(spark: SparkSession, root: String, df: DataFrame,
                           catCol: String, maxDistinct: Int = 16): Long = {
    import org.apache.spark.sql.functions._
    require(!df.isEmpty, s"refusing to commit an empty version to $root")
    val v = latestVersion(spark, root) + 1
    val name = s"batch-$v"
    val f = fs(spark, root)
    val batch = new Path(root, s"data/$name")
    if (f.exists(batch)) {
      require(!dirEverCommitted(spark, root, name),
        s"refusing to overwrite data/$name at $root: a committed " +
        "version references it")
      f.delete(batch, true)
    }
    df.write.mode("overwrite").parquet(batch.toString)
    val added = spark.read.parquet(batch.toString)
      .groupBy(input_file_name().as("__f"))
      .agg(sort_array(collect_set(col(catCol).cast("string"))).as("__vs"))
      .collect()
      .map { r =>
        val base = r.getString(0).split('/').last
        val vs = r.getSeq[String](1)
        vs.foreach(s0 => require(
          s0 != null && !s0.exists(c => c == '\t' || c == '|' || c == '\n'),
          s"appendWithValueStats($root): $catCol value '$s0' carries a " +
          "reserved character (tab/pipe/newline)"))
        val set = if (vs.size > maxDistinct) "*" else vs.mkString("|")
        s"data/$name/$base\t#$set"
      }.sorted.toSeq
    commitDelta(spark, root, v, added, Seq.empty,
      schema = nextSchema(spark, root, v, df))
    v
  }

  /** Value-pruned snapshot read: open only the files whose recorded
    * value set contains `value` (or that carry no / overflowed value
    * stats — conservatively read), then apply the exact equality on
    * the survivors. Returns (frame, filesRead, filesTotal).
    */
  def readWhereEq(spark: SparkSession, root: String, catCol: String,
                  value: String,
                  version: Long = -1L): (DataFrame, Int, Int) = {
    // functions._ would shadow the `version` param (functions.version)
    import org.apache.spark.sql.functions.col
    val v = if (version < 0) latestVersion(spark, root) else version
    require(v > 0, s"no committed versions at $root")
    val (rawEntries, sch) = resolveState(spark, root, v)
    val entries = rawEntries.map { line =>
      line.split('\t') match {
        case Array(p, s) if s.startsWith("#") =>
          (p, if (s == "#*") None else Some(s.substring(1).split('|').toSet))
        case parts => (parts.head, None) // numeric/stat-less: cannot skip
      }
    }
    val keep = entries.filter {
      case (_, Some(set)) => set.contains(value)
      case (_, None)      => true
    }
    require(keep.nonEmpty || entries.isEmpty,
      s"readWhereEq($root): every file skipped — empty frame has no " +
      s"schema; no file contains $catCol = '$value'")
    val files = keep.map(e => s"$root/${e._1}")
    val base = readSchema(spark, sch) match {
      case Some(st) => spark.read.schema(st).parquet(files: _*)
      case None     => spark.read.parquet(files: _*)
    }
    (base.filter(col(catCol).cast("string") === value), keep.size, entries.size)
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
    val (rawEntries, sch) = resolveState(spark, root, v)
    val entries = rawEntries.map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => (p, Some((mn.toLong, mx.toLong)))
        // stat-less OR categorical value stats: numeric skipping
        // cannot prove these files untouched — always read
        case parts => (parts.head, None)
      }
    }
    val keep = entries.filter {
      case (_, Some((mn, mx))) => mx >= lo && mn <= hi
      case (_, None)           => true // stat-less: cannot skip
    }
    require(keep.nonEmpty || entries.isEmpty,
      s"readWhere($root): every file skipped — empty frame has no " +
      "schema; read a wider range or readAsOf + filter")
    val files = keep.map(e => s"$root/${e._1}")
    val base = readSchema(spark, sch) match {
      case Some(st) => spark.read.schema(st).parquet(files: _*)
      case None     => spark.read.parquet(files: _*)
    }
    val frame = base.filter(col(statCol).cast("long").between(lo, hi))
    (frame, keep.size, entries.size)
  }

  /** The stat-carrying entries of a version, failing loudly on any
    * stat-less file — the precondition shared by every COW rewrite
    * (a file without stats cannot be proven untouched).
    */
  private def statEntries(spark: SparkSession, root: String, v: Long,
                          keyCol: String,
                          op: String): Seq[(String, Long, Long)] =
    resolveEntries(spark, root, v).map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => (p, mn.toLong, mx.toLong)
        case parts => throw new IllegalArgumentException(
          s"$op($root): file ${parts.head} carries no numeric $keyCol " +
          "stats — this rewrite needs a fully stat-committed table " +
          "(appendWithStats; categorical value stats cannot prove a " +
          "key range untouched)")
      }
    }

  /** Any of the SORTED `keys` inside [mn, mx]? Binary search — the
    * per-file pruning test is O(log keys), not O(keys) (ADVICE r17).
    */
  private def anyKeyInRange(sorted: Array[Long], mn: Long,
                            mx: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(sorted, mn)
    val from = if (i >= 0) i else -(i + 1)
    from < sorted.length && sorted(from) <= mx
  }

  /** An update/delete batch's distinct keys, driver-side and BOUNDED:
    * a key batch is an ingest batch, not a corpus — above `maxKeys`
    * this refuses loudly instead of silently building a driver array
    * and a per-key expression tree (the incrementalDedup
    * maxBroadcastBatch discipline).
    */
  private def collectKeys(updates: DataFrame, keyCol: String,
                          maxKeys: Int, op: String): Array[Long] = {
    import org.apache.spark.sql.functions._
    val keys = updates.select(col(keyCol).cast("long"))
      .distinct().limit(maxKeys + 1).collect().map(_.getLong(0))
    require(keys.length <= maxKeys,
      s"$op: more than $maxKeys distinct keys in one batch — split the " +
      "batch, or raise maxKeys if the driver can hold the key set")
    keys.sorted
  }

  /** Membership predicate for a bounded key set: a literal IN —
    * codegen-friendly, pushes into parquet row-group stats, and
    * replayable verbatim by the oracle. The `maxKeys` bound enforced
    * at collection keeps the expression tree tractable; an unbounded
    * key set belongs in a broadcast anti-join, which is exactly what
    * the bound forces the caller to choose explicitly.
    */
  private def keyPred(keyCol: String, keys: Array[Long]): Column = {
    import org.apache.spark.sql.functions._
    col(keyCol).cast("long").isin(keys.toSeq: _*)
  }

  /** Copy-on-write MERGE by key — Delta/Iceberg's upsert, at FILE
    * granularity: rows of `updates` replace same-key rows, new keys
    * insert. Only the files whose manifest [min, max] key range
    * overlaps the update keys are rewritten (everything the zone
    * stats can prove untouched keeps its EXACT file path in the new
    * manifest — zero data movement, the property that makes a 1%-key
    * merge on a 100 TB table cost 1%, not 100%). The rewritten
    * survivors and the update rows land in the new version's batch
    * directory with fresh stats; the commit is one delta rename
    * (removed = rewritten files, added = new files), so a crash
    * mid-merge leaves only an orphan batch and every committed
    * version still time-travels.
    *
    * Requires a table whose commits all carried stats on `keyCol`
    * ([[appendWithStats]]). Update keys are collected driver-side
    * under the `maxKeys` bound. Returns (newVersion, filesRewritten,
    * filesKept).
    */
  def mergeByKey(spark: SparkSession, root: String, updates: DataFrame,
                 keyCol: String,
                 maxKeys: Int = 100000): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(!updates.isEmpty, s"refusing an empty merge into $root")
    val prev = latestVersion(spark, root)
    require(prev > 0, s"no committed versions at $root to merge into")
    val keys = collectKeys(updates, keyCol, maxKeys, s"mergeByKey($root)")
    val entries = statEntries(spark, root, prev, keyCol, "mergeByKey")
    val (affected, kept) = entries.partition { case (_, mn, mx) =>
      anyKeyInRange(keys, mn, mx)
    }
    val v = prev + 1
    val sch = readSchema(spark, resolveState(spark, root, prev)._2)
    val survivors =
      if (affected.isEmpty) updates
      else {
        val files = affected.map(e => s"$root/${e._1}")
        // survivors read under the table schema so a schema-evolved
        // table's older files null-fill before the strict union
        val scan = sch match {
          case Some(st) => spark.read.schema(st).parquet(files: _*)
          case None     => spark.read.parquet(files: _*)
        }
        scan.filter(!keyPred(keyCol, keys)).unionByName(updates)
      }
    val added = writeBatchDir(spark, root, s"batch-$v", survivors,
      Some(keyCol))
    commitDelta(spark, root, v, added, affected.map(_._1))
    (v, affected.size, kept.size)
  }

  /** Copy-on-write DELETE by key: same file-granular discipline as
    * [[mergeByKey]] minus the union — zone stats prune to the
    * overlapping files, only those are rewritten without the keys,
    * everything else keeps its exact path. A file whose every row is
    * deleted simply vanishes (a removal can make the version's ADDED
    * set empty — a pure-removal commit, which [[readChanges]] /
    * [[readChangesTyped]] already understand). Returns (newVersion,
    * rowsDeleted, filesRewritten, filesKept). No-match deletes are
    * refused: committing a version identical to its parent would be
    * noise.
    */
  def deleteWhere(spark: SparkSession, root: String, keyDf: DataFrame,
                  keyCol: String,
                  maxKeys: Int = 100000): (Long, Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(!keyDf.isEmpty, s"refusing an empty delete at $root")
    val prev = latestVersion(spark, root)
    require(prev > 0, s"no committed versions at $root to delete from")
    val keys = collectKeys(keyDf, keyCol, maxKeys, s"deleteWhere($root)")
    val entries = statEntries(spark, root, prev, keyCol, "deleteWhere")
    val (affected, kept) = entries.partition { case (_, mn, mx) =>
      anyKeyInRange(keys, mn, mx)
    }
    require(affected.nonEmpty,
      s"deleteWhere($root): no file's key range overlaps the batch — " +
      "nothing to delete")
    val files = affected.map(e => s"$root/${e._1}")
    val scan = readSchema(spark, resolveState(spark, root, prev)._2) match {
      case Some(st) => spark.read.schema(st).parquet(files: _*)
      case None     => spark.read.parquet(files: _*)
    }
    val hit = scan.filter(keyPred(keyCol, keys)).count()
    require(hit > 0,
      s"deleteWhere($root): the key batch matches no rows — refusing " +
      "a no-op version")
    val survivors = scan.filter(!keyPred(keyCol, keys))
    val v = prev + 1
    val added =
      if (survivors.isEmpty) Seq.empty[String] // whole files deleted
      else writeBatchDir(spark, root, s"batch-$v", survivors, Some(keyCol))
    commitDelta(spark, root, v, added, affected.map(_._1))
    (v, hit, affected.size, kept.size)
  }

  /** OPTIMIZE — the version-preserving small-file rewrite: read the
    * current snapshot, rewrite it as `numFiles` files in one new
    * batch directory, commit (removed = every prior file, added = the
    * new ones). CONTENT IS UNCHANGED — the new version reads
    * byte-identical to its parent; what changes is the file count a
    * long-running [[graft.streaming.StreamingVersionedSink]] stream
    * accretes (one tiny file per epoch) and therefore every later
    * read's open fan-out. On a stat-carrying table pass `statCol`:
    * the rewrite RANGE-partitions on it so the fresh per-file zone
    * stats stay tight (a hash repartition would smear every file
    * across the key space and lobotomize [[readWhere]] pruning).
    * Returns (newVersion, filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, root: String, numFiles: Int = 1,
              statCol: Option[String] = None): (Long, Int, Int) = {
    import org.apache.spark.sql.functions._
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val prev = latestVersion(spark, root)
    require(prev > 0, s"no committed versions at $root to compact")
    val before = resolveEntries(spark, root, prev)
    val snapshot = readAsOf(spark, root, prev)
    val arranged = statCol match {
      case Some(c) if numFiles > 1 =>
        snapshot.repartitionByRange(numFiles, col(c))
      case _ => snapshot.repartition(numFiles)
    }
    val v = prev + 1
    val added = writeBatchDir(spark, root, s"batch-$v", arranged, statCol)
    commitDelta(spark, root, v, added, before.map(pathOf))
    (v, before.size, added.size)
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
    val (addedDf, removedDf) = changedFrames(spark, root, fromV, toV)
    if (removedDf.isEmpty) addedDf
    else addedDf.exceptAll(removedDf)
  }

  /** [[readChanges]] with explicit change types — the consumer-facing
    * CDC shape: one `_change_type` column, `insert` rows are the
    * net-new multiset (added EXCEPT ALL removed), `delete` rows the
    * net-gone multiset (removed EXCEPT ALL added). A COW merge's
    * update therefore surfaces as delete(old row) + insert(new row) —
    * Delta's update_preimage/postimage pair, collapsed to its
    * row-multiset essence.
    */
  def readChangesTyped(spark: SparkSession, root: String,
                       fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val (addedDf, removedDf) = changedFrames(spark, root, fromV, toV)
    addedDf.exceptAll(removedDf).withColumn("_change_type", lit("insert"))
      .unionByName(
        removedDf.exceptAll(addedDf)
          .withColumn("_change_type", lit("delete")))
  }

  /** The (added, removed) row frames of a version-range diff; each is
    * schema-stable even when its file set is empty (an impossible
    * filter over the other side's files keeps the table schema).
    */
  private def changedFrames(spark: SparkSession, root: String,
                            fromV: Long,
                            toV: Long): (DataFrame, DataFrame) = {
    require(fromV >= 0 && toV > fromV,
      s"need 0 <= fromV < toV, got $fromV, $toV")
    val fromFiles =
      if (fromV == 0) Set.empty[String]
      else resolveEntries(spark, root, fromV).map(pathOf).toSet
    val (toEntries, toSchema) = resolveState(spark, root, toV)
    val toFiles = toEntries.map(pathOf).toSet
    val added = (toFiles -- fromFiles).toSeq.sorted
    val removed = (fromFiles -- toFiles).toSeq.sorted
    require(added.nonEmpty || removed.nonEmpty,
      s"readChanges($root): v$fromV and v$toV share every file — no changes")
    // BOTH sides read under toV's schema (when recorded) so the
    // EXCEPT ALLs align even across a schema-evolving range
    val st = readSchema(spark, toSchema)
    def frame(files: Seq[String], other: Seq[String]): DataFrame = {
      val fs0 = (if (files.nonEmpty) files else other).map(p => s"$root/$p")
      val df = st match {
        case Some(s) => spark.read.schema(s).parquet(fs0: _*)
        case None    => spark.read.parquet(fs0: _*)
      }
      if (files.nonEmpty) df else df.limit(0)
    }
    (frame(added, removed), frame(removed, added))
  }

  /** Drop data files referenced by NO manifest (crashed appends,
    * aborted writers) and old enough to be safely presumed dead:
    * an IN-FLIGHT append's freshly written batch (parquet on disk,
    * delta rename pending) is indistinguishable from a crashed
    * orphan, so anything younger than `retentionMs` is left alone —
    * the Delta vacuum-retention discipline (ADVICE r17). Pass 0 only
    * under the same single-writer exclusion as the appends. The
    * referenced set is every file ANY delta ever added — O(versions)
    * tiny manifest reads, no snapshot resolution. Returns the deleted
    * batch-dir names. Never touches a file any committed version can
    * still read — time travel to every version stays intact.
    */
  def vacuum(spark: SparkSession, root: String,
             retentionMs: Long = 600000L): Seq[String] = {
    val f = fs(spark, root)
    val dataDir = new Path(root, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val latest = latestVersion(spark, root)
    val referenced: Set[String] = (1L to latest).flatMap { v =>
      if (!f.exists(deltaPath(root, v))) Seq.empty
      else readLines(spark, root, deltaPath(root, v))
        .collect { case l if l.startsWith("+\t") => pathOf(l.substring(2)) }
    }.toSet
    val now = System.currentTimeMillis()
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    for (batch <- f.listStatus(dataDir) if batch.isDirectory) {
      val stats = f.listStatus(batch.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
      val rels = stats.map(s =>
        s"data/${batch.getPath.getName}/${s.getPath.getName}")
      val young = batch.getModificationTime > now - retentionMs ||
        stats.exists(_.getModificationTime > now - retentionMs)
      if (rels.nonEmpty && !young &&
          rels.forall(r => !referenced.contains(r))) {
        f.delete(batch.getPath, true)
        deleted += batch.getPath.getName
      }
    }
    deleted.toSeq
  }
}
