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

  /** Append `df` as the next version: the data lands in a fresh
    * immutable `data/batch-<v>` directory, and the commit is ONE
    * manifest rename (prior files + the new ones). A crash before the
    * rename leaves an orphan batch directory no reader can see.
    * Returns the committed version.
    */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(!df.isEmpty, s"refusing to commit an empty version to $root")
    val f = fs(spark, root)
    val v = latestVersion(spark, root) + 1
    val batch = new Path(root, s"data/batch-$v")
    if (f.exists(batch)) f.delete(batch, true) // dead prior attempt
    df.write.mode("overwrite").parquet(batch.toString)
    val newFiles = f.listStatus(batch)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/batch-$v/${s.getPath.getName}").sorted
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

  /** Snapshot read of `version` (default: latest): exactly that
    * manifest's file list, handed to the parquet reader directly — no
    * directory listing, and later appends can never change the result.
    */
  def readAsOf(spark: SparkSession, root: String,
               version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, root) else version
    require(v > 0, s"no committed versions at $root")
    val files = readManifest(spark, root, v).map(rel => s"$root/$rel")
    spark.read.parquet(files: _*)
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
        if (f.exists(manifestPath(root, v))) readManifest(spark, root, v)
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
