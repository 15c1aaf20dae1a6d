package graft

import org.apache.spark.sql.functions._
import graft.sources.Versioned

/** Versioned table with manifest-committed snapshots (q226). */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_versioned").toString + "/t"

  test("append commits monotonic versions; snapshot reads are stable " +
    "under later appends (time travel)") {
    val root = freshRoot()
    assert(Versioned.latestVersion(spark, root) == 0L)
    assert(Versioned.append(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")) == 1L)
    assert(Versioned.append(spark, root,
      Seq((3L, "c")).toDF("id", "s")) == 2L)
    assert(Versioned.latestVersion(spark, root) == 2L)
    val v1Before = Versioned.readAsOf(spark, root, 1L)
      .as[(Long, String)].collect().toSet
    assert(v1Before == Set((1L, "a"), (2L, "b")))
    assert(Versioned.readAsOf(spark, root).count() == 3L) // latest
    // a third append must not change what v1 or v2 readers see
    Versioned.append(spark, root, Seq((4L, "d")).toDF("id", "s"))
    assert(Versioned.readAsOf(spark, root, 1L)
      .as[(Long, String)].collect().toSet == v1Before)
    assert(Versioned.readAsOf(spark, root, 2L).count() == 3L)
    assert(Versioned.readAsOf(spark, root, 3L).count() == 4L)
  }

  test("a crashed append (orphan batch, no manifest) is invisible to " +
    "readers; vacuum reclaims it and never touches committed files") {
    val root = freshRoot()
    Versioned.append(spark, root, Seq((1L, "a")).toDF("id", "s"))
    Versioned.append(spark, root, Seq((2L, "b")).toDF("id", "s"))
    // simulate a writer that died after the data write, before the
    // manifest rename: batch-3 exists, no v000003.manifest
    Seq((99L, "orphan")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$root/data/batch-3")
    assert(Versioned.latestVersion(spark, root) == 2L)
    assert(Versioned.readAsOf(spark, root).count() == 2L,
      "orphan batch leaked into a snapshot read")
    val deleted = Versioned.vacuum(spark, root)
    assert(deleted == Seq("batch-3"), s"vacuum deleted $deleted")
    // every committed version still reads after vacuum
    assert(Versioned.readAsOf(spark, root, 1L).count() == 1L)
    assert(Versioned.readAsOf(spark, root, 2L).count() == 2L)
    // and a subsequent append reuses the slot cleanly
    assert(Versioned.append(spark, root,
      Seq((3L, "c")).toDF("id", "s")) == 3L)
    assert(Versioned.readAsOf(spark, root).count() == 3L)
    assert(Versioned.vacuum(spark, root).isEmpty)
  }

  test("appendWithStats + readWhere: file skipping from the manifest " +
    "zone stats; stat-less files are conservatively read; superset " +
    "cut loses no rows") {
    val root = freshRoot()
    // three stat-carrying files with disjoint value bands
    Versioned.appendWithStats(spark,
      root, (0L until 10L).map(i => (i, i)).toDF("id", "v")
        .repartition(1), "v")
    Versioned.appendWithStats(spark,
      root, (100L until 110L).map(i => (i, i)).toDF("id", "v")
        .repartition(1), "v")
    Versioned.appendWithStats(spark,
      root, (200L until 210L).map(i => (i, i)).toDF("id", "v")
        .repartition(1), "v")
    val (f1, read1, total1) = Versioned.readWhere(spark, root, "v", 100L, 109L)
    assert((read1, total1) == (1, 3), s"expected 1/3 files, got $read1/$total1")
    assert(f1.count() == 10L)
    // range straddling two bands reads exactly those two
    val (f2, read2, _) = Versioned.readWhere(spark, root, "v", 5L, 105L)
    assert(read2 == 2 && f2.count() == 11L) // 5..9 and 100..105
    // a plain (stat-less) append can never be skipped, but the exact
    // predicate still applies
    Versioned.append(spark, root,
      Seq((300L, 300L)).toDF("id", "v").repartition(1))
    val (f3, read3, total3) = Versioned.readWhere(spark, root, "v", 100L, 109L)
    assert((read3, total3) == (2, 4), "stat-less file must be read")
    assert(f3.count() == 10L, "exact predicate must drop stat-less rows")
    // every file skipped -> refused (empty frame has no schema)
    val ex = intercept[IllegalArgumentException](
      Versioned.readWhere(spark, root, "v", 5000L, 6000L, version = 3L))
    assert(ex.getMessage.contains("every file skipped"))
    // time travel composes with pruning: at v1 only the first file exists
    val (_, read4, total4) = Versioned.readWhere(spark, root, "v", 0L, 9L,
      version = 1L)
    assert((read4, total4) == (1, 1))
  }

  test("mergeByKey: file-granular copy-on-write — untouched files keep " +
    "their paths, updates replace, inserts land, time travel intact") {
    val root = freshRoot()
    Versioned.appendWithStats(spark, root,
      (0L until 10L).map(i => (i, i * 10)).toDF("id", "v")
        .repartition(1), "id")
    Versioned.appendWithStats(spark, root,
      (100L until 110L).map(i => (i, i * 10)).toDF("id", "v")
        .repartition(1), "id")
    // regression (found by q228): readAsOf must parse stats manifests
    assert(Versioned.readAsOf(spark, root).count() == 20L)
    // update id 3, insert id 7000 -> only the low file's range is hit
    val updates = Seq((3L, 999L), (7000L, 7L)).toDF("id", "v")
    val (v, rewritten, kept) = Versioned.mergeByKey(spark, root,
      updates.repartition(1), "id")
    assert((v, rewritten, kept) == (3L, 1, 1), s"got ($v, $rewritten, $kept)")
    val after = Versioned.readAsOf(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(after.size == 21 && after(3L) == 999L && after(7000L) == 7L &&
      after(5L) == 50L && after(105L) == 1050L)
    // the pre-merge snapshot is untouched
    val before = Versioned.readAsOf(spark, root, 2L)
      .as[(Long, Long)].collect().toMap
    assert(before.size == 20 && before(3L) == 30L && !before.contains(7000L))
    // old files still referenced by old manifests survive vacuum
    assert(Versioned.vacuum(spark, root).isEmpty)
    assert(Versioned.readAsOf(spark, root, 1L).count() == 10L)
    // a merge into a stat-less table is refused, not a silent rewrite
    val root2 = freshRoot()
    Versioned.append(spark, root2, Seq((1L, 1L)).toDF("id", "v"))
    val ex = intercept[IllegalArgumentException](
      Versioned.mergeByKey(spark, root2, Seq((1L, 2L)).toDF("id", "v"), "id"))
    assert(ex.getMessage.contains("no id stats"))
  }

  test("StreamingVersionedSink: streamed micro-batches land as " +
    "versions, replays are no-ops, empties skipped, table == stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingVersionedSink
    val root = freshRoot()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("id", "s")
      .writeStream
      .foreachBatch(StreamingVersionedSink.handler(spark, root) _)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(Versioned.readAsOf(spark, root)
        .as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      // each micro-batch is its own time-travelable version
      assert(Versioned.readAsOf(spark, root, 1L).count() == 2L)
    } finally q.stop()
    val vAfterStream = Versioned.latestVersion(spark, root)
    // replay of an already-committed epoch is a no-op (the
    // at-least-once crash case): same batchId, even different data
    val replay = Seq((99L, "dup")).toDF("id", "s")
    assert(StreamingVersionedSink.commitBatch(spark, root, replay, 0L).isEmpty)
    assert(Versioned.latestVersion(spark, root) == vAfterStream)
    assert(Versioned.readAsOf(spark, root).count() == 3L,
      "replayed epoch added duplicate rows")
    // empty epochs are skipped, not committed
    assert(StreamingVersionedSink.commitBatch(spark, root,
      Seq.empty[(Long, String)].toDF("id", "s"), 50L).isEmpty)
    // a NEW epoch still commits
    assert(StreamingVersionedSink.commitBatch(spark, root, replay, 60L)
      .contains(vAfterStream + 1))
    assert(Versioned.readAsOf(spark, root).count() == 4L)
  }

  test("readChanges: manifest-diff CDC — appends yield the new rows, " +
    "a COW merge yields exactly the updates+inserts, I/O bounded to " +
    "the diffed files") {
    val root = freshRoot()
    Versioned.appendWithStats(spark, root,
      (0L until 10L).map(i => (i, i * 10)).toDF("id", "v")
        .repartition(1), "id")
    Versioned.appendWithStats(spark, root,
      (100L until 105L).map(i => (i, i * 10)).toDF("id", "v")
        .repartition(1), "id")
    // pure append: changes v1 -> v2 are the second batch, verbatim
    assert(Versioned.readChanges(spark, root, 1L, 2L)
      .as[(Long, Long)].collect().toSet ==
      (100L until 105L).map(i => (i, i * 10)).toSet)
    // changes since table birth (fromV = 0) are everything
    assert(Versioned.readChanges(spark, root, 0L, 2L).count() == 15L)
    // COW merge: update id 3, insert id 7000 -> the v2 -> v3 change
    // set is exactly those two rows (carried-over rows cancel)
    Versioned.mergeByKey(spark, root,
      Seq((3L, 999L), (7000L, 7L)).toDF("id", "v").repartition(1), "id")
    assert(Versioned.readChanges(spark, root, 2L, 3L)
      .as[(Long, Long)].collect().toSet == Set((3L, 999L), (7000L, 7L)))
    // and spanning append + merge composes
    assert(Versioned.readChanges(spark, root, 1L, 3L)
      .as[(Long, Long)].collect().toSet ==
      ((100L until 105L).map(i => (i, i * 10)).toSet +
        ((3L, 999L)) + ((7000L, 7L))))
    // identical versions refused (no change files to read)
    val ex = intercept[IllegalArgumentException](
      Versioned.readChanges(spark, root, 3L, 3L))
    assert(ex.getMessage.contains("fromV < toV"))
  }

  test("empty commits are refused; unknown versions error clearly") {
    val root = freshRoot()
    val ex = intercept[IllegalArgumentException](
      Versioned.append(spark, root, Seq.empty[(Long, String)].toDF("id", "s")))
    assert(ex.getMessage.contains("empty version"))
    Versioned.append(spark, root, Seq((1L, "a")).toDF("id", "s"))
    val ex2 = intercept[IllegalArgumentException](
      Versioned.readAsOf(spark, root, 7L))
    assert(ex2.getMessage.contains("no version 7"))
  }
}
