package graft

import org.apache.spark.sql.functions._
import graft.search.{Ann, IndexSync}
import graft.sources.Versioned

/** CDC-driven incremental index maintenance (VERDICT r18 item 6): a
  * versioned corpus table's merge + delete drive IVF mutations through
  * [[graft.search.IndexSync]], and the synced index probes EXACTLY the
  * new corpus snapshot — never a rebuild, never a stale row.
  */
class IndexCycleSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  // ids 0..11 near (1,0,0,0) ("A"), 12..23 near (0,1,0,0) ("B")
  private def corpus: org.apache.spark.sql.DataFrame =
    ((0 until 12).map(i =>
        (i.toLong, Seq(1.0f + 0.01f * i, 0.002f * i, 0.0f, 0.0f), i % 3)) ++
      (12 until 24).map(i =>
        (i.toLong, Seq(0.002f * i, 1.0f + 0.01f * i, 0.0f, 0.0f), i % 3)))
      .toDF("vec_id", "embedding", "label")

  private def bruteTopK(corp: org.apache.spark.sql.DataFrame,
                        q: Seq[Double], k: Int): Seq[Long] =
    corp.withColumn("s", graft.functions.CosineSimilarity(
        $"embedding", array(q.map(lit): _*)))
      .orderBy($"s".desc, $"vec_id".asc).limit(k)
      .select("vec_id").as[Long].collect().toSeq

  test("merge + delete on the versioned corpus -> sync -> probe parity " +
    "with brute force over the NEW snapshot; audit trail records the " +
    "corpus->index version mapping; re-sync is a no-op") {
    val table = fresh("graft_sync_tbl")
    val idx = fresh("graft_sync_idx")
    Versioned.appendWithStats(spark, table, corpus.repartition(1), "vec_id")
    Ann.writeIvf(Ann.buildIvf(Versioned.readAsOf(spark, table, 1L),
      nCentroids = 2, seed = 7L, initMode = "random"), idx)
    IndexSync.markSynced(spark, idx, 1L) // anchor the feed at v1
    assert(IndexSync.syncedCorpusVersion(spark, idx).contains(1L))
    assert(IndexSync.syncToLatest(spark, table, idx).isEmpty,
      "a caught-up index must not sync")

    // the corpus lives: id 5 moves cluster A -> B, id 100 is born (v2),
    // id 3 dies (v3)
    val updates = Seq(
      (5L, Seq(0.01f, 1.5f, 0.0f, 0.0f), 2),
      (100L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    Versioned.mergeByKey(spark, table, updates.repartition(1), "vec_id")
    Versioned.deleteWhere(spark, table, Seq(3L).toDF("vec_id"), "vec_id")
    assert(Versioned.latestVersion(spark, table) == 3L)

    val r = IndexSync.syncToLatest(spark, table, idx).get
    assert(r.corpusFromV == 1L && r.corpusToV == 3L, r.toString)
    assert(r.nUpserted == 2L, s"update post-image + insert: $r")
    assert(r.nDeleted == 1L, s"only id 3 is a PURE delete: $r")
    // upsert commit + delete commit on top of the v1 build
    assert(r.indexVersion == 3L, r.toString)
    assert(IndexSync.syncedCorpusVersion(spark, idx).contains(3L))

    // probe parity over the NEW snapshot, both clusters + the new axis
    val snap = Versioned.readAsOf(spark, table)
    val index = Ann.readIvf(spark, idx)
    assert(index.assigned.count() == snap.count(),
      "synced index row count != corpus snapshot")
    for (q <- Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
        Seq(0.0, 0.0, 1.0, 0.0))) {
      val got = Ann.ivfSearch(index, q, k = 6, nprobe = index.centers.length)
        .select("vec_id").as[Long].collect().toSeq
      assert(got == bruteTopK(snap, q, 6),
        s"probe != brute force over the mutated corpus for q=$q")
    }
    // the moved id serves from its NEW neighborhood, the dead id never
    val nearB = Ann.ivfSearch(index, Seq(0.0, 1.0, 0.0, 0.0), k = 24,
      nprobe = index.centers.length).select("vec_id").as[Long].collect()
    assert(nearB.contains(5L) && !nearB.contains(3L))

    // re-sync after catching up: no-op, version map unchanged
    assert(IndexSync.syncToLatest(spark, table, idx).isEmpty)
    assert(Ann.latestIvfVersion(spark, idx) == 3L)

    // an unanchored index refuses the incremental feed loudly
    val idx2 = fresh("graft_sync_idx2")
    Ann.writeIvf(Ann.buildIvf(Versioned.readAsOf(spark, table),
      nCentroids = 2, seed = 7L, initMode = "random"), idx2)
    val ex = intercept[IllegalStateException](
      IndexSync.syncToLatest(spark, table, idx2))
    assert(ex.getMessage.contains("_corpus_sync"), ex.getMessage)
  }

  test("streaming ingest -> versioned table -> CDC -> index: the " +
    "exactly-once sink's epochs drive incremental index syncs, probes " +
    "track the stream, replays stay invisible to the index") {
    import graft.streaming.StreamingVersionedSink
    val table = fresh("graft_stream_tbl")
    val idx = fresh("graft_stream_idx")
    def vecs(ids: Range, axis: Int): org.apache.spark.sql.DataFrame =
      ids.map { i =>
        val e = Array.fill(4)(0.0f); e(axis) = 1.0f + 0.01f * i
        (i.toLong, e.toSeq, i % 3)
      }.toDF("vec_id", "embedding", "label")
    // epoch 0 seeds the corpus; the index anchors at that version
    assert(StreamingVersionedSink.commitBatch(spark, table,
      vecs(0 until 12, 0).repartition(1), 0L).contains(1L))
    Ann.writeIvf(Ann.buildIvf(Versioned.readAsOf(spark, table, 1L),
      nCentroids = 2, seed = 7L, initMode = "random"), idx)
    IndexSync.markSynced(spark, idx, 1L)
    // epochs 1-2 stream in new neighborhoods
    StreamingVersionedSink.commitBatch(spark, table,
      vecs(100 until 106, 1).repartition(1), 1L)
    StreamingVersionedSink.commitBatch(spark, table,
      vecs(200 until 203, 2).repartition(1), 2L)
    val r1 = IndexSync.syncToLatest(spark, table, idx).get
    assert(r1.corpusFromV == 1L && r1.corpusToV == 3L &&
      r1.nUpserted == 9L && r1.nDeleted == 0L, r1.toString)
    val snap1 = Versioned.readAsOf(spark, table)
    val i1 = Ann.readIvf(spark, idx)
    assert(i1.assigned.count() == snap1.count())
    for (axis <- 0 to 2) {
      val q = Seq.tabulate(4)(j => if (j == axis) 1.0 else 0.0)
      assert(Ann.ivfSearch(i1, q, k = 5, nprobe = i1.centers.length)
        .select("vec_id").as[Long].collect().toSeq == bruteTopK(snap1, q, 5),
        s"probe != brute after streamed sync, axis $axis")
    }
    // a REPLAYED epoch is a table no-op, so the next sync sees nothing
    assert(StreamingVersionedSink.commitBatch(spark, table,
      vecs(999 until 1000, 0), 1L).isEmpty)
    assert(IndexSync.syncToLatest(spark, table, idx).isEmpty,
      "a replayed epoch leaked into the index feed")
    // one more genuine epoch; only ITS rows sync
    StreamingVersionedSink.commitBatch(spark, table,
      vecs(300 until 302, 3).repartition(1), 3L)
    val r2 = IndexSync.syncToLatest(spark, table, idx).get
    assert(r2.corpusFromV == 3L && r2.nUpserted == 2L, r2.toString)
    val snap2 = Versioned.readAsOf(spark, table)
    val i2 = Ann.readIvf(spark, idx)
    val q3 = Seq(0.0, 0.0, 0.0, 1.0)
    assert(Ann.ivfSearch(i2, q3, k = 2, nprobe = i2.centers.length)
      .select("vec_id").as[Long].collect().toSeq == bruteTopK(snap2, q3, 2))
  }

  test("a pure-append corpus change syncs as one upsert commit; null " +
    "delete keys and oversized ranges are refused") {
    val table = fresh("graft_sync_tbl2")
    val idx = fresh("graft_sync_idx3")
    Versioned.appendWithStats(spark, table, corpus.repartition(1), "vec_id")
    Ann.writeIvf(Ann.buildIvf(Versioned.readAsOf(spark, table, 1L),
      nCentroids = 2, seed = 7L, initMode = "random"), idx)
    IndexSync.markSynced(spark, idx, 1L)
    Versioned.appendWithStats(spark, table,
      Seq((200L, Seq(0.0f, 0.0f, 0.0f, 1.0f), 0))
        .toDF("vec_id", "embedding", "label").repartition(1), "vec_id")
    val r = IndexSync.syncToLatest(spark, table, idx).get
    assert(r.nUpserted == 1L && r.nDeleted == 0L && r.indexVersion == 2L, r.toString)
    val snap = Versioned.readAsOf(spark, table)
    val index = Ann.readIvf(spark, idx)
    val q = Seq(0.0, 0.0, 0.0, 1.0)
    assert(Ann.ivfSearch(index, q, k = 3, nprobe = index.centers.length)
      .select("vec_id").as[Long].collect().toSeq == bruteTopK(snap, q, 3))
    // a delete batch larger than maxBatch is refused, not collected
    Versioned.deleteWhere(spark, table,
      (12L until 24L).toDF("vec_id"), "vec_id")
    val ex = intercept[IllegalArgumentException](
      IndexSync.sync(spark, table, idx, 2L, 3L, maxBatch = 5))
    assert(ex.getMessage.contains("more than 5 deleted keys"), ex.getMessage)
  }
}
