package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.search.Ann

/** The composed index-maintenance cycle, end-to-end — the realistic
  * production loop the per-piece specs (AnnSpec append / rebalance,
  * VectorDbSpec compact) each cover in isolation:
  *
  *   build + persist → STREAMING ingest (appendToIvf per micro-batch,
  *   skewed toward one region) → reload → rebalanceIvfUntil (list-size
  *   invariant restored) → compacting rewrite (append-accumulated
  *   small files collapse) → serve (probe results == brute force).
  *
  * This is the 100 TB shape in miniature: appends concentrate drift
  * into hot inverted lists AND fragment the list partitions into
  * per-batch small files; maintenance must fix both without ever
  * shuffling the full corpus, and serving afterwards must still rank
  * exactly like a brute-force scan.
  */
class IndexCycleSpec extends SparkSpec {
  import spark.implicits._

  private def vecA(i: Int): Seq[Float] = // cluster around (1,0,0,0), spread
    Seq(1.0f + 0.01f * i, 0.002f * i, 0.0f, 0.0f)
  private def vecB(i: Int): Seq[Float] = // cluster around (0,1,0,0)
    Seq(0.002f * i, 1.0f + 0.01f * i, 0.0f, 0.0f)

  test("streaming append -> rebalance -> compact -> serve: cycle holds the invariants") {
    val path = Files.createTempDirectory("graft_ivf_cycle").toString + "/ivf"
    val maxListSize = 12L

    // 1. initial build: 10 vectors per cluster, 2 centroids
    val initial = ((0 until 10).map(i => (i.toLong, vecA(i))) ++
      (10 until 20).map(i => (i.toLong, vecB(i)))).toDF("vec_id", "embedding")
    Ann.writeIvf(Ann.buildIvf(initial, nCentroids = 2, seed = 7L,
      initMode = "random"), path)

    // 2. streaming ingest: three skewed micro-batches (all in cluster A's
    //    region) appended to the persisted index without retraining
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ann.appendToIvf(spark, path, batch)
      }
      .start()
    try {
      (0 until 6).foreach { b =>
        input.addData((0 until 4).map(i => (100L + 4 * b + i, vecA(20 + 4 * b + i))))
        q.processAllAvailable()
      }
    } finally q.stop()

    // fragmentation metric: generation dirs feeding the WORST single
    // inverted list — under the v3 manifest protocol every append batch
    // commits its own generation, so the hot list's rows spread across
    // one dir per batch until a compacting rewrite collapses them back
    // to a single whole generation (total list-dir count is the wrong
    // yardstick here because rebalancing legitimately ADDS lists)
    def maxFilesPerList(): Long = {
      val m = Ann.readIvfManifest(spark, path)
      m.listDirs.flatMap(ld => ld.cids.map(c => (c, ld.dir)))
        .groupBy(_._1).values.map(_.size.toLong).max
    }

    // drift materialized: the hot list blew past the cap, and each
    // append batch left its own files behind
    val drifted = Ann.readIvf(spark, path)
    val sizesBefore = drifted.assigned.groupBy("centroid_id").count()
      .as[(Int, Long)].collect().toMap
    assert(sizesBefore.values.max > maxListSize,
      s"fixture must overfill a list: $sizesBefore")
    assert(drifted.assigned.count() == 44)
    val fragBefore = maxFilesPerList()
    assert(fragBefore >= 6, s"fixture must fragment the hot list: $fragBefore")

    // 3. rebalance to the fixed point, then the compacting rewrite:
    //    writeIvf replaces the fragmented lists with one clean layout
    val rebalanced = Ann.rebalanceIvfUntil(drifted, maxListSize)
    Ann.writeIvf(rebalanced, path)
    val served = Ann.readIvf(spark, path)

    // list-size invariant holds after maintenance
    val sizesAfter = served.assigned.groupBy("centroid_id").count()
      .as[(Int, Long)].collect().toMap
    assert(sizesAfter.values.max <= maxListSize, s"invariant broken: $sizesAfter")
    // nothing lost or duplicated across the whole cycle
    assert(served.assigned.select("vec_id").as[Long].collect().sorted.toSeq ==
      ((0L until 20L) ++ (100L until 124L)).sorted)
    // compaction actually collapsed the append-accumulated small files
    val fragAfter = maxFilesPerList()
    assert(fragAfter < fragBefore, s"$fragAfter !< $fragBefore")

    // 4. serve: probing ALL lists must equal the brute-force scan
    //    exactly (same ids in the same order), and probing just the
    //    nearest lists must already find the true neighbors (the skewed
    //    region's vectors all live in the probed children)
    val query = Seq(1.2, 0.03, 0.0, 0.0)
    val all = initial.unionByName(
      ((0 until 24).map(i => (100L + i, vecA(20 + i)))).toDF("vec_id", "embedding"))
    val brute = all
      .withColumn("score", graft.functions.CosineSimilarity(
        col("embedding").cast("array<double>"), array(query.map(lit): _*)))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(5).select("vec_id").as[Long].collect().toSeq
    val probeAll = Ann.ivfSearch(served, query, k = 5,
      nprobe = served.centers.length).select("vec_id").as[Long].collect().toSeq
    assert(probeAll == brute, s"full-probe $probeAll != brute $brute")
    val probeNear = Ann.ivfSearch(served, query, k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(probeNear == brute, s"2-probe $probeNear != brute $brute")

    // 5. MUTATE: STREAMING upserts (two replacements, one moving a row
    //    across the A/B boundary — the targeted list rewrite + frozen-
    //    quantizer re-assignment) then a delete; serving must equal
    //    brute force over the post-mutation corpus, and compaction must
    //    fold the tombstone without changing results
    val upInput = MemoryStream[(Long, Seq[Float])](spark)
    val uq = upInput.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ann.upsertIntoIvf(spark, path, batch)
      }
      .start()
    try {
      upInput.addData((0L, vecB(50)), (100L, vecB(51)))
      uq.processAllAvailable()
    } finally uq.stop()
    Ann.deleteFromIvf(spark, path, Seq(10L))
    val mutated = all.filter(!col("vec_id").isin(0L, 100L, 10L))
      .unionByName(Seq((0L, vecB(50)), (100L, vecB(51)))
        .toDF("vec_id", "embedding"))
    def bruteM(q: Seq[Double]): Seq[Long] = mutated
      .withColumn("score", graft.functions.CosineSimilarity(
        col("embedding").cast("array<double>"), array(q.map(lit): _*)))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(5).select("vec_id").as[Long].collect().toSeq
    val qB = Seq(0.0, 1.1, 0.0, 0.0)
    val afterMut = Ann.readIvf(spark, path)
    def probeM(q: Seq[Double]): Seq[Long] =
      Ann.ivfSearch(afterMut, q, k = 5, nprobe = afterMut.centers.length)
        .select("vec_id").as[Long].collect().toSeq
    assert(probeM(qB) == bruteM(qB), "post-mutation serve != brute force")
    assert(probeM(query) == bruteM(query))
    assert(afterMut.assigned.count() == 43) // 44 − 1 deleted
    Ann.compactIvf(spark, path)
    val compacted = Ann.readIvf(spark, path)
    assert(Ann.readIvfManifest(spark, path).tombstones.isEmpty,
      "compaction left tombstone dirs in the manifest")
    assert(Ann.ivfSearch(compacted, qB, k = 5,
      nprobe = compacted.centers.length)
      .select("vec_id").as[Long].collect().toSeq == bruteM(qB),
      "compaction changed post-mutation serving")
  }
}
