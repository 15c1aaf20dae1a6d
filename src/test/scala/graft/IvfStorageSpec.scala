package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.search.Ann

/** IVF persistence: the partitioned-by-inverted-list layout and the
  * partition-pruned probe — the property that makes IVF an index (reads
  * nprobe directories) instead of a full scan with a filter.
  */
class IvfStorageSpec extends SparkSpec {

  test("writePq/readPq round-trips: reopened index searches identically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qVec = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val index = Ann.buildPq(emb, m = 8, ks = 4, seed = 7L, maxIter = 2,
      initMode = "random")
    val path = Files.createTempDirectory("graft_pq").toString
    Ann.writePq(index, path)
    val reopened = Ann.readPq(spark, path)
    assert(reopened.codebooks.length == index.codebooks.length)
    assert(reopened.codebooks.flatten.flatten.toSeq ==
      index.codebooks.flatten.flatten.toSeq)
    val a = Ann.pqSearch(index, qVec, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Ann.pqSearch(reopened, qVec, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
    // the stored scan table carries ONLY ids + codes — no float vectors
    assert(spark.read.parquet(s"$path/codes").columns.sorted.toSeq ==
      Seq("codes", "vec_id"))
  }

  test("ivfSearchBatch: per-query results == per-query ivfSearch at the " +
    "same nprobe; nprobe clamps at nCentroids; empty batch yields empty") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Ann.buildIvf(emb, nCentroids = 4, seed = 42L)
    val path = Files.createTempDirectory("ivf_batch").toString + "/index"
    Ann.writeIvf(index, path)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("query_vec"))
    for (np <- Seq(1, 2, 4, 99)) { // 99 > nCentroids: clamps to 4
      val batch = Ann.ivfSearchBatch(spark, path, queries, k = 5, nprobe = np)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) =>
          q -> rs.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(4))).toSeq
        }
      for (qid <- 0L to 2L) {
        val qVec = emb.filter(col("vec_id") === qid)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
        val single = Ann.ivfSearch(index, qVec, k = 5, nprobe = math.min(np, 4))
          .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
        assert(batch(qid) == single, s"nprobe=$np qid=$qid")
      }
    }
    // empty query batch: no probes, empty result, no crash
    assert(Ann.ivfSearchBatch(spark, path,
      queries.filter(col("query_id") < 0), k = 5, nprobe = 2).count() == 0L)
  }

  test("ivfSearchBatch: shuffle fallback above the broadcast cap is " +
    "result-identical; threshold matches topKBatch's raw-score semantic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Ann.buildIvf(emb, nCentroids = 4, seed = 42L)
    val path = Files.createTempDirectory("ivf_batch_gate").toString + "/index"
    Ann.writeIvf(index, path)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("query_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3),
        r.getDouble(4))).toSet
    // ADVICE r15: a micro-batch above maxBroadcastQueries must not fail
    // or OOM — it falls back to a shuffle join with identical results
    val bc = Ann.ivfSearchBatch(spark, path, queries, k = 5, nprobe = 4)
    val sh = Ann.ivfSearchBatch(spark, path, queries, k = 5, nprobe = 4,
      maxBroadcastQueries = 2) // 5 queries > 2: fallback path
    assert(rows(bc) == rows(sh) && rows(bc).nonEmpty)
    // ADVICE r15: threshold applies to the RAW score before the 6dp
    // rounding — exactly topKBatch's semantic. Pick a threshold strictly
    // between two consecutive raw scores; both paths must cut the same.
    val exact = graft.search.Search.topKBatch(emb, queries, k = 5,
      threshold = Double.NegativeInfinity)
      .select(col("query_id"), col("vec_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val scores = exact.map(_._3).distinct.sorted
    val t = (scores(scores.length / 2) + scores(scores.length / 2 + 1)) / 2
    val gotT = Ann.ivfSearchBatch(spark, path, queries, k = 5, nprobe = 4,
      threshold = t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantT = graft.search.Search.topKBatch(emb, queries, k = 5, threshold = t)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotT == wantT && gotT.nonEmpty && gotT.size < rows(bc).size)
  }

  test("writeIvf/readIvf round-trips and probes with partition pruning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qVec = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

    val index = Ann.buildIvf(emb, nCentroids = 4, seed = 42L)
    val dir = Files.createTempDirectory("ivf").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/index"
    Ann.writeIvf(index, path)

    val loaded = Ann.readIvf(spark, path)
    assert(loaded.assigned.count() == emb.count())
    assert(loaded.centers.length >= 1)

    // probe results from the persisted index match the in-memory index
    val fromDisk = Ann.ivfSearch(loaded, qVec, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val inMem = Ann.ivfSearch(index, qVec, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(fromDisk == inMem)

    // the probe plan must prune partitions: the scan's PartitionFilters
    // carries the centroid_id restriction
    val probe = loaded.assigned.filter(col("centroid_id").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("centroid_id"))
    // and the pruned read returns only those lists
    assert(probe.select(col("centroid_id")).distinct().collect()
      .map(_.getInt(0)).toSet.subsetOf(Set(0, 1)))
  }

  test("appendToIvf assigns to the frozen quantizer and the index grows in place") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Ann.buildIvf(emb, nCentroids = 4, seed = 42L)
    val dir = Files.createTempDirectory("ivf_append").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/index"
    Ann.writeIvf(index, path)
    val before = Ann.readIvf(spark, path)
    val n0 = before.assigned.count()

    // new batch: two vectors planted exactly ON stored centroids (must
    // land in those lists) + one arbitrary vector
    val c0 = before.centers(0).map(_.toFloat).toSeq
    val c2 = before.centers(2).map(_.toFloat).toSeq
    val other = Seq.fill(c0.length)(0.25f)
    val batch = Seq(
      (900001L, c0, 99), (900002L, c2, 99), (900003L, other, 99)
    ).toDF("vec_id", "embedding", "label")
    Ann.appendToIvf(spark, path, batch)

    val after = Ann.readIvf(spark, path)
    assert(after.assigned.count() == n0 + 3)
    assert(after.centers.map(_.toSeq).toSeq == before.centers.map(_.toSeq).toSeq)

    val got = after.assigned.filter(col("vec_id") >= 900001L)
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toMap
    assert(got(900001L) == 0 && got(900002L) == 2)

    // the arbitrary vector landed on ITS argmin centroid (driver check)
    def d2(a: Seq[Float], c: Array[Double]) =
      a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = before.centers.zipWithIndex
      .minBy { case (c, i) => (d2(other, c), i) }._2
    assert(got(900003L) == want)

    // a probe over the grown index surfaces the planted centroid twin
    // (cosine exactly 1.0 against c0, so it must be in the top results)
    val top = Ann.ivfSearch(after, before.centers(0).toSeq, k = 3, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(top.contains(900001L), s"planted twin missing from probe: $top")
  }

  test("appendToIvf rejects a mixed-dimension batch (per-row guard)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Ann.buildIvf(emb, nCentroids = 4, seed = 42L)
    val dir = Files.createTempDirectory("ivf_append_bad").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/index"
    Ann.writeIvf(index, path)
    val d = index.centers(0).length
    // first row is valid — a first-row-only guard would wave this batch
    // through and silently drop the short row into centroid 0
    val batch = Seq(
      (910001L, Seq.fill(d)(0.25f), 1),
      (910002L, Seq.fill(d - 1)(0.25f), 1)
    ).toDF("vec_id", "embedding", "label")
    val e = intercept[Throwable] { Ann.appendToIvf(spark, path, batch) }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).toSeq
    assert(messages.exists(_.contains("appendToIvf")), messages.mkString(" | "))
    // the failed append committed nothing
    assert(Ann.readIvf(spark, path).assigned
      .filter(col("vec_id") >= 910001L).count() == 0)
  }
}
