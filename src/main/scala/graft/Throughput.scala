package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.search.Search

/** Flagship-throughput probe: exact cosine top-k over a corpus large
  * enough that task-scheduling overhead amortizes (the testdata tables
  * are tiny — sf0.1 is 2 k vectors — so per-query bench numbers are
  * dominated by Spark's fixed per-job latency, not scan rate; this main
  * measures the actual docs/s the scan sustains, the number comparable
  * to the reference's ~123 k docs/s single-thread rate, BASELINE.md).
  *
  * Usage: runMain graft.Throughput [sfDir] [replication]
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-throughput")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qVec = base.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

    // replicate to a corpus where scan rate, not job latency, dominates;
    // unique vec_ids keep the top-k tie-break meaningful
    val corpus = base.crossJoin(spark.range(rep).select(col("id").as("r")))
      .select((col("vec_id") * rep + col("r")).as("vec_id"), col("embedding"))
      .repartition(32)
      .cache()
    val n = corpus.count()

    Search.topK(corpus, qVec, k = 10).collect() // warm codegen + cache
    val runs = 5
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      Search.topK(corpus, qVec, k = 10).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val best = times.min
    val rate = n / best
    println(f"""{"metric":"scan_docs_per_sec","value":$rate%.0f,"unit":"docs/sec","corpus":$n,"best_sec":$best%.4f,"runs":${times.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")

    // Binary Hamming scan over PRECOMPUTED sign codes (the stored-code
    // production path: 64-dim floats → 2 longs per row, 32× less scan
    // I/O; per-row cost is two XOR+popcounts, no float math).
    import graft.search.Ann
    val dim = qVec.length
    val coded = corpus.select(col("vec_id"),
        Ann.binaryCode(col("embedding"), dim).as("code"))
      .repartition(32).cache()
    coded.count()
    Ann.hammingTopKCoded(coded, qVec, k = 10).collect() // warm
    val hamTimes = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      Ann.hammingTopKCoded(coded, qVec, k = 10).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val hamBest = hamTimes.min
    println(f"""{"metric":"hamming_docs_per_sec","value":${n / hamBest}%.0f,"unit":"docs/sec","corpus":$n,"best_sec":$hamBest%.4f,"runs":${hamTimes.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    coded.unpersist()

    // Matryoshka two-stage over a PRECOMPUTED prefix-16 column (the
    // stored layout: stage 1 scans a 16-dim column — 4× less vector
    // data/FLOPs at dim 64 — and only the 50-survivor pool touches the
    // full vectors).
    val pre = corpus.select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), 1, 16).as("prefix"))
      .repartition(32).cache()
    pre.count()
    val qPre = qVec.take(16)
    def matryoshkaOnce(): Double = {
      val t0 = System.nanoTime()
      val pool = Search.topK(pre, qPre, k = 50, threshold = -2.0,
        vecCol = "prefix").select(col("vec_id"))
      corpus.join(broadcast(pool), Seq("vec_id"), "left_semi")
        .withColumn("score", graft.functions.CosineSimilarity(
          col("embedding").cast("array<double>"), array(qVec.map(lit): _*)))
        .orderBy(col("score").desc, col("vec_id").asc).limit(10)
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    matryoshkaOnce() // warm
    val matTimes = (1 to runs).map(_ => matryoshkaOnce())
    val matBest = matTimes.min
    println(f"""{"metric":"matryoshka_docs_per_sec","value":${n / matBest}%.0f,"unit":"docs/sec","corpus":$n,"best_sec":$matBest%.4f,"runs":${matTimes.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    pre.unpersist()

    // PQ asymmetric-distance scan over precomputed codes: per-row cost is
    // M=8 small-int array lookups + adds — independent of D entirely (the
    // float column is not even in the scanned table).
    val pqIndex = Ann.buildPq(corpus, m = 8, ks = 16, seed = 42L,
      maxIter = 2, trainFraction = math.min(1.0, 65536.0 / n),
      initMode = "random")
    val pqCoded = pqIndex.encoded.select(col("vec_id"), col("codes"))
      .repartition(32).cache()
    pqCoded.count()
    val pqScanIndex = Ann.PqIndex(pqCoded, pqIndex.codebooks)
    Ann.pqSearch(pqScanIndex, qVec, k = 10).collect() // warm
    val pqTimes = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      Ann.pqSearch(pqScanIndex, qVec, k = 10).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val pqBest = pqTimes.min
    println(f"""{"metric":"pq_adc_docs_per_sec","value":${n / pqBest}%.0f,"unit":"docs/sec","corpus":$n,"best_sec":$pqBest%.4f,"runs":${pqTimes.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    pqCoded.unpersist()

    // Ingest throughput: chunk (1→N) + embed + full materialization, the
    // reference's convert path (its measured rate: ~43 chunks/s end-to-end,
    // ~74 chunks/s embed-only — BASELINE.md).
    corpus.unpersist()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(math.max(rep / 16, 1)).select(col("id").as("r")))
      .select((col("doc_id") * 10000 + col("r")).as("doc_id"), col("text"))
      .repartition(32)
      .cache()
    docs.count()
    import graft.ingest.Ingest
    def ingestOnce(): Long = {
      val t0 = System.nanoTime()
      val chunks = Ingest.ingestDocuments(docs, "text",
        chunkSize = 1000, overlap = 200)
      chunks.write.format("noop").mode("overwrite").save()
      System.nanoTime() - t0
    }
    ingestOnce() // warm
    val nChunks = Ingest.chunkDocuments(docs, "text", 1000, 200).count()
    val tIngest = ingestOnce() / 1e9
    println(f"""{"metric":"ingest_chunks_per_sec","value":${nChunks / tIngest}%.0f,"unit":"chunks/sec","chunks":$nChunks,"sec":$tIngest%.3f}""")

    // MinHash-LSH banding throughput (the dedup map-side kernel).
    import graft.dedup.Dedup
    def bandsOnce(): Double = {
      val t0 = System.nanoTime()
      Dedup.minhashBands(docs).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    bandsOnce() // warm
    val nDocs = docs.count()
    val tBands = bandsOnce()
    println(f"""{"metric":"minhash_docs_per_sec","value":${nDocs / tBands}%.0f,"unit":"docs/sec","docs":$nDocs,"sec":$tBands%.3f}""")

    // Near-dup verification on a clone-heavy corpus (the replication above
    // makes every text an exact clique): naive pair expansion vs the
    // exact-dedup-first pipeline.
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nPairsDeduped, tDeduped) = timed {
      val (pairs, _) = Dedup.nearDupPairsDeduped(docs)
      pairs.count()
    }
    println(f"""{"metric":"neardup_dedup_first_sec","value":$tDeduped%.3f,"unit":"sec","pairs":$nPairsDeduped,"docs":$nDocs}""")
    val (nPairsNaive, tNaive) = timed(Dedup.nearDupPairs(docs).count())
    println(f"""{"metric":"neardup_naive_sec","value":$tNaive%.3f,"unit":"sec","pairs":$nPairsNaive,"docs":$nDocs}""")
    spark.stop()
  }
}
