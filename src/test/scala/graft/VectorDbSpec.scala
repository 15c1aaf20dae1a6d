package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.VectorDb
import graft.ingest.Ingest

/** The reference-endpoint facade (SURVEY.md §2.1/§2.9): add → query →
  * stats → clear/health flows and every preserved quirk.
  */
class VectorDbSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(): (VectorDb, String) = {
    val dir = Files.createTempDirectory("graft_vdb").toString + "/store"
    (new VectorDb(spark, dir), dir)
  }

  private def sampleCorpus() = Ingest.ingestDocuments(
    Seq(
      ("a.md", ".md", "the quick brown fox jumps over the lazy dog"),
      ("b.py", ".py", "vector database query runner main loop"),
      ("c.md", ".md", "similarity search over embedded documents")
    ).toDF("path", "extension", "text"),
    "text")

  test("add -> health -> query -> stats round trip") {
    val (db, _) = freshDb()
    assert(db.health().status == "empty")

    val res = db.addDocuments(sampleCorpus())
    assert(res.added == 3L && res.dropped == 0L)
    assert(db.health() == db.Health("healthy", 3L, true))

    val hits = db.query("vector database query", topK = 2).collect()
    assert(hits.nonEmpty && hits.length <= 2)
    // the .py doc matches its own words best
    assert(hits.head.getAs[String]("path") == "b.py")

    val st = db.stats()
    assert(st.totalDocuments == 3L)
    assert(st.uniqueFiles == 3L)
    assert(st.byExtension == Map(".md" -> 2L, ".py" -> 1L))
    assert(st.avgChunksPerFile == 1.0) // every sample doc fits one chunk
  }

  test("schema-invalid rows are dropped, not fatal (F5)") {
    val (db, _) = freshDb()
    val withBad = sampleCorpus()
      .withColumn("embedding",
        when(col("path") === "a.md", lit(null)).otherwise(col("embedding")))
    val res = db.addDocuments(withBad)
    assert(res.added == 2L && res.dropped == 1L)
    assert(db.health().documents == 2L)
  }

  test("re-ingest APPENDS duplicates (quirk 5)") {
    val (db, _) = freshDb()
    db.addDocuments(sampleCorpus())
    db.addDocuments(sampleCorpus())
    assert(db.health().documents == 6L)
    // last-wins avg still 1.0 across the duplicate ingests
    assert(db.stats().avgChunksPerFile == 1.0)
  }

  test("invalid topK coerces to 5 (quirk 7); dim mismatch is fatal (quirk 8)") {
    val (db, _) = freshDb()
    db.addDocuments(sampleCorpus())
    // coerced k=5 over a 3-doc corpus: bounded by matches, never errors
    assert(db.query("vector", topK = -3).count() <= 5)
    intercept[IllegalArgumentException](db.queryVec(Seq(1.0, 2.0)))
  }

  test("query against an empty corpus is a hard error") {
    val (db, _) = freshDb()
    db.addDocuments(sampleCorpus())
    db.clear(backup = false)
    intercept[Exception](db.query("anything"))
  }

  test("clear backs up then truncates a PARTITIONED store (S8)") {
    val (db, dir) = freshDb()
    // a partitioned write puts data files in subdirectories — backup and
    // truncate must walk the tree, not just the top-level listing
    sampleCorpus().write.partitionBy("extension").mode("append").parquet(dir)
    val bak = db.clear()
    assert(bak.isDefined)
    assert(db.health().status == "empty")
    assert(spark.read.parquet(bak.get).count() == 3L)
    db.addDocuments(sampleCorpus())
    assert(db.health().documents == 3L)
  }

  test("queryVec skips null embeddings when sampling the corpus dimension") {
    val (db, dir) = freshDb()
    // a null embedding written by a path other than addDocuments must not
    // NPE the dimension check
    sampleCorpus()
      .withColumn("embedding",
        when(col("path") === "a.md", lit(null)).otherwise(col("embedding")))
      .write.mode("append").parquet(dir)
    assert(db.query("vector database", topK = 2).count() >= 1)
  }

  test("clear backs up then truncates (S8)") {
    val (db, dir) = freshDb()
    db.addDocuments(sampleCorpus())
    val bak = db.clear()
    assert(bak.isDefined)
    assert(db.health().status == "empty")
    // the backup is a readable parquet copy of the pre-clear corpus
    assert(spark.read.parquet(bak.get).count() == 3L)
    // and a fresh add works after truncation
    db.addDocuments(sampleCorpus())
    assert(db.health().documents == 3L)
  }

  test("compact collapses append-accumulated small files; corpus identical") {
    val (db, dir) = freshDb()
    // 5 appends → 5+ separate file groups
    (1 to 5).foreach(_ => db.addDocuments(sampleCorpus()))
    val before = db.corpus().orderBy("path", "chunk_index", "ingested_at")
      .drop("ingested_at").collect().toSeq
    val (rows, filesBefore, filesAfter) = db.compact(targetFiles = 1)
    assert(rows == 15L)
    assert(filesBefore > filesAfter, s"$filesBefore !> $filesAfter")
    assert(filesAfter == 1L)
    val after = db.corpus().orderBy("path", "chunk_index", "ingested_at")
      .drop("ingested_at").collect().toSeq
    assert(after == before, "compaction must not change the corpus")
    // no leftover swap directories
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".compact-tmp")))
    // the store still serves queries and appends afterwards
    assert(db.query("vector database", topK = 2).count() > 0)
    db.addDocuments(sampleCorpus())
    assert(db.health().documents == 18L)
  }

  test("recoverCompact heals every crash state a compact can leave") {
    import java.nio.file.{Files => F, Paths => P}
    val (db, dir) = freshDb()
    db.addDocuments(sampleCorpus())
    val want = db.corpus().drop("ingested_at")
      .orderBy("path", "chunk_index").collect().toSeq

    // crash window between the two moves: no live store, data in .old
    F.move(P.get(dir), P.get(dir + ".old"))
    assert(!F.exists(P.get(dir)))
    val r1 = db.recoverCompact()
    assert(r1.exists(_.contains("restored")), r1.toString)
    assert(db.corpus().drop("ingested_at")
      .orderBy("path", "chunk_index").collect().toSeq == want)

    // stale .old beside a live store (crash after swap, before cleanup):
    // compact must recover and proceed instead of failing at Files.move
    F.createDirectories(P.get(dir + ".old"))
    F.write(P.get(dir + ".old", "junk.txt"), "stale".getBytes)
    // stale rewrite dir from an aborted run is also dropped
    F.createDirectories(P.get(dir + ".compact-tmp"))
    val (rows, _, _) = db.compact(targetFiles = 1)
    assert(rows == 3L)
    assert(!F.exists(P.get(dir + ".old")))
    assert(!F.exists(P.get(dir + ".compact-tmp")))
    assert(db.corpus().drop("ingested_at")
      .orderBy("path", "chunk_index").collect().toSeq == want)

    // idempotent no-op on a clean store
    assert(db.recoverCompact().isEmpty)
  }

  test("compact validates input and refuses an unknown order column") {
    val (db, _) = freshDb()
    intercept[IllegalArgumentException] { db.compact() } // empty store
    db.addDocuments(sampleCorpus())
    intercept[IllegalArgumentException] { db.compact(targetFiles = 0) }
    intercept[IllegalArgumentException] { db.compact(orderCol = "nope") }
  }
}
