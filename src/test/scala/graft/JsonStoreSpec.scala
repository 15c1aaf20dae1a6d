package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.Ingest

/** Wire-format parity with the reference's JSON persistence
  * (`/root/reference/mock_vector_db_api.py:54-148`: documents list with
  * path/extension/chunk_index/total_chunks/content/embedding per row).
  * The engine's canonical store is parquet (O(batch) appends), but the
  * JSON shape must round-trip for interop with existing corpora.
  */
class JsonStoreSpec extends SparkSpec {
  import spark.implicits._

  test("ingest output round-trips through JSON with schema and values intact") {
    val docs = Seq(
      (1L, "alpha beta gamma " * 20, "web"),
      (2L, "short doc", "pdf")
    ).toDF("doc_id", "text", "source")
    val corpus = Ingest.ingestDocuments(docs, "text",
        chunkSize = 100, overlap = 20)
      .drop("ingested_at") // timestamps don't round-trip JSON bit-exactly

    val dir = Files.createTempDirectory("jsonstore").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/documents_json"
    corpus.write.mode("overwrite").json(path)

    val back = spark.read.json(path)
    // JSON widens ints and floats; compare on normalized types
    def norm(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id").cast("long"), col("source"),
      col("chunk_index").cast("int"), col("total_chunks").cast("int"),
      col("content"),
      col("embedding").cast("array<double>").as("embedding"))
    val a = norm(corpus).orderBy("doc_id", "chunk_index").collect()
    val b = norm(back).orderBy("doc_id", "chunk_index").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getString(1) == y.getString(1))
      assert(x.getInt(2) == y.getInt(2) && x.getInt(3) == y.getInt(3))
      assert(x.getString(4) == y.getString(4))
      val ea = x.getSeq[Double](5); val eb = y.getSeq[Double](5)
      assert(ea.size == eb.size)
      ea.zip(eb).foreach { case (p, q) => assert(math.abs(p - q) < 1e-6) }
    }
  }

  test("append accumulates duplicates (reference S7 contract, §2.9.5)") {
    val docs = Seq((1L, "same doc text", "web")).toDF("doc_id", "text", "source")
    val chunked = Ingest.chunkDocuments(docs, "text", 100, 20)
    val dir = Files.createTempDirectory("appendstore").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/store"
    chunked.write.mode("append").parquet(path)
    chunked.write.mode("append").parquet(path) // re-ingest same docs
    assert(spark.read.parquet(path).count() == chunked.count() * 2)
  }
}
