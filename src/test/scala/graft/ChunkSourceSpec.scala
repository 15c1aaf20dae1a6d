package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.Ingest

class ChunkSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeTree(): java.io.File = {
    val dir = Files.createTempDirectory("chunksrc").toFile
    dir.deleteOnExit()
    def put(rel: String, content: String): Unit = {
      val f = new java.io.File(dir, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, content)
    }
    put("a.txt", "alpha beta gamma delta " * 20) // multi-chunk
    put("sub/b.md", "# small doc")
    put(".git/skip.txt", "hidden — must be pruned")
    put("empty.txt", "   ")
    dir
  }

  test("scan emits chunk rows directly; filters hidden/empty; schema exact") {
    val dir = writeTree()
    val df = spark.read.format("graft-chunks")
      .option("chunkSize", "100").option("overlap", "20")
      .load(dir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("path", "extension", "chunk_index", "total_chunks", "content"))
    val rows = df.collect()
    val paths = rows.map(_.getString(0)).toSet
    assert(paths == Set("a.txt", "sub/b.md")) // hidden + empty pruned
    // dense ordinals per file, total_chunks consistent
    val aChunks = rows.filter(_.getString(0) == "a.txt").sortBy(_.getInt(2))
    assert(aChunks.length > 1)
    assert(aChunks.map(_.getInt(2)).toSeq == aChunks.indices.toSeq)
    assert(aChunks.forall(_.getInt(3) == aChunks.length))
  }

  test("source output equals scanFiles + chunkDocuments composition") {
    val dir = writeTree()
    val viaSource = spark.read.format("graft-chunks")
      .option("chunkSize", "100").option("overlap", "20")
      .load(dir.getAbsolutePath)
      .filter($"extension".isin(".txt", ".md"))
      .select($"path", $"chunk_index", $"total_chunks", $"content")
      .orderBy("path", "chunk_index")
    val viaCompose = Ingest.chunkDocuments(
        Ingest.scanFiles(spark, dir.getAbsolutePath, Seq(".txt", ".md"))
          .select($"path", $"content".as("text")),
        "text", chunkSize = 100, overlap = 20)
      .select($"path", $"chunk_index", $"total_chunks", $"content")
      .orderBy("path", "chunk_index")
    val a = viaSource.collect()
    val b = viaCompose.collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("column pruning reaches the scan (narrow ReadSchema fine, filters above)") {
    val dir = writeTree()
    val df = spark.read.format("graft-chunks").load(dir.getAbsolutePath)
      .select($"path").distinct()
    assert(df.count() == 2)
  }
}
