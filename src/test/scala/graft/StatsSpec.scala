package graft

import graft.stats.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def chunks = Seq(
    // (path, ext, content, total_chunks, seq)
    ("a.py", "py", "aaaa", 2, 1L),
    ("a.py", "py", "bb", 2, 2L),
    ("b.md", null.asInstanceOf[String], "cccccc", 1, 3L),
    ("a.py", "py", "dd", 4, 4L) // re-ingest of a.py with different chunking
  ).toDF("path", "extension", "content", "total_chunks", "seq")

  test("countByCategory buckets null/empty as 'unknown'") {
    val got = chunks.transform(Stats.countByCategory(_, "extension"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("py" -> 3L, "unknown" -> 1L))
  }

  test("corpusStats counts rows, distinct paths, content KB") {
    val row = chunks.transform(Stats.corpusStats(_, "path", "content"))
      .as[(Long, Long, Double)].head()
    assert(row._1 == 4L)
    assert(row._2 == 2L)
    assert(math.abs(row._3 - 14.0 / 1024.0) < 1e-3)
  }

  test("avgChunksPerFile uses last-wins dedup by path (SURVEY.md §2.9.6)") {
    val got = chunks.transform(Stats.avgChunksPerFile(_, "path", "total_chunks", "seq"))
      .as[Double].head()
    // last write for a.py says 4 chunks; b.md says 1 → avg(4,1) = 2.5
    assert(got == 2.5)
  }
}
