package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.{HashFunctions, ShingleHashes}

/** Value-equivalence witness for the r19 [[ShingleHashes]] kernel: it
  * must emit exactly `transform(Dedup.shingles(text, n), md5Int60)` —
  * same hash values, same distinctness, same first-occurrence order —
  * because the q130/q131 sketch oracles replay the md5-prefix hash of
  * the composed string-shingle phrasing in DuckDB.
  */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def composed(n: Int) =
    transform(Dedup.shingles(col("text"), n),
      s => HashFunctions.md5Int60(s))

  test("kernel == composed md5Int60-over-shingles on real docs (n=3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      ShingleHashes(Dedup.tokens(col("text")), 3).as("k"),
      composed(3).as("c"))
    assert(both.filter(col("k") =!= col("c")).count() == 0)
    assert(both.count() > 0)
  }

  test("kernel == composed on boundary shapes (empty, short, repeats, n=2)") {
    val df = Seq(
      "", " ", "one", "one two", "one two three",
      "a b c a b c a b c",            // repeated shingles -> distinct
      "x\ty\nz  w",                    // mixed whitespace
      "Ünïcødé tøkens höre ünïcødé tøkens höre").toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val both = df.select(
        ShingleHashes(Dedup.tokens(col("text")), n).as("k"),
        composed(n).as("c"))
      assert(both.filter(col("k") =!= col("c")).count() == 0, s"n=$n")
    }
  }

  test("hashed sketches equal the string-valued forms on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val strings = docs.select(col("source"),
      explode(Dedup.shingles(col("text"), 3)).as("sh"))
    val hashes = docs.select(col("source"),
      explode(ShingleHashes(Dedup.tokens(col("text")), 3)).as("sh"))
    val a = graft.stats.DistinctSketch
      .kmvSketch(strings, "source", "sh", k = 64)
      .orderBy("source", "rank").collect()
    val b = graft.stats.DistinctSketch
      .kmvSketchHashed(hashes, "source", "sh", k = 64)
      .orderBy("source", "rank").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    val ha = graft.stats.DistinctSketch
      .hllDistinctWithExact(strings, "source", "sh")
      .orderBy("source").collect()
    val hb = graft.stats.DistinctSketch
      .hllDistinctWithExactHashed(hashes, "source", "sh")
      .orderBy("source").collect()
    assert(ha.length == hb.length && ha.nonEmpty)
    ha.zip(hb).foreach { case (x, y) => assert(x == y) }
  }
}
