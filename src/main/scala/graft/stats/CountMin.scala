package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Count-min sketch over a token column — the bounded-memory frequency
  * estimator for heavy-hitter queries at 100 TB (`depth × width` cells
  * regardless of vocabulary size, mergeable across partitions by cell
  * addition, one-sided error: estimates only OVERcount).
  *
  * Unlike HLL/t-digest (engine-specific binary sketches, rows-only in
  * the Verify gate), this sketch is DETERMINISTIC and portable: cells
  * are plain (row, bucket, count) rows and the hash family is the same
  * md5-based universal family MinHash uses (HashFunctions.minhashA/B),
  * so DuckDB rebuilds the identical sketch for the oracle (q57).
  */
object CountMin {

  /** Bucket of `tok` under hash row j: ((a_j·md5_32(tok) + b_j) mod p)
    * mod width. All intermediates < 2^37 — exact in long arithmetic.
    */
  def bucket(tok: Column, j: Int, width: Int): Column =
    ((HashFunctions.md5Int32(tok) * HashFunctions.minhashA(j)
      + HashFunctions.minhashB(j)) % HashFunctions.MinhashPrime) % width

  /** Build the sketch: one exploded pass over the tokens, one
    * partial→final count aggregate; at most depth × width output rows.
    */
  def build(tokens: DataFrame, tokenCol: String,
            depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth×$width")
    tokens.select(
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"),
            bucket(col(tokenCol), j, width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate each probe token: min over hash rows of its cell
    * count (0 when a cell is empty — the probe hashed where nothing
    * landed). The sketch is tiny → broadcast side of the join.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, tokenCol: String,
               depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth×$width")
    probes.select(col(tokenCol),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"),
            bucket(col(tokenCol), j, width).as("bucket"))): _*)).as("c"))
      .select(col(tokenCol), col("c.j").as("j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
