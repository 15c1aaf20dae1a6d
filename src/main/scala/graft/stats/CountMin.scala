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
    bucketFromHash(HashFunctions.md5Int32(tok), j, width)

  /** Bucket from a PRE-STAGED md5Int32 hash (r19): the digest is the
    * expensive part and is shared by all `depth` hash rows — staging it
    * as its own projection runs it once per occurrence instead of once
    * per (occurrence, row).
    */
  def bucketFromHash(h32: Column, j: Int, width: Int): Column =
    ((h32 * HashFunctions.minhashA(j)
      + HashFunctions.minhashB(j)) % HashFunctions.MinhashPrime) % width

  /** Build the sketch: one exploded pass over the tokens, one
    * partial→final count aggregate; at most depth × width output rows.
    */
  def build(tokens: DataFrame, tokenCol: String,
            depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth×$width")
    tokens.select(HashFunctions.md5Int32(col(tokenCol)).as("__h32"))
      .select(
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("j"),
            bucketFromHash(col("__h32"), j, width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** EXACT heavy hitters with sketch-guided shuffle pruning — the 100 TB
    * form of "top tokens above a frequency threshold" (q43's full
    * aggregate shuffles the entire vocabulary; web-scale vocabularies are
    * billions of mostly-singleton tokens, i.e. the shuffle is all tail).
    * Two passes:
    *   1. build the count-min sketch (bounded depth×width aggregate) and
    *      collect it as the pruning model — ≤ 256 longs, the IVF-centroid
    *      bounded-collect discipline; total token count falls out of row
    *      j=0 for free;
    *   2. re-scan with the sketch as a plan literal: each occurrence's
    *      min-over-rows cell estimate is a codegen projection, and
    *      occurrences with est < τ are dropped MAP-SIDE — the long tail
    *      never reaches the exchange. CM only overestimates, so the
    *      candidate set is a superset of the true heavy hitters (no false
    *      negatives — spec-asserted); the exact post-aggregate count
    *      filter removes collision false-positives.
    * τ = ⌈total · thresholdPpm / 1e6⌉, at least 1. Output: (token,
    * cnt, est) for the top `topK` by exact count — est ≥ cnt always.
    */
  def heavyHittersExact(tokens: DataFrame, tokenCol: String,
                        thresholdPpm: Long = 20000, depth: Int = 4,
                        width: Int = 64, topK: Int = 20): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000,
      s"need 0 < thresholdPpm <= 1e6, got $thresholdPpm")
    require(topK > 0, s"topK must be positive, got $topK")
    val cells = Array.fill(depth)(new Array[Long](width))
    build(tokens, tokenCol, depth, width).collect().foreach { r =>
      cells(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    val total = cells(0).sum
    // overflow-safe ceil(total * ppm / 1e6): split total = q*1e6 + r so the
    // only product is r*ppm <= 1e12 (total*ppm wraps past ~9.2e12 tokens at
    // ppm=1e6 — silently disabling the threshold, not erroring)
    val tau = math.max(
      (total / 1000000L) * thresholdPpm +
        ((total % 1000000L) * thresholdPpm + 999999L) / 1000000L, 1L)
    val est = least((0 until depth).map(j =>
      element_at(typedLit(cells(j).toSeq),
        bucketFromHash(col("__h32"), j, width).cast("int") + 1)): _*)
    tokens.withColumn("__h32", HashFunctions.md5Int32(col(tokenCol)))
      .withColumn("est", est)
      .drop("__h32")
      .filter(col("est") >= tau)
      .groupBy(col(tokenCol))
      .agg(count(lit(1)).as("cnt"), max(col("est")).as("est"))
      .filter(col("cnt") >= tau)
      .orderBy(col("cnt").desc, col(tokenCol).asc)
      .limit(topK)
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
