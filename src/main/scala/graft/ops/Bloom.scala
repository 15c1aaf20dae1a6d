package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Portable Bloom-filter runtime pre-filter — the semi-join pushdown
  * pattern: aggregate the SMALL side's join keys into a fixed-size bit
  * array, broadcast it, and drop big-side rows that cannot match BEFORE
  * the shuffle/join. At 100 TB this is the difference between shuffling
  * the full fact table and shuffling only candidate rows (Spark's own
  * InjectRuntimeFilter does this opportunistically; this operator makes
  * the pattern explicit, tunable, and engine-portable).
  *
  * Bit positions come from md5 prefixes (`HashFunctions.md5Int32`), so
  * the filter is deterministic and bit-for-bit reproducible in DuckDB —
  * unlike `hash()`-based blooms, this one is oracle-checkable, false
  * positives included. Words hold 32 used bits in a BIGINT: DuckDB's
  * `<<` raises on shifting into the sign bit, so bit 63 is unusable and
  * 32 keeps every mask comfortably positive in both engines.
  */
object Bloom {

  val BitsPerWord = 32

  private def pos(i: Int, key: String, nbits: Int) =
    pmod(HashFunctions.md5Int32(
      concat(lit(s"bf${i}_"), col(key).cast("string"))), lit(nbits))

  /** Build a 1-row (`bloom: array<bigint>`) filter from `keys(keyCol)`.
    * `words × 32` bits, `probes` positions per key. Size for
    * n·probes ≲ words·32/2 to keep the false-positive rate useful.
    */
  def build(keys: DataFrame, keyCol: String,
            words: Int = 8, probes: Int = 3): DataFrame = {
    require(words > 0 && probes > 0, s"need words/probes > 0, got $words/$probes")
    val nbits = words * BitsPerWord
    var df = keys.select(col(keyCol))
    for (i <- 0 until probes)
      df = df.withColumn(s"__p$i", pos(i, keyCol, nbits))
    val aggs = (0 until words).map { w =>
      val contrib = (0 until probes).map { i =>
        when(shiftright(col(s"__p$i"), 5) === w,
          expr(s"shiftleft(1L, cast(__p$i % $BitsPerWord as int))"))
          .otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
      bit_or(contrib).as(s"__w$w")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(array((0 until words).map(w => col(s"__w$w")): _*).as("bloom"))
  }

  /** Filter `df` to rows whose `keyCol` MIGHT be in the bloom (all probe
    * bits set). The 1-row filter is broadcast; the check is a handful of
    * integer ops per row fused into the scan — no shuffle, no join.
    * False positives pass (resolve them with the exact join that
    * follows); false negatives cannot occur.
    */
  def mightContain(df: DataFrame, bloomRow: DataFrame, keyCol: String,
                   words: Int = 8, probes: Int = 3): DataFrame = {
    val nbits = words * BitsPerWord
    var out = df.crossJoin(broadcast(bloomRow))
    for (i <- 0 until probes)
      out = out.withColumn(s"__bp$i", pos(i, keyCol, nbits))
    val hits = (0 until probes).map { i =>
      expr(s"(shiftright(element_at(bloom, cast(shiftright(__bp$i, 5) as int) + 1), " +
        s"cast(__bp$i % $BitsPerWord as int)) & 1) = 1")
    }.reduce(_ && _)
    out.filter(hits)
      .drop((0 until probes).map(i => s"__bp$i") :+ "bloom": _*)
  }
}
