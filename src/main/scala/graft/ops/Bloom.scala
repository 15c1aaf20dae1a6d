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
  * Bit positions come from md5 prefixes (see [[graft.functions.HashFunctions]]),
  * so the filter is deterministic and bit-for-bit reproducible in DuckDB —
  * unlike `hash()`-based blooms, this one is oracle-checkable, false
  * positives included. Words hold 32 used bits in a BIGINT: DuckDB's
  * `<<` raises on shifting into the sign bit, so bit 63 is unusable and
  * 32 keeps every mask comfortably positive in both engines.
  */
object Bloom {

  val BitsPerWord = 32

  /** Kirsch–Mitzenmacher double hashing: ONE md5 per row (the md5 is the
    * probe cost at fact-table scale — k independent hashes tripled the
    * per-row work for no FP benefit), split into h1/h2 and combined as
    * p_i = (h1 + i·h2) mod nbits, h2 forced odd so every residue is
    * reachable when nbits is a power of two.
    */
  private def h60(key: String) =
    HashFunctions.md5Int60(concat(lit("bf_"), col(key).cast("string")))

  private def pos(i: Int, h1: org.apache.spark.sql.Column,
                  h2: org.apache.spark.sql.Column, nbits: Int) =
    pmod(h1 + lit(i.toLong) * h2, lit(nbits.toLong))

  /** Build a 1-row (`bloom: array<bigint>`) filter from `keys(keyCol)`.
    * `words × 32` bits, `probes` positions per key. Size for
    * n·probes ≲ words·32/2 to keep the false-positive rate useful.
    *
    * Shape: positions explode to (word, mask) rows and ONE `bit_or`
    * hash-aggregate (≤ `words` groups) folds them — partial aggregation
    * on the map side means the shuffle carries at most `words` rows per
    * task regardless of key count. (The earlier phrasing aggregated
    * `words × probes` CASE expressions in one Aggregate; its plan grew
    * with `words` and hit plan-size/codegen limits by 64 words.)
    */
  def build(keys: DataFrame, keyCol: String,
            words: Int = 8, probes: Int = 3): DataFrame = {
    require(words > 0 && probes > 0, s"need words/probes > 0, got $words/$probes")
    val nbits = words * BitsPerWord
    val h1 = pmod(col("__h"), lit(1073741824L))
    val h2 = shiftright(col("__h"), 30) * 2 + 1
    keys.select(col(keyCol))
      .withColumn("__h", h60(keyCol))
      .select(explode(array((0 until probes).map(i => pos(i, h1, h2, nbits)): _*))
        .as("__p"))
      .select(shiftright(col("__p"), 5).cast("int").as("__w"),
        expr(s"shiftleft(1L, cast(__p % $BitsPerWord as int))").as("__m"))
      .groupBy(col("__w")).agg(bit_or(col("__m")).as("__m"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__m"))))
        .as("__wm"))
      .select(expr(
        s"transform(sequence(0, ${words - 1}), w -> coalesce(__wm[w], 0L))")
        .as("bloom"))
  }

  /** Filter `df` to rows whose `keyCol` MIGHT be in the bloom (all probe
    * bits set). Evaluates the 1-row filter eagerly (a few hundred bytes —
    * one tiny job, same move as Spark's runtime-filter subquery) and
    * probes it with the native [[graft.functions.BloomMightContain]]
    * kernel: one md5 per row, fused into the scan's whole-stage codegen,
    * no join. False positives pass (resolve them with the exact join
    * that follows); false negatives cannot occur.
    */
  def mightContain(df: DataFrame, bloomRow: DataFrame, keyCol: String,
                   words: Int = 8, probes: Int = 3): DataFrame = {
    val arr = bloomRow.head().getSeq[Long](0).toArray
    require(arr.length == words,
      s"bloom row has ${arr.length} words, expected $words")
    df.filter(graft.functions.BloomMightContain(
      col(keyCol).cast("string"), arr, probes))
  }

  /** Column-expression phrasing of [[mightContain]] — the lazy witness
    * the native kernel is spec-asserted against (and the shape the
    * DuckDB oracle replays). Slower: the optimizer inlines the hash
    * helpers into every filter conjunct and `FilterExec` predicates get
    * no subexpression elimination, so the md5 runs up to 4× per probe.
    */
  def mightContainExpr(df: DataFrame, bloomRow: DataFrame, keyCol: String,
                       words: Int = 8, probes: Int = 3): DataFrame = {
    val nbits = words * BitsPerWord
    var out = df.crossJoin(broadcast(bloomRow))
      .withColumn("__h", h60(keyCol))
      .withColumn("__h1", pmod(col("__h"), lit(1073741824L)))
      .withColumn("__h2", shiftright(col("__h"), 30) * 2 + 1)
    for (i <- 0 until probes)
      out = out.withColumn(s"__bp$i", pos(i, col("__h1"), col("__h2"), nbits))
    val hits = (0 until probes).map { i =>
      expr(s"(shiftright(element_at(bloom, cast(shiftright(__bp$i, 5) as int) + 1), " +
        s"cast(__bp$i % $BitsPerWord as int)) & 1) = 1")
    }.reduce(_ && _)
    out.filter(hits)
      .drop((0 until probes).map(i => s"__bp$i") ++
        Seq("__h", "__h1", "__h2", "bloom"): _*)
  }
}
