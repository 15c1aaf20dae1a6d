package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — Z-order (Morton)
  * clustering and the zone-map skipping audit that justifies it.
  *
  * Why this exists at 100 TB: parquet readers prune row groups from
  * min/max footer stats ("zone maps"). A table sorted by one column
  * prunes perfectly on that column and not at all on any other; a
  * Z-ORDER sort interleaves the bits of several columns so every file
  * covers a small hyper-rectangle of the key space, and a query boxed
  * on ANY subset of those columns skips most files (the technique
  * behind Delta/Iceberg `ZORDER BY`, public knowledge). The engine
  * here ships (a) the Morton value as a pure-integer Column usable as
  * a write-time sort key, and (b) an AUDIT that measures — with exact
  * integer arithmetic, so the DuckDB oracle replays it — how many
  * simulated files a box query skips under the Z-order layout vs a
  * linear single-column sort.
  *
  * Production write path: `df.repartitionByRange(nFiles, zv)
  * .sortWithinPartitions(zv).write.parquet(...)` — range boundaries
  * come from Spark's sampling, no global sort. The audit instead uses
  * an exact `row_number` rank (one idealized total sort) because its
  * job is to measure LAYOUT QUALITY, not to write data; it runs on a
  * sample or a scale-factor slice, never the full corpus.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Pure shift/mask built-ins — whole-stage codegen, and
    * bit-identical in any engine with 64-bit integer ops.
    */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Equal-width bucket of `x` (column name) into 2^bits cells over
    * the CLOSED range [lo, hi] (column names holding the corpus
    * min/max) — `least(mask, ((x - lo) * 2^bits) div (hi - lo + 1))`,
    * exact integer division so the oracle replays it with `//`.
    */
  private def zbucketExpr(x: String, lo: String, hi: String,
                          bits: Int): String =
    s"least(${(1L << bits) - 1}L, " +
      s"(($x - $lo) * ${1L << bits}L) div ($hi - $lo + 1))"

  /** The three probe boxes the audit sweeps, as percent bounds of each
    * column's corpus range: selective on a alone, on b alone, and on
    * both — the one-dim boxes are what separates the layouts (a linear
    * a-sort prunes the a-box perfectly and the b-box not at all; the
    * Z-order prunes all three).
    */
  val defaultBoxes: Seq[(String, Int, Int, Int, Int)] = Seq(
    ("a_mid", 45, 55, 0, 100),
    ("b_mid", 0, 100, 45, 55),
    ("ab_mid", 45, 55, 45, 55))

  /** Zone-map skipping audit: lay `df` out two ways — Z-order on
    * (aCol, bCol) vs a linear sort on aCol alone — cut each layout
    * into `nFiles` ~equal row ranges (simulated parquet files), compute
    * each file's per-column min/max (the zone map), and count how many
    * files each probe box can skip outright. Boxes are percent bounds
    * of each column's corpus range (e.g. 45..55 = the middle decile);
    * [[defaultBoxes]] sweeps a-only / b-only / both. Output, one row
    * per (layout, box):
    * (layout, box, files_total, files_skipped, rows_scanned) — the
    * table that decides whether re-clustering a 100 TB table pays for
    * itself. Every number is exact integer arithmetic.
    *
    * NO GLOBAL SORT (the q117 histogram discipline): rows aggregate to
    * per-(layout, sort-key) stats first — ONE corpus-scale hash
    * aggregate — and file boundaries come from a cumulative-count
    * window over that histogram. Every row of a key lands in the file
    * where its key's cumulative range starts, i.e. simulated row-group
    * boundaries fall on key granularity — exactly how a real
    * repartitionByRange write behaves, and files stay ~n/nFiles rows.
    * BOTH layouts key at bucket granularity (the linear sort keys on
    * the a-BUCKET `za`, not raw a), so the histogram is ≤ 4^bits +
    * 2^bits rows at ANY corpus size — a raw high-cardinality key would
    * make the histogram corpus-sized — and the two layouts' zone maps
    * are compared at equal granularity.
    */
  def skippingAudit(df: DataFrame, aCol: String, bCol: String,
                    bits: Int = 8, nFiles: Int = 64,
                    boxes: Seq[(String, Int, Int, Int, Int)] = defaultBoxes)
    : DataFrame = {
    require(nFiles > 0, s"nFiles must be > 0, got $nFiles")
    require(boxes.nonEmpty, "need at least one probe box")
    val st = df.agg(
      min(col(aCol)).cast("long").as("la"), max(col(aCol)).cast("long").as("ha"),
      min(col(bCol)).cast("long").as("lb"), max(col(bCol)).cast("long").as("hb"),
      count(lit(1)).as("n"))
    val bk = df
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .crossJoin(broadcast(st))
      .withColumn("za", expr(zbucketExpr("a", "la", "ha", bits)))
      .withColumn("zb", expr(zbucketExpr("b", "lb", "hb", bits)))
      .withColumn("zv", interleave(col("za"), col("zb"), bits))
    val cols = Seq("layout", "key", "a", "b", "n", "la", "ha", "lb", "hb")
    val keyed = bk
      .withColumn("layout", lit("zorder")).withColumn("key", col("zv"))
      .select(cols.map(col): _*)
      .unionByName(bk
        .withColumn("layout", lit("linear")).withColumn("key", col("za"))
        .select(cols.map(col): _*))
      // the ONE corpus-scale pass: per-(layout, key) zone stats
      .groupBy(col("layout"), col("key"))
      .agg(min(col("a")).as("ka"), max(col("a")).as("kha"),
        min(col("b")).as("klb"), max(col("b")).as("khb"),
        count(lit(1)).as("cnt"),
        first(col("n")).as("n"),
        first(col("la")).as("la"), first(col("ha")).as("ha"),
        first(col("lb")).as("lb"), first(col("hb")).as("hb"))
    val w = Window.partitionBy(col("layout")).orderBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val files = keyed
      .withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("fid", expr(s"(cumb * ${nFiles}L) div n"))
      .groupBy(col("layout"), col("fid"))
      .agg(min(col("ka")).as("fla"), max(col("kha")).as("fha"),
        min(col("klb")).as("flb"), max(col("khb")).as("fhb"),
        sum(col("cnt")).as("rows"),
        first(col("la")).as("la"), first(col("ha")).as("ha"),
        first(col("lb")).as("lb"), first(col("hb")).as("hb"))
    val spark = df.sparkSession
    import spark.implicits._
    val boxDf = boxes.toDF("box", "alo", "ahi", "blo", "bhi")
    files.crossJoin(broadcast(boxDf))
      .withColumn("bla", expr("la + ((ha - la) * alo) div 100"))
      .withColumn("bha", expr("la + ((ha - la) * ahi) div 100"))
      .withColumn("blb", expr("lb + ((hb - lb) * blo) div 100"))
      .withColumn("bhb", expr("lb + ((hb - lb) * bhi) div 100"))
      .withColumn("skip",
        col("fha") < col("bla") || col("fla") > col("bha") ||
          col("fhb") < col("blb") || col("flb") > col("bhb"))
      .groupBy(col("layout"), col("box"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("skip"), 1L).otherwise(0L)).as("files_skipped"),
        sum(when(col("skip"), 0L).otherwise(col("rows"))).as("rows_scanned"))
      .orderBy(col("layout"), col("box"))
  }
}
