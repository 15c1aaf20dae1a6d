package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, the most recent right row at or before
  * its timestamp, per key — the standard event-enrichment operator
  * (market data, feature backfill) that Spark has no built-in for.
  *
  * Implementation is the scale-correct composition, not a range join:
  * tag and UNION the two sides, then one window pass per key ordered by
  * (ts, right-before-left) carrying `last(right value, ignoreNulls)`
  * forward. Cost: ONE shuffle on the key (both sides co-partitioned),
  * then a linear sorted sweep per partition — vs the O(|L|·|R|) per key
  * of a naive `l.ts >= r.ts` theta-join. Skewed keys behave like any
  * window aggregation (AQE/salting apply).
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (`>=`, DuckDB ASOF-compatible). Right rows must be unique per
  * (key, ts) — pre-aggregate duplicates upstream (e.g. `max_by`) or the
  * carried value among equal timestamps is unspecified.
  */
object AsofJoin {

  /** Left rows enriched with `valueCol` from the latest right row whose
    * `tsCol` ≤ the left row's; null when no prior right row exists.
    * A matched right row whose VALUE is null yields null (the match
    * still happens — ASOF semantics — hence the struct wrapper below:
    * `last(..., ignoreNulls)` must skip only left rows, not null-valued
    * right rows).
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, outCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    val rvType = right.schema(valueCol).dataType
    // tag: right rows sort BEFORE left rows at the same timestamp so a
    // same-instant right row is visible to the left row (>= semantics)
    val l = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(StructType(Seq(StructField("v", rvType))))
          .as("__rv")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => col(c)): _*)
    // a NULL right timestamp can match nothing ("at or before" is never
    // true of NULL) — and must not sort NULLS FIRST into the window where
    // last(__rv) would hand its value to every left row as a phantom
    // earliest match
    val r = right.filter(col(tsCol).isNotNull).select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        struct(col(valueCol).as("v")).as("__rv")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // NULLS FIRST for left rows: a left row with a NULL timestamp sees an
    // empty window prefix and gets a NULL match, as it should
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol,
        last(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
