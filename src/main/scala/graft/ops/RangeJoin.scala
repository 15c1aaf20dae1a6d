package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join: pairs of rows whose timestamps lie within a fixed
  * window of each other, per key — the other relational operator Spark
  * lacks natively (it plans `abs(a.ts - b.ts) <= w` as a per-key nested
  * loop).
  *
  * Scale-correct composition: quantize both sides into buckets of the
  * window width; a row can only match rows in its own or an adjacent
  * bucket, so emitting each LEFT row into (bucket-1, bucket, bucket+1)
  * and equi-joining on (key, bucket) covers every candidate with ≤ 3×
  * row inflation on one side — an equi shuffle join + residual filter,
  * instead of an O(n²)-per-key loop. This is the standard interval-
  * bucketing rewrite (what dedicated engines' range-join optimizations
  * do under the hood).
  */
object RangeJoin {

  /** Pairs (left row, right row) with the same `keyCol` and
    * |left.tsCol − right.tsCol| ≤ `windowSec` (timestamps compared at
    * second precision via unix epoch). Column name collisions between
    * the two sides must be resolved by the caller (alias first).
    */
  def withinWindow(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be > 0, got $windowSec")
    Seq("__b", "__b0").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"withinWindow: inputs must not carry a reserved '$c' column")
    }
    val lb = unix_timestamp(col(leftTs))
    val rb = unix_timestamp(col(rightTs))
    val l = left
      .withColumn("__b0", floor(lb / windowSec))
      .withColumn("__b",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r = right.withColumn("__b", floor(rb / windowSec))
    l.join(r, Seq(keyCol, "__b"))
      .filter(abs(lb - rb) <= windowSec)
      .drop("__b")
  }
}
