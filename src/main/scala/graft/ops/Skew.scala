package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the manual counterpart to
  * AQE's skew-join splitting, for the cases AQE doesn't cover
  * (aggregations, and static plans where runtime re-planning is off).
  *
  * At 100 TB a zipfian key (one language, one boilerplate hash, one
  * power user) can put most of a `groupBy` into one reducer task.
  * Salting splits each key into `salt` sub-keys so the heavy partial
  * aggregation fans out across `salt` tasks, then a cheap second
  * aggregate (over ≤ keys × salt rows) merges the partials. Only
  * DECOMPOSABLE aggregates survive two-phase evaluation — count/sum/
  * min/max here; avg is derived as sum/count at the end.
  */
object Skew {

  /** count/sum/min/max per key, two-phase over a salt. The salt derives
    * from `monotonically_increasing_id()` (partition id ⊕ row position),
    * NOT a content hash: the motivating hot key is duplicated
    * boilerplate, and byte-identical rows would all content-hash into
    * ONE salt bucket, recreating the skew. Position-based salting
    * spreads them evenly; the final aggregate is salt-invariant, so
    * results stay deterministic regardless of assignment.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be > 0, got $salt")
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        // avg's denominator must be the NON-NULL value count (sum skips
        // nulls; dividing by the all-rows count would deflate the mean
        // of any key with null values, diverging from SQL avg())
        count(col(valueCol)).as("__nv"),
        sum(col(valueCol)).as("__s"),
        min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_rows"),
        sum(col("__nv")).as("__n_values"),
        sum(col("__s")).as("sum_value"),
        min(col("__mn")).as("min_value"),
        max(col("__mx")).as("max_value"))
      .withColumn("avg_value",
        col("sum_value") / nullif(col("__n_values"), lit(0L)))
      .drop("__n_values")
  }
}
