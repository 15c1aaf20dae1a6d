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

  /** Skew-safe equi-JOIN for hot keys — the join-side counterpart of
    * [[saltedCountSum]], for when the small side is too big (or the
    * plan too static) for a broadcast and AQE's skew splitting isn't
    * available. A zipfian key on a shuffle join puts every row of the
    * hot key into ONE reducer; salting splits each HEAVY key's big-side
    * rows across `salt` sub-keys (position-based salt — content hashes
    * would re-collapse duplicated boilerplate into one bucket) and
    * replicates only the heavy keys' small-side rows `salt`× so every
    * sub-key still finds its match. Light keys keep salt 0 — no
    * replication, no extra data movement. The output is EXACTLY the
    * plain join's (the q219 oracle replays the unsalted phrasing).
    *
    * `heavyKeys` is driver-resident by design: heavy keys are few by
    * definition (each carries > `heavyThreshold` rows, so there can be
    * at most corpus/threshold of them); [[saltedJoinAuto]] detects them
    * with one aggregate pass when the caller doesn't already know them.
    * Inner and left-outer joins only — the decomposition is unsound for
    * right/full outer (a replicated small-side row with no match would
    * surface `salt` null-padded copies).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 heavyKeys: Seq[Any], salt: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be > 0, got $salt")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left only, got $joinType")
    if (heavyKeys.isEmpty) return big.join(small, Seq(keyCol), joinType)
    val isHeavy = col(keyCol).isin(heavyKeys: _*)
    val bigSalted = big.withColumn("__salt",
      when(isHeavy, pmod(monotonically_increasing_id(), lit(salt.toLong)))
        .otherwise(lit(0L)))
    val smallSalted = small.withColumn("__salt",
      explode(when(isHeavy, sequence(lit(0L), lit(salt.toLong - 1)))
        .otherwise(array(lit(0L)))))
    bigSalted.join(smallSalted, Seq(keyCol, "__salt"), joinType)
      .drop("__salt")
  }

  /** [[saltedJoin]] with the heavy keys detected from the big side:
    * one count aggregate, keys above `heavyThreshold` collected to the
    * driver (bounded — at most n/threshold keys can exceed the
    * threshold, and `maxHeavyKeys` guards the degenerate call).
    */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, keyCol: String,
                     heavyThreshold: Long, salt: Int = 16,
                     joinType: String = "inner",
                     maxHeavyKeys: Int = 10000): DataFrame = {
    require(heavyThreshold > 0, s"threshold must be > 0, got $heavyThreshold")
    val heavy = big.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > heavyThreshold)
      .select(col(keyCol))
      .limit(maxHeavyKeys + 1)
      .collect().map(_.get(0)).toSeq
    require(heavy.size <= maxHeavyKeys,
      s"more than $maxHeavyKeys keys above $heavyThreshold rows — " +
      "raise the threshold (salting that many keys replicates the " +
      "small side beyond the skew it removes)")
    saltedJoin(big, small, keyCol, heavy, salt, joinType)
  }
}
