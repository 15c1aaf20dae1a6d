package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout — the shuffle-elimination tool
  * for repeated large-table joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of
  * both sides on the join key. Writing each table ONCE bucketed by that
  * key moves the shuffle into the write: every subsequent join or
  * aggregation on the bucket key plans with zero Exchange on the
  * bucketed side(s) (asserted in BucketingSpec). This is Spark's native
  * analog of the reference's only layout trick — hoisting the embedding
  * side-array for the hot path (`/root/reference/mock_vector_db_api.py:29-30`)
  * — generalized to any key.
  *
  * Bucket metadata lives in the catalog, so bucketed tables go through
  * `saveAsTable` (a plain parquet path carries no bucket spec). Pick
  * `numBuckets` so one bucket of the LARGER table fits an executor's
  * task comfortably (~128–512 MB compressed at scale).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    key: String, moreKeys: String*): Unit = {
    require(numBuckets > 0, s"numBuckets must be > 0, got $numBuckets")
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner-join two tables on `keys`. When both are bucketed on `keys`
    * with the same bucket count, Catalyst plans this with no shuffle on
    * either side (and no sort, if sortBy matched).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
