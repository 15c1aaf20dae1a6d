package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus statistics — the reference's `/stats` endpoint aggregations
  * (`/root/reference/mock_vector_db_api.py:314-379`, SURVEY.md §2.6),
  * generalized over any chunk/document table. All are single partial→final
  * hash aggregates in Spark; the exact-distinct variants have
  * `approx_count_distinct` twins for the 100 TB path.
  */
object Stats {

  /** A2: histogram by a category column; null/empty buckets to 'unknown'
    * (mock_vector_db_api.py:341).
    */
  def countByCategory(df: DataFrame, cat: String): DataFrame =
    df.groupBy(
        when(col(cat).isNull || col(cat) === "", lit("unknown"))
          .otherwise(col(cat)).as(cat))
      .agg(count(lit(1)).as("n"))

  /** A1+A3+A4: one-row corpus summary. `approxDistinct` swaps the exact
    * count-distinct (a full shuffle of distinct values) for HLL — the
    * right default at 100 TB.
    */
  def corpusStats(df: DataFrame, pathCol: String, contentCol: String,
                  approxDistinct: Boolean = false): DataFrame = {
    val nd: Column =
      if (approxDistinct) approx_count_distinct(col(pathCol))
      else countDistinct(col(pathCol))
    df.agg(
      count(lit(1)).as("total_documents"),
      nd.as("unique_files"),
      round(sum(length(col(contentCol))) / 1024.0, 4).as("total_content_kb"))
  }

  /** A5: avg chunks per file with last-wins dedup by path — the reference
    * builds a path→total_chunks dict in insertion order then averages the
    * values (mock_vector_db_api.py:354-360). `orderCol` supplies the
    * insertion order ("last" is meaningless on an unordered DataFrame).
    */
  def avgChunksPerFile(df: DataFrame, pathCol: String,
                       totalChunksCol: String, orderCol: String): DataFrame =
    df.groupBy(col(pathCol))
      .agg(max_by(col(totalChunksCol), col(orderCol)).as("last_chunks"))
      .agg(avg(col("last_chunks")).as("avg_chunks_per_file"))
}
