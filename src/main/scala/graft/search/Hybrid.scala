package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical (BM25)
  * candidate list and a dense (cosine) candidate list over the same
  * corpus — the standard way a vector store (the reference's query path,
  * `/root/reference/mock_vector_db_api.py:230-312`) is combined with
  * keyword search in production retrieval stacks.
  *
  * RRF (Cormack et al.): fused(d) = Σ_lists 1 / (K + rank_list(d)), with
  * K = 60 conventionally. Rank-based fusion side-steps score-scale
  * mismatch between BM25 (unbounded) and cosine ([−1, 1]) — no score
  * normalization to tune, and the arithmetic is two exact integer ranks
  * pushed through one fixed-shape double expression, so the fused score
  * is bit-deterministic.
  *
  * Scale notes: each candidate list is already k-limited by its producer
  * (TakeOrderedAndProject on the corpus side), so the fusion join, the
  * ranking windows, and the final sort all run on ≤ 2k rows — driver-side
  * scale is independent of corpus size.
  */
object Hybrid {

  val DefaultRrfK = 60

  /** Fuse two candidate lists. Each input must carry (`idCol`, `scoreCol`)
    * with higher-is-better scores; ranks are assigned 1..n by descending
    * score with ascending-id tie-break (both lists are expected small —
    * the single-partition ranking window is over k rows, not the corpus).
    * Returns (idCol, text_rank, vec_rank, rrf) ordered by fused score;
    * absent-from-one-list documents contribute only the other term.
    */
  def rrf(textTopK: DataFrame,
          vecTopK: DataFrame,
          k: Int,
          idCol: String = "doc_id",
          scoreCol: String = "score",
          rrfK: Int = DefaultRrfK): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    def ranked(df: DataFrame, rankName: String): DataFrame = {
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      df.select(col(idCol), col(scoreCol))
        .withColumn(rankName, row_number().over(w))
        .drop(scoreCol)
    }
    val t = ranked(textTopK, "text_rank")
    val v = ranked(vecTopK, "vec_rank").withColumnRenamed(idCol, "__vid")
    // full outer: a doc in either list is a fusion candidate
    t.join(v, col(idCol) === col("__vid"), "full_outer")
      .select(
        coalesce(col(idCol), col("__vid")).as(idCol),
        col("text_rank"), col("vec_rank"))
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("text_rank")).cast("double"),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")).cast("double"),
            lit(0.0)))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
