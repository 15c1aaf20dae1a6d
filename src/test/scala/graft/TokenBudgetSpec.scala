package graft

import graft.ops.TokenBudget
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame = {
    val rng = new scala.util.Random(42)
    (1 to 400).map { i =>
      (i.toLong, math.rint(rng.nextDouble() * 1e6) / 1e6, 1L + rng.nextInt(50))
    }.toDF("doc_id", "q", "n_tokens")
  }

  /** Reference semantics: global-window prefix (fine at test scale). */
  private def naive(d: DataFrame, budget: Long): DataFrame = {
    val w = Window.orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  private def canon(d: DataFrame): Seq[(Long, Double, Long, Long)] =
    d.select("doc_id", "q", "n_tokens", "cum_tokens")
      .as[(Long, Double, Long, Long)].collect().sortBy(_._1).toSeq

  test("bucketed selection equals the global-window prefix") {
    val d = docs.cache()
    for (budget <- Seq(0L, 500L, 5000L, 1000000L)) {
      val got = TokenBudget.select(d, "doc_id", "q", "n_tokens", budget)
      assert(canon(got) == canon(naive(d, budget)), s"budget=$budget")
    }
  }

  test("equal-quality ties break by id and duplicates of q stay exact") {
    val d = Seq(
      (1L, 0.5, 10L), (2L, 0.5, 10L), (3L, 0.5, 10L), (4L, 0.9, 5L)
    ).toDF("doc_id", "q", "n_tokens")
    val got = canon(TokenBudget.select(d, "doc_id", "q", "n_tokens", 25L))
    assert(got == Seq((1L, 0.5, 10L, 15L), (2L, 0.5, 10L, 25L), (4L, 0.9, 5L, 5L)))
  }

  test("degenerate distribution: every doc in ONE bucket still exact") {
    // all-equal quality collapses to a single bucket — the worst case the
    // scaladoc documents (one window partition = the corpus); output must
    // still equal the naive prefix, ordered purely by id
    val d = (1L to 100L).map(i => (i, 0.5, 3L)).toDF("doc_id", "q", "n_tokens")
    assert(canon(TokenBudget.select(d, "doc_id", "q", "n_tokens", 30L)) ==
      canon(naive(d, 30L)))
  }

  test("no global (unpartitioned) window in the plan") {
    val plan = TokenBudget.select(docs, "doc_id", "q", "n_tokens", 500L)
      .queryExecution.optimizedPlan.toString
    // every Window node must carry the bucket partition key
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("__bucket"), s"unpartitioned window: $l")
    }
  }
}
