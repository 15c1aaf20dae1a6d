package graft

import org.apache.spark.sql.functions._
import graft.embed.{BatchInference, Embedder}
import graft.ops.Skew

class BatchInferenceSpec extends SparkSpec {
  import spark.implicits._

  test("embedPartitions: one model load per non-empty partition, batched encode") {
    val docs = (0L until 200L).map(i => (i, s"doc number $i content"))
      .toDF("doc_id", "text").repartition(4)
    BatchInference.EmbedderLoader.loads.set(0L)
    val out = BatchInference.embedPartitions(
      docs, "text", new BatchInference.EmbedderLoader(), batchSize = 16)
    assert(out.count() == 200)
    val loads = BatchInference.EmbedderLoader.loads.get()
    assert(loads >= 1 && loads <= 4, s"expected ≤1 load/partition, got $loads")
  }

  test("embedPartitions output equals the UDF path (same embedder)") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"), (3L, ""))
      .toDF("doc_id", "text")
    val viaPartitions = BatchInference.embedPartitions(
        docs, "text", new BatchInference.EmbedderLoader())
      .select($"doc_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val viaUdf = docs
      .select($"doc_id", Embedder.embedColumn($"text").as("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(viaPartitions == viaUdf)
  }

  test("saltedCountSum equals the direct aggregation (decomposable aggs)") {
    val df = (Seq.fill(500)(("hot", 2.0)) ++
      Seq(("a", 1.0), ("a", 3.0), ("b", -5.0)))
      .toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, "k", "v", salt = 8)
      .orderBy("k")
      .select($"k", $"n_rows", $"sum_value", $"min_value", $"max_value", $"avg_value")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        min($"v").as("mn"), max($"v").as("mx"),
        (sum($"v") / count(lit(1))).as("av"))
      .orderBy("k")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(salted == direct)
  }
}
