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

  test("rerankPartitions: one scorer load per partition; stage-2 reorders the pool") {
    // candidate pool: (query, doc) rows — the retrieve→rerank shape.
    // doc 1 repeats the query text, so the pair scorer must rank it first.
    val pool = Seq(
      (10L, "alpha beta gamma", 1L, "alpha beta gamma"),
      (10L, "alpha beta gamma", 2L, "totally unrelated words here"),
      (10L, "alpha beta gamma", 3L, "alpha beta something else")
    ).toDF("query_id", "query_text", "doc_id", "text").repartition(2)
    BatchInference.CosinePairScorerLoader.loads.set(0L)
    val scored = BatchInference.rerankPartitions(
      pool, "query_text", "text", new BatchInference.CosinePairScorerLoader(),
      batchSize = 2)
    val byDoc = scored.select($"doc_id", $"ce_score")
      .as[(Long, Float)].collect().toMap
    assert(math.abs(byDoc(1L) - 1.0f) < 1e-6, s"self-pair must score 1.0: $byDoc")
    assert(byDoc(1L) > byDoc(3L) && byDoc(3L) > byDoc(2L), s"order wrong: $byDoc")
    val loads = BatchInference.CosinePairScorerLoader.loads.get()
    assert(loads >= 1 && loads <= 2, s"expected ≤1 load/partition, got $loads")

    // parity: the stub scorer must equal the bi-encoder cosine computed
    // directly (same embedder on both sides)
    val e = Embedder.Default
    def cos(a: Array[Float], b: Array[Float]): Float = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0f else (dot / (math.sqrt(na) * math.sqrt(nb))).toFloat
    }
    val want = cos(e.embed("alpha beta gamma"), e.embed("alpha beta something else"))
    assert(math.abs(byDoc(3L) - want) < 1e-6)
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
