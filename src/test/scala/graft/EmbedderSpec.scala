package graft

import graft.embed.{DeterministicEmbedder, Embedder}

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val e = new DeterministicEmbedder(dim = 64, seed = 42)

  test("deterministic: same text → identical vector") {
    val a = e.embed("the quick brown fox")
    val b = e.embed("the quick brown fox")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
  }

  test("unit norm for non-empty text; zero vector for empty/whitespace") {
    val n = math.sqrt(e.embed("hello world").map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
    assert(e.embed("").forall(_ == 0.0f))
    assert(e.embed("   \n\t").forall(_ == 0.0f))
    assert(e.embed(null).forall(_ == 0.0f))
  }

  test("tokenization is case-insensitive and whitespace-delimited") {
    assert(e.embed("Hello World").toSeq == e.embed("hello   world").toSeq)
    assert(e.embed("ab cd").toSeq != e.embed("abcd").toSeq)
  }

  test("embedColumn works distributed and matches local computation") {
    val df = Seq("alpha beta", "gamma").toDF("text")
    val got = df.select(Embedder.embedColumn(org.apache.spark.sql.functions.col("text"), e))
      .as[Seq[Float]].collect()
    assert(got(0) == e.embed("alpha beta").toSeq)
    assert(got(1) == e.embed("gamma").toSeq)
  }
}
