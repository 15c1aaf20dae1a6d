package graft

import graft.embed.{DeterministicEmbedder, Embedder, Md5TokenEmbedder}

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

  private val me = new Md5TokenEmbedder()

  test("Md5TokenEmbedder token hash matches the portable conv(md5) phrasing") {
    // hash32 must equal conv(substr(md5(t),1,8),16,10) — the Spark/DuckDB
    // shared integer hash q32's oracle replays
    import org.apache.spark.sql.functions._
    // already-lowercase tokens: the embedder lowercases before hashing
    val toks = Seq("alpha", "beta", "gamma9", "日本語")
    val sql = toks.toDF("t")
      .select(conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
        .cast("long")).as[Long].collect()
    val viaEmbed: Seq[Int] = toks.map { t =>
      // recover the bucket contribution and check it against sql-derived h
      val v = me.embedDouble(t)
      val nonZero = v.zipWithIndex.filter(_._1 != 0.0)
      assert(nonZero.length == 1, s"one token must hit exactly one bucket: $t")
      nonZero.head._2
    }
    sql.toSeq.zip(viaEmbed).foreach { case (h: Long, idx: Int) =>
      assert((h % 64).toInt == idx, s"bucket from md5 hash must match (h=$h)")
    }
  }

  test("Md5TokenEmbedder: float form is the double form cast; unit norm; null-safe") {
    val d = me.embedDouble("the quick brown fox")
    assert(me.embed("the quick brown fox").toSeq == d.map(_.toFloat).toSeq)
    assert(math.abs(math.sqrt(d.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(me.embedDouble(null).forall(_ == 0.0))
    assert(me.embedDouble("  \n ").forall(_ == 0.0))
  }
}
