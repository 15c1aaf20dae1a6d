package graft

import graft.ops.Mixture

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("doremiWeights: exact integer losses, replica-verified weights") {
    val d = Seq(
      (1L, "x x x x", "common"), // one token repeated: rarity 8000//4
      (2L, "u v w z", "rare"))   // four singletons: rarity 8000//1
      .toDF("doc_id", "text", "source")
    val got = Mixture.doremiWeights(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // T = 8 tokens: loss(common) = (4 * 2000) div 4; loss(rare) = (4 * 8000) div 4
    assert(got("common")._2 == 2000L, got.toString)
    assert(got("rare")._2 == 8000L, got.toString)
    assert(got("common")._3 == 500000L && got("rare")._3 == 500000L)

    // JVM replica of the 4-iteration integer multiplicative-weights loop
    val loss = Map("common" -> 2000L, "rare" -> 8000L)
    var w = loss.map { case (k, _) => k -> 1000000L }
    for (_ <- 1 to 4) {
      val avg = loss.keys.map(k => w(k) * loss(k)).sum / w.values.sum
      w = w.map { case (k, wk) =>
        val l = loss(k)
        val f0 =
          if (l >= avg) 1000000L + (l - avg) * 250000L / math.max(avg, 1L)
          else 1000000L - (avg - l) * 250000L / math.max(avg, 1L)
        k -> math.max(wk * math.min(math.max(f0, 250000L), 4000000L) / 1000000L, 1L)
      }
    }
    val ws = w.values.sum
    val want = w.map { case (k, wk) => k -> wk * 1000000L / ws }
    assert(got("common")._4 == want("common"), s"got $got want $want")
    assert(got("rare")._4 == want("rare"), s"got $got want $want")
    assert(got("rare")._4 > got("common")._4)
  }

  test("doremiWeights: single-domain corpus gets the whole mixture") {
    val d = Seq((1L, "x y z", "only")).toDF("doc_id", "text", "source")
    val got = Mixture.doremiWeights(d).collect().map(r =>
      (r.getString(0), r.getLong(4))).toSeq
    // avg == loss every iteration -> factor 1e6 -> w unchanged -> 100%
    assert(got == Seq(("only", 1000000L)), got.toString)
  }

  test("doremiWeights is deterministic and weight mass stays ~1e6") {
    val rnd = new scala.util.Random(3)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val d = (0L until 40L).map { i =>
      val n = 3 + rnd.nextInt(6)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "),
        s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    val a = Mixture.doremiWeights(d).collect().map(r =>
      (r.getString(0), r.getLong(4))).sortBy(_._1).toSeq
    val b = Mixture.doremiWeights(d).collect().map(r =>
      (r.getString(0), r.getLong(4))).sortBy(_._1).toSeq
    assert(a == b)
    val mass = a.map(_._2).sum
    assert(mass <= 1000000L && mass >= 1000000L - a.size, mass.toString)
  }
}
