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

  /** Reference semantics: global-window prefix over
    * (quality DESC, md5(id) ASC, id ASC) — fine at test scale.
    */
  private def naive(d: DataFrame, budget: Long): DataFrame = {
    val w = Window
      .orderBy(col("q").desc,
        md5(col("doc_id").cast("string").cast("binary")).asc,
        col("doc_id").asc)
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

  test("equal-quality ties break by md5(id), not id") {
    // md5("11") = 6512... < md5("10") = d3d9..., so doc 11 is kept before
    // doc 10 despite the larger id — the unbiased hash tie-break
    val d = Seq(
      (10L, 0.5, 10L), (11L, 0.5, 10L), (12L, 0.5, 10L), (4L, 0.9, 5L)
    ).toDF("doc_id", "q", "n_tokens")
    val got = canon(TokenBudget.select(d, "doc_id", "q", "n_tokens", 25L))
    assert(got == canon(naive(d.cache(), 25L)))
    assert(got.exists(_._1 == 11L) && !got.exists(_._1 == 10L),
      s"hash tie-break should keep 11 over 10: $got")
  }

  test("degenerate distribution: one hot bucket is sub-bucketed, still exact") {
    // all-equal quality collapses to a single quality bucket — with
    // maxBucketRows forcing the skew path, the window must partition on
    // the (bucket, quality, md5-prefix) cells, never the whole corpus
    val d = (1L to 500L).map(i => (i, 0.5, 3L)).toDF("doc_id", "q", "n_tokens")
      .cache()
    val got = TokenBudget.select(d, "doc_id", "q", "n_tokens", 600L,
      maxBucketRows = 50L)
    assert(canon(got) == canon(naive(d, 600L)))

    // plan: every window is partitioned by the full segment key
    val plan = got.queryExecution.optimizedPlan.toString
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("__bucket") && l.contains("__q") && l.contains("__sub"),
        s"window not partitioned by the segment key: $l")
    }

    // data: no window partition anywhere near the corpus size (md5 prefix
    // spreads 500 rows over ~256 cells; allow generous slack)
    val maxCell = d
      .withColumn("__sub",
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
      .groupBy("__sub").count().agg(max("count")).head().getLong(0)
    assert(maxCell < 50L, s"largest sub-bucket cell is $maxCell rows")
  }

  test("skew path output is byte-identical to the healthy path") {
    // same data, threshold on vs off — the two plans must agree exactly
    val d = docs.cache()
    val healthy = canon(TokenBudget.select(d, "doc_id", "q", "n_tokens", 5000L))
    val skewed = canon(TokenBudget.select(d, "doc_id", "q", "n_tokens", 5000L,
      maxBucketRows = 1L))
    assert(healthy == skewed)
  }

  test("selectPerGroup equals the per-group naive prefix; unknown groups drop") {
    val rng = new scala.util.Random(13)
    val d = (1 to 300).map { i =>
      (i.toLong, Seq("web", "code", "books", "ghost")(rng.nextInt(4)),
        math.rint(rng.nextDouble() * 1e6) / 1e6, 1L + rng.nextInt(40))
    }.toDF("doc_id", "grp", "q", "n_tokens").cache()
    val budgets = Map("web" -> 500L, "code" -> 200L, "books" -> 0L)
    // "ghost" absent from budgets → dropped; "books" budget 0 → empty

    val got = TokenBudget.selectPerGroup(d, "grp", "doc_id", "q", "n_tokens",
        budgets)
      .select("doc_id", "grp", "cum_tokens")
      .as[(Long, String, Long)].collect().toSet

    val rows = d.select("doc_id", "grp", "q", "n_tokens")
      .as[(Long, String, Double, Long)].collect()
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
      budgets.get(g).toSeq.flatMap { budget =>
        var cum = 0L
        rs.sortBy { case (id, _, q, _) => (-q, md5hex(id.toString), id) }
          .map { case (id, _, _, tok) => cum += tok; (id, g, cum) }
          .takeWhile(_._3 <= budget)
      }
    }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(!got.exists(_._2 == "ghost") && !got.exists(_._2 == "books"))

    // skew path parity: force sub-bucketing, output must not change
    val skewed = TokenBudget.selectPerGroup(d, "grp", "doc_id", "q", "n_tokens",
        budgets, maxBucketRows = 1L)
      .select("doc_id", "grp", "cum_tokens")
      .as[(Long, String, Long)].collect().toSet
    assert(skewed == got)
  }

  test("no global (unpartitioned) window in the plan") {
    val plan = TokenBudget.select(docs, "doc_id", "q", "n_tokens", 500L)
      .queryExecution.optimizedPlan.toString
    // every Window node must carry the bucket partition key
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("__bucket"), s"unpartitioned window: $l")
    }
  }

  test("unimaxAllocation: capped prefix + uniform remainder, hand-checked") {
    // per-language token totals via text of known BPE counts: "a b c"
    // counts 3 tokens. Build langs with totals 2, 10, 30, 40 tokens.
    def doc(lang: String, id: Long, tokens: Int) =
      (id, lang, Seq.fill(tokens)("x").mkString(" "))
    val docs = (
      Seq(doc("aa", 1, 2)) ++
      Seq(doc("bb", 2, 10)) ++
      Seq(doc("cc", 3, 30)) ++
      Seq(doc("dd", 4, 40))
    ).toDF("doc_id", "lang", "text")
    // totals: 82; B = 41; capacities (x3): 6, 30, 90, 120; L=4
    // i=1 (aa): 6*4 + 0 = 24 <= 41 -> capped
    // i=2 (bb): 30*3 + 6 = 96 > 41 -> uncapped (and all later)
    // k=1, cum_k=6; uniform = (41-6) div 3 = 11
    val got = TokenBudget.unimaxAllocation(docs, budgetNum = 1, budgetDen = 2,
      epochCap = 3)
      .select("lang", "n_tokens", "capacity", "alloc_tokens", "is_capped")
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("aa", 2L, 6L, 6L, true),    // low-resource: all 3 epochs
      ("bb", 10L, 30L, 11L, false), // uniform share
      ("cc", 30L, 90L, 11L, false),
      ("dd", 40L, 120L, 11L, false)), got.toString)
    // budget respected: allocated <= B
    assert(got.toSeq.map(_._4).sum <= 41L)
    // all-capped degenerate case: budget >= total capacity
    val all = TokenBudget.unimaxAllocation(docs, budgetNum = 10, budgetDen = 1,
      epochCap = 3)
      .select("lang", "is_capped").as[(String, Boolean)].collect()
    assert(all.forall(_._2), all.mkString(","))
  }

  test("stripedShards: mass conserved per decile, deterministic, exact rel_dev") {
    import spark.implicits._
    // two clean score groups → buckets=2 splits exactly between them
    val perDoc = ((0L until 60L).map(i => (i, 100L)) ++
      (60L until 100L).map(i => (i, 900L))).toDF("doc_id", "score_pm")
    val got = TokenBudget.stripedShards(perDoc, "score_pm", "doc_id",
      nShards = 4, buckets = 2)
      .as[(Long, Long, Long, Double, Double)].collect()
    // every shard id in range; both deciles present
    assert(got.forall(r => r._1 >= 0 && r._1 < 4), got.mkString(","))
    assert(got.map(_._2).toSet == Set(1L, 2L), got.mkString(","))
    // decile mass conserved: shard counts sum back to 60 / 40
    val byDecile = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byDecile == Map(1L -> 60L, 2L -> 40L), byDecile.toString)
    // expected and rel_dev follow from the cell count exactly
    got.foreach { case (_, d, n, exp, dev) =>
      val nd = byDecile(d)
      assert(exp == math.rint(nd / 4.0 * 1e6) / 1e6)
      assert(dev == math.rint((n * 4 - nd).toDouble / nd * 1e6) / 1e6)
    }
    // deterministic: hash striping is content-addressed, not RNG
    val again = TokenBudget.stripedShards(perDoc, "score_pm", "doc_id",
      nShards = 4, buckets = 2)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(again == got.toSet)
    intercept[IllegalArgumentException](
      TokenBudget.stripedShards(perDoc, "score_pm", "doc_id", nShards = 1))
    // grid completion (ADVICE r11): with more shards than docs per decile,
    // empty cells MUST surface as n_docs=0 / rel_dev=-1, not vanish —
    // a shard with zero docs in a decile is the worst curriculum skew
    val wide = TokenBudget.stripedShards(perDoc, "score_pm", "doc_id",
      nShards = 64, buckets = 2)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(wide.length == 128, s"grid incomplete: ${wide.length} cells")
    val empty = wide.filter(_._3 == 0L)
    assert(empty.nonEmpty, "64 shards over 60/40 docs must leave empty cells")
    assert(empty.forall(_._5 == -1.0), empty.take(3).mkString(","))
  }

  test("packingCurve: closed-form block math on hand-counted tokens") {
    import spark.implicits._
    // BPE counts: "aaa bbb"=2, "a1b"=3 (letter/digit/letter runs),
    // "x y z w v"=5, ""=0 (excluded)
    val docs = Seq("aaa bbb", "a1b", "x y z w v", "").toDF("text")
    val got = TokenBudget.packingCurve(docs, lengths = Seq(2, 4))
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // (context_len, n_docs, total_tokens, doc_blocks, concat_blocks,
    //  pad_tokens, waste_frac)
    assert(got(2L) == ((2L, 3L, 10L, 6L, 5L, 2L, 0.166667)), got(2L).toString)
    assert(got(4L) == ((4L, 3L, 10L, 4L, 3L, 6L, 0.375)), got(4L).toString)
    intercept[IllegalArgumentException](
      TokenBudget.packingCurve(docs, lengths = Seq.empty))
    intercept[IllegalArgumentException](
      TokenBudget.packingCurve(docs, lengths = Seq(0)))
  }
}
