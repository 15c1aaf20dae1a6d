package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.embed.{DeterministicEmbedder, Embedder}
import graft.text.Chunker

/** ScalaCheck property tests (SURVEY.md §5): generator-driven invariants
  * for the pure kernels — the Spark-level operators are covered by the
  * per-operator specs and the DuckDB oracle; these pin the algebraic
  * properties that must hold for EVERY input, not just fixtures.
  */
class PropertySpec extends SparkSpec {

  /** Seeded generator sampling (the scalatest-scalacheck bridge isn't on
    * the classpath; deterministic seeds keep failures reproducible).
    */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(1 + i % 60), Seed(i.toLong)))

  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val textGen: Gen[String] = Gen.sized { n =>
    Gen.listOfN(math.min(n * 4, 600),
      Gen.frequency((8, Gen.alphaNumChar), (2, Gen.const(' ')),
        (1, Gen.const('\n')), (1, Gen.oneOf("!?.,;🎉中".toSeq))))
      .map(_.mkString)
  }

  test("chunker: chunks cover the text exactly, in order, within size") {
    val cases = samples(for {
      t <- textGen; size <- Gen.choose(4, 64); ov <- Gen.choose(0, 63)
    } yield (t, size, ov), 300)
    cases.foreach { case (t, size, ovRaw) =>
        val ov = ovRaw % size
        val spans = Chunker.chunkSpans(t, size, ov)
        if (t.isEmpty) assert(spans.isEmpty)
        else {
          assert(spans.head._1 == 0 && spans.last._2 == t.length)
          assert(spans.forall { case (s, e) => e > s && e - s <= size })
          // no gaps: each span starts at or before the previous end
          spans.sliding(2).foreach {
            case Seq((_, e1), (s2, _)) => assert(s2 <= e1)
            case _ =>
          }
          assert(Chunker.chunk(t, size, ov) ==
            spans.map { case (s, e) => t.substring(s, e) })
        }
    }
  }

  test("embedder: deterministic, unit-norm or zero, cosine bounded") {
    val e: Embedder = new DeterministicEmbedder(dim = 32)
    samples(Gen.zip(textGen, textGen), 200).foreach { case (a, b) =>
      val va = e.embed(a)
      assert(va.toSeq == e.embed(a).toSeq) // deterministic
      val norm = math.sqrt(va.map(x => x.toDouble * x).sum)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-4)
      val c = cosineLocal(va, e.embed(b))
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      // identical text → cosine 1 (or 0 for zero vectors)
      val self = cosineLocal(va, va)
      assert(self == 0.0 || math.abs(self - 1.0) < 1e-9)
    }
  }

  test("as-of join equals per-row brute force on random event sets") {
    import java.sql.Timestamp
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 15); nr <- Gen.choose(0, 15)
      lts <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0, 50)))
      rts <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0, 50)))
    } yield (lts, rts)
    samples(gen, 25).zipWithIndex.foreach { case ((lts, rts), i) =>
      val left = lts.zipWithIndex
        .map { case ((k, t), j) => (k, new Timestamp(t * 1000L), j.toLong) }
        .toDF("k", "ts", "lid")
      // right side unique per (k, ts) — the operator's contract
      val rightRows = rts.distinct.zipWithIndex
        .map { case ((k, t), j) => (k, new Timestamp(t * 1000L), j * 10.0 + i) }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val right = rightRows.toDF("k", "ts", "v")
      val got = graft.ops.AsofJoin.asof(left, right, "k", "ts", "v")
        .select($"lid", $"asof_value").as[(Long, Option[Double])]
        .collect().toMap
      // brute force: latest right at/before each left row per key
      lts.zipWithIndex.foreach { case ((k, t), j) =>
        val expect = rightRows.filter(r => r._1 == k && r._2.getTime <= t * 1000L)
          .sortBy(_._2.getTime).lastOption.map(_._3)
        assert(got(j.toLong) == expect,
          s"case $i: lid $j key $k t $t: got ${got(j.toLong)} want $expect")
      }
    }
  }

  test("token-budget selection equals the brute-force sorted prefix") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 1000),  // quality in thousandths → duplicate-heavy
        Gen.choose(0L, 40L))) // token counts, zeros included
    } yield rows
    samples(gen, 12).zipWithIndex.foreach { case (rows, i) =>
      val docs = rows.zipWithIndex
        .map { case ((q, tok), id) => (id.toLong, q / 1000.0, tok) }
      val total = docs.map(_._3).sum
      val df = docs.toDF("doc_id", "q", "n_tokens")
      for (budget <- Seq(0L, total / 3, total)) {
        val got = graft.ops.TokenBudget
          .select(df, "doc_id", "q", "n_tokens", budget, buckets = 10)
          .select($"doc_id", $"cum_tokens").as[(Long, Long)]
          .collect().toMap
        // brute force: sorted prefix with inclusive running sum, ordered
        // (quality DESC, md5(id) ASC, id ASC) — TokenBudget's hash
        // tie-break (lowercase-hex md5 compares identically as a string
        // in JVM and Spark)
        def md5hex(x: String) = java.security.MessageDigest
          .getInstance("MD5").digest(x.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        var cum = 0L
        val expect = docs.sortBy { case (id, q, _) => (-q, md5hex(id.toString), id) }
          .map { case (id, _, tok) => cum += tok; (id, cum) }
          .takeWhile(_._2 <= budget).toMap
        assert(got == expect, s"case $i budget $budget: got $got want $expect")
      }
    }
  }

  test("range join equals brute-force theta join on random event sets") {
    import java.sql.Timestamp
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 12); nr <- Gen.choose(0, 12); w <- Gen.choose(1, 20)
      lts <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0, 80)))
      rts <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0, 80)))
    } yield (lts, rts, w)
    samples(gen, 25).foreach { case (lts, rts, w) =>
      val left = lts.zipWithIndex
        .map { case ((k, t), j) => (k, j.toLong, new Timestamp(t * 1000L)) }
        .toDF("k", "lid", "lts")
      val right = rts.zipWithIndex
        .map { case ((k, t), j) => (k, j.toLong, new Timestamp(t * 1000L)) }
        .toDF("k", "rid", "rts")
      val got = graft.ops.RangeJoin
        .withinWindow(left, right, "k", "lts", "rts", w.toLong)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val expect = (for {
        ((lk, lt), li) <- lts.zipWithIndex
        ((rk, rt), ri) <- rts.zipWithIndex
        if lk == rk && math.abs(lt - rt) <= w
      } yield (li.toLong, ri.toLong)).toSet
      assert(got == expect, s"w=$w lts=$lts rts=$rts")
    }
  }

  test("top-k is the prefix of the full sort (threshold −∞)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e: Embedder = new DeterministicEmbedder(dim = 16)
    samples(Gen.zip(Gen.choose(1, 10), Gen.choose(1L, 3L)), 6).foreach { case (k, seed) =>
      val corpus = (0L until 40L)
        .map(i => (i, e.embed(s"doc $i seed $seed").toSeq))
        .toDF("vec_id", "embedding")
      val q = e.embed(s"query $seed").map(_.toDouble).toSeq
      val topk = graft.search.Search.topK(corpus, q, k = k, threshold = -2.0)
        .select($"vec_id").as[Long].collect().toSeq
      val full = graft.search.Search.scoreAll(corpus, q)
        .orderBy(desc("score"), asc("vec_id"))
        .select($"vec_id").as[Long].collect().toSeq
      assert(topk == full.take(k))
    }
  }

  test("packSequences: bins are contiguous, ordered, and budget-aligned") {
    import spark.implicits._
    samples(Gen.zip(
      Gen.listOfN(30, Gen.choose(1L, 400L)), Gen.choose(100L, 600L)), 20)
      .foreach { case (weights, budget) =>
        val df = weights.zipWithIndex
          .map { case (w, i) => ("g", i.toLong, w) }.toDF("g", "id", "w")
        val got = graft.ingest.Ingest.packSequences(df, "g", "id", "w", budget)
          .select($"id", $"w", $"bin").as[(Long, Long, Long)]
          .collect().sortBy(_._1)
        // bin of each row == floor(exclusive prefix sum / budget), so:
        var cum = 0L
        got.foreach { case (_, w, bin) =>
          assert(bin == cum / budget, s"bin mismatch at cum=$cum budget=$budget")
          cum += w
        }
        // bins are non-decreasing in id order and start at 0
        assert(got.head._3 == 0L)
        got.sliding(2).foreach {
          case Array((_, _, a), (_, _, b)) => assert(a <= b)
          case _ =>
        }
      }
  }

  test("quantizeInt8 round-trip error is within half a code step for random vectors") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    samples(Gen.listOfN(24, Gen.choose(-5.0, 5.0)), 30).foreach { v =>
      import graft.functions.VectorFunctions._
      val df = Seq(Tuple1(v)).toDF("v")
        .withColumn("s", maxAbs(col("v")))
        .select(col("s"), dequantizeInt8(quantizeInt8(col("v"), col("s")), col("s")).as("b"))
        .as[(Double, Seq[Double])].head()
      val (scale, back) = df
      v.zip(back).foreach { case (x, y) =>
        assert(math.abs(x - y) <= scale / 254.0 + 1e-12)
      }
    }
  }

  test("containmentPairsExact: recall 1.0 vs brute force for random corpora and thresholds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(2, 25)
      vocabSize <- Gen.choose(5, 30)
      t <- Gen.oneOf(0.3, 0.5, 0.8, 1.0)
      docs <- Gen.listOfN(n, Gen.choose(1, 20).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, vocabSize - 1).map(k => s"w$k"))))
    } yield (docs.map(_.mkString(" ")), t)
    samples(gen, 10).zipWithIndex.foreach { case ((texts, t), i) =>
      val df = texts.zipWithIndex.map { case (txt, id) => (id.toLong, txt) }
        .toDF("doc_id", "text")
      val got = graft.dedup.Dedup.containmentPairsExact(df, minContainment = t)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val sh = df.select(col("doc_id"), graft.dedup.Dedup.shingles(col("text")).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val ids = sh.keys.toSeq.sorted
      val want = (for {
        a <- ids; b <- ids if a < b
        c = sh(a).toSet.intersect(sh(b).toSet).size.toDouble /
          math.min(sh(a).size, sh(b).size)
        if c >= t
      } yield (a, b)).toSet
      assert(got == want,
        s"case $i t=$t: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("hubnessCloneCollapsed == brute-force hubness for random clone corpora") {
    import spark.implicits._
    val gen = for {
      nDistinct <- Gen.choose(2, 10)
      dims <- Gen.choose(2, 5)
      k <- Gen.choose(1, 4)
      mults <- Gen.listOfN(nDistinct, Gen.choose(1, 6))
      vecs <- Gen.listOfN(nDistinct,
        Gen.listOfN(dims, Gen.choose(-100, 100).map(_ / 25.0f)))
    } yield (vecs, mults, k)
    samples(gen, 12).zipWithIndex.foreach { case ((vecs, mults, k), i) =>
      // interleaved ids so clone member rank never equals insertion order
      val rows = for {
        (v, g) <- vecs.zipWithIndex
        c <- 0 until mults(g)
      } yield (c * 1000L + g, v.toSeq)
      val df = rows.toDF("vec_id", "embedding")
      val bits = graft.search.Ann.occupancyBits(vecs.size.toLong, 2.0)
      val plain = graft.search.Ann.hubness(df, k = k, bits = bits)
        .as[(Long, Long)].collect().toMap
      val collapsed = graft.search.Ann.hubnessCloneCollapsed(df, k = k)
        .as[(Long, Long)].collect().toMap
      assert(collapsed == plain,
        s"case $i k=$k mults=$mults: got $collapsed want $plain")
    }
  }

  test("heavyHittersExact == brute force for random skewed streams") {
    import spark.implicits._
    val gen = for {
      nHot <- Gen.choose(1, 4)
      hotReps <- Gen.listOfN(nHot, Gen.choose(50, 200))
      tail <- Gen.listOfN(300, Gen.choose(0, 120).map(k => s"t$k"))
      ppm <- Gen.oneOf(20000L, 50000L, 100000L)
    } yield (hotReps.zipWithIndex.flatMap { case (r, h) =>
      Seq.fill(r)(s"hot$h") } ++ tail, ppm)
    samples(gen, 8).zipWithIndex.foreach { case ((toks, ppm), i) =>
      val got = graft.stats.CountMin.heavyHittersExact(
          toks.toDF("token"), "token", thresholdPpm = ppm)
        .as[(String, Long, Long)].collect()
      val n = toks.size.toLong
      val tau = math.max((n / 1000000L) * ppm + ((n % 1000000L) * ppm + 999999L) / 1000000L, 1L)
      val want = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= tau).toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      assert(got.map(t => (t._1, t._2)).toSeq == want,
        s"case $i ppm=$ppm: got ${got.toSeq} want $want")
      assert(got.forall(t => t._3 >= t._2), s"case $i: est < cnt")
    }
  }
}
