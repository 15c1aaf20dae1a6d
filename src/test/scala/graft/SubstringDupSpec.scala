package graft

import graft.dedup.{Dedup, DupClusters}

class SubstringDupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-doc shared gram yields one span per doc") {
    val docs = Seq(
      (1L, "xxabcdefghyy"),
      (2L, "abcdefghzzzz")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupSpans(docs, k = 8)
      .as[(Long, Long, Long)].collect().toSet
    // only the 8-char gram "abcdefgh" repeats corpus-wide; it starts at
    // pos 3 in doc 1 and pos 1 in doc 2 — one k-length span each
    assert(got == Set((1L, 1L, 8L), (2L, 1L, 8L)))
  }

  test("within-doc repetition merges overlapping windows into one span") {
    val docs = Seq((1L, "abcdabcdabcd"), (2L, "unrelated text")).toDF("doc_id", "text")
    val got = Dedup.substringDupSpans(docs, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    // every 4-gram of doc 1 recurs (period-4 text): positions 1..9 all
    // marked, gaps of 1 merge into a single island covering the doc
    assert(got == Set((1L, 1L, 12L)))
  }

  test("far-apart hits stay separate spans; short docs drop out") {
    val docs = Seq(
      (1L, "aaaahijklmnopbbbb"), // "aaaa" at 1, "bbbb" at 14 — gap > k
      (2L, "aaaa"),
      (3L, "bbbb"),
      (4L, "xy") // shorter than k: no grams, no row
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupSpans(docs, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 8L), (2L, 1L, 4L), (3L, 1L, 4L)))
  }

  test("normalization: case and surrounding whitespace do not defeat the match") {
    val docs = Seq(
      (1L, "  SHAREDPREFIXA tail one"),
      (2L, "sharedprefixa tail two  ")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupSpans(docs, k = 13)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(got == Set(1L, 2L))
  }
  test("native k-gram kernel == composed per-position form (md5Int60 parity)") {
    val base = new scala.util.Random(31).alphanumeric.take(600).mkString
    val docs = Seq(
      (1L, base),
      (2L, "zz" + base.substring(100, 400) + "qq"),  // shared middle
      (3L, base.take(31)),                           // len = k-1 -> drops
      (4L, base.take(32)),                           // exactly k: 1 gram
      (5L, "  " + base.take(64).toUpperCase + "  ")) // trim+lower path
      .toDF("doc_id", "text")
    val kernel = Dedup.substringDupSpans(docs, k = 32)
      .as[(Long, Long, Long)].collect().toSet
    val composed = Dedup.substringDupSpans(docs, k = 32, kernelGrams = false)
      .as[(Long, Long, Long)].collect().toSet
    assert(kernel == composed, s"kernel=$kernel composed=$composed")
  }
}

class LeakFreeFoldsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  private def pairs = Seq(
    (1L, 2L), (2L, 3L), // cluster {1,2,3}
    (10L, 11L), // cluster {10,11}
    (20L, 21L), (21L, 22L), (20L, 22L) // clique {20,21,22}
  ).toDF("doc_a", "doc_b")

  test("no dup pair straddles a fold; doc counts conserve") {
    val folds = DupClusters.leakFreeFolds(docs, pairs, nFolds = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(folds.forall(_._5 == 0L), s"cross-fold dup pairs: ${folds.mkString(",")}")
    assert(folds.map(_._2).sum == 40L) // every doc in exactly one fold
    // 3 clusters + 32 singletons = 35 split units
    assert(folds.map(_._3).sum == 35L)
    // 8 clustered docs counted as dup docs
    assert(folds.map(_._4).sum == 8L)
    assert(folds.map(_._1).toSet.subsetOf((0L until 5L).toSet))
  }

  test("assignment is deterministic and extends consistently") {
    val a = DupClusters.leakFreeFolds(docs, pairs, nFolds = 5)
      .orderBy("fold").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val b = DupClusters.leakFreeFolds(docs, pairs, nFolds = 5)
      .orderBy("fold").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
    // a NEW clone of doc 1 joins doc 1's cluster → lands in the same fold,
    // leaving cross_fold_dup_pairs at 0
    val docs2 = docs.union(Seq((41L, "clone of 1")).toDF("doc_id", "text"))
    val pairs2 = pairs.union(Seq((1L, 41L)).toDF("doc_a", "doc_b"))
    val folds2 = DupClusters.leakFreeFolds(docs2, pairs2, nFolds = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(folds2.forall(_._5 == 0L))
    assert(folds2.map(_._2).sum == 41L)
  }

  test("nFolds must be >= 2") {
    intercept[IllegalArgumentException] {
      DupClusters.leakFreeFolds(docs, pairs, nFolds = 1)
    }
  }

  test("prebuiltClusters (the materialized dup-graph seam) == label-prop path") {
    // q110's seam hands leakFreeFolds a cluster map read back from
    // parquet instead of rebuilding it; the fold summary must be
    // identical. Round-trip through disk to mirror the real seam.
    val dir = java.nio.file.Files.createTempDirectory("graft_dupg").toString
    pairs.write.parquet(s"$dir/pairs")
    DupClusters.clusters(spark.read.parquet(s"$dir/pairs"))
      .write.parquet(s"$dir/clusters")
    val viaSeam = DupClusters.leakFreeFolds(docs,
        spark.read.parquet(s"$dir/pairs"), nFolds = 5,
        prebuiltClusters = Some(spark.read.parquet(s"$dir/clusters")))
      .orderBy("fold").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val direct = DupClusters.leakFreeFolds(docs, pairs, nFolds = 5)
      .orderBy("fold").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(viaSeam == direct)
  }
}
