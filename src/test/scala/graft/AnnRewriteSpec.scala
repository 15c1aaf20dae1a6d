package graft

import org.apache.spark.sql.functions._
import graft.functions.SignBucket
import graft.plans.AnnTopKRewrite
import graft.search.{Ann, Search}

class AnnRewriteSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed: a LocalRelation corpus would be constant-folded away
  // by ConvertToLocalRelation before extraOptimizations run
  private lazy val corpusPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_annrw").toString
    Seq(
      (0L, Seq(1.0f, 1.0f, -1.0f, 1.0f)),
      (1L, Seq(0.9f, 1.1f, -0.5f, 2.0f)),  // same sign bucket as 0
      (2L, Seq(-1.0f, -1.0f, 1.0f, -1.0f)), // opposite bucket
      (3L, Seq(1.0f, 1.0f, 1.0f, 1.0f))     // differs in one hyperplane
    ).toDF("vec_id", "embedding").write.mode("overwrite").parquet(p)
    p
  }
  private def corpus = spark.read.parquet(corpusPath)

  private val qVec = Seq(1.0, 1.0, -1.0, 1.0)

  // register once; the rule is inert while the conf flag is off
  if (!spark.experimental.extraOptimizations.contains(AnnTopKRewrite)) {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AnnTopKRewrite
  }

  private def withFlag[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption(AnnTopKRewrite.ConfKey)
    spark.conf.set(AnnTopKRewrite.ConfKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(AnnTopKRewrite.ConfKey, v)
      case None => spark.conf.unset(AnnTopKRewrite.ConfKey)
    }
  }

  test("native SignBucket equals the HOF signBucket phrasing") {
    val rnd = new scala.util.Random(3)
    val vecs = (Seq.tabulate(50)(i =>
        (i.toLong, Seq.fill(12)(rnd.nextGaussian().toFloat))) :+
        (99L, Seq.fill(12)(0.0f)))
      .toDF("vec_id", "embedding")
    val mism = vecs.select(
        SignBucket(col("embedding"), 8).as("native"),
        Ann.signBucket("embedding", 8).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(mism == 0L)
    // short vector: only existing components contribute bits
    val short = Seq(Tuple1(Seq(1.0f, -1.0f))).toDF("embedding")
      .select(SignBucket(col("embedding"), 8)).as[Long].head()
    assert(short == 1L)
  }

  test("flag off: plan untouched, results exact") {
    withFlag(false) {
      val df = Search.topK(corpus, qVec, k = 3, threshold = -2.0)
      assert(!df.queryExecution.optimizedPlan.toString.contains("sign_bucket"))
      assert(df.select($"vec_id").as[Long].collect().toSeq == Seq(0L, 1L, 3L))
    }
  }

  test("flag on: bucket probe injected, scores only the query's bucket") {
    withFlag(true) {
      val df = Search.topK(corpus, qVec, k = 3, threshold = -2.0)
      assert(df.queryExecution.optimizedPlan.toString.contains("sign_bucket"),
        s"expected probe filter in:\n${df.queryExecution.optimizedPlan}")
      // vec 3 differs in one hyperplane → pruned by nprobe=1; vec 2 is
      // in the opposite bucket; only 0 and 1 remain
      assert(df.select($"vec_id").as[Long].collect().toSeq == Seq(0L, 1L))
      // identical answer to the explicit ivfTopK API (same semantics;
      // bits=4 — the HOF signBucket indexes element_at(v, bits) and the
      // corpus is 4-dim, whereas the native SignBucket the rule injects
      // handles vectors shorter than `bits` gracefully)
      val explicit = Ann.ivfTopK(corpus,
          corpus.filter($"vec_id" === 0).select($"embedding".as("qv")),
          "qv", k = 3, bits = 4)
        .select($"vec_id").as[Long].collect().toSeq
      assert(explicit == Seq(0L, 1L))
    }
  }

  test("rule is idempotent and ignores non-matching shapes") {
    withFlag(true) {
      val df = Search.topK(corpus, qVec, k = 3, threshold = -2.0)
      val probes = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.exists { case _: SignBucket => true; case _ => false } => f
      }
      assert(probes.size == 1, "exactly one probe filter")
      // ascending sort (a bottom-k) must NOT be rewritten
      val asc = corpus
        .withColumn("score",
          graft.functions.CosineSimilarity($"embedding",
            array(qVec.map(lit): _*)))
        .orderBy($"score".asc).limit(2)
      assert(!asc.queryExecution.optimizedPlan.toString.contains("sign_bucket"))
      // non-literal query side (column vs column) must NOT be rewritten
      val nonlit = corpus
        .withColumn("score",
          graft.functions.CosineSimilarity($"embedding", $"embedding"))
        .orderBy($"score".desc).limit(2)
      assert(!nonlit.queryExecution.optimizedPlan.toString.contains("sign_bucket"))
    }
  }
}
