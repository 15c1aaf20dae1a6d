package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size

  test("co-located join of two same-bucketed tables plans with zero shuffles") {
    val facts = (0 until 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "a")
    val dims = (0 until 500).map(i => (i.toLong % 100, i)).toDF("k", "b")
    Bucketing.writeBucketed(facts, "bkt_facts", 4, "k")
    Bucketing.writeBucketed(dims, "bkt_dims", 4, "k")
    // disable broadcast so the test exercises the bucketed SMJ path —
    // exactly the fact⋈fact shape where bucketing matters at scale — and
    // AQE so ShuffleExchangeExec nodes are visible to plan traversal
    // (AdaptiveSparkPlanExec hides its inner plan from collect)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.coLocatedJoin(spark, "bkt_facts", "bkt_dims", Seq("k"))
      assert(shuffles(joined) == 0,
        s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      // and the result matches the plain (shuffled) join
      val plain = facts.join(dims, Seq("k"))
      assert(shuffles(plain) > 0, "control: unbucketed join does shuffle")
      assert(joined.count() == plain.count())
      assert(joined.agg(org.apache.spark.sql.functions.sum($"k" + $"b"))
        .head().getLong(0) ==
        plain.agg(org.apache.spark.sql.functions.sum($"k" + $"b"))
          .head().getLong(0))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("groupBy on the bucket key of a bucketed table skips the shuffle") {
    val facts = (0 until 1000).map(i => (i.toLong % 50, i)).toDF("k", "v")
    Bucketing.writeBucketed(facts, "bkt_agg", 4, "k")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table("bkt_agg").groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"))
      assert(shuffles(agg) == 0,
        s"bucketed aggregation must not shuffle:\n${agg.queryExecution.executedPlan}")
      val expect = facts.groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .as[(Long, Long)].collect().toMap
      assert(agg.as[(Long, Long)].collect().toMap == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_agg")
    }
  }

  test("writeBucketed validates bucket count") {
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(Seq((1L, "x")).toDF("k", "a"), "bkt_bad", 0, "k")
    }
  }
}
