package graft

import graft.sources.Sharding
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("shard assignment is row-local: stable under corpus growth") {
    val small = (1L to 50L).map(i => (i, i * 10)).toDF("doc_id", "n_tokens")
    val large = (1L to 500L).map(i => (i, i * 10)).toDF("doc_id", "n_tokens")
    val a = Sharding.withShard(small).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    val b = Sharding.withShard(large).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    assert(a.forall { case (id, s) => b(id) == s })
    assert(a.values.forall(s => s >= 0 && s < 16))
  }

  test("shardBalance partitions the corpus exactly and sums tokens") {
    val docs = (1L to 300L).map(i => (i, 7L)).toDF("doc_id", "n_tokens")
    val got = Sharding.shardBalance(docs, "n_tokens", nShards = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == 300L)
    assert(got.map(_._3).sum == 2100L)
    assert(got.forall(_._4 == 7L))
    // md5 uniformity at n=300, 8 shards: no shard empty or dominant
    assert(got.length == 8 && got.forall(r => r._2 > 10 && r._2 < 80))
  }

  test("epochOrder: reproducible per epoch, re-permuted across epochs") {
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    def order(epoch: Int): Seq[(Long, Long, Long)] =
      Sharding.epochOrder(docs, epoch).select("shard", "pos", "doc_id")
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val e1 = order(1)
    assert(e1 == order(1)) // deterministic rerun
    val e2 = order(2)
    assert(e1 != e2)       // epochs re-permute…
    // …but shard membership and per-shard position ranges are identical
    def membership(o: Seq[(Long, Long, Long)]) =
      o.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(membership(e1) == membership(e2))
    e1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq)
    }
  }

  test("no shuffle before the aggregation: assignment is map-side") {
    val docs = (1L to 50L).map(i => (i, 1L)).toDF("doc_id", "n_tokens")
    val plan = Sharding.withShard(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
