package graft

import java.sql.Timestamp

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("picks the latest right row at-or-before each left row, per key") {
    val clicks = Seq(
      (1L, ts(10), "c1"), (1L, ts(20), "c2"), (1L, ts(5), "c0"),
      (2L, ts(10), "c3")
    ).toDF("user_id", "ts", "click")
    val views = Seq(
      (1L, ts(8), 100.0), (1L, ts(15), 200.0), (1L, ts(25), 300.0),
      (2L, ts(10), 400.0) // same-instant: must match (>= semantics)
    ).toDF("user_id", "ts", "v")

    val got = AsofJoin.asof(clicks, views, "user_id", "ts", "v")
      .select($"user_id", $"click", $"asof_value")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, "c0", None),         // nothing at/before minute 5
      (1L, "c1", Some(100.0)),  // view@8
      (1L, "c2", Some(200.0)),  // view@15 (not 25)
      (2L, "c3", Some(400.0)))) // same-timestamp view matches
  }

  test("a matched right row with a NULL value yields null, not a stale value") {
    val l = Seq((1L, ts(30), "c")).toDF("k", "ts", "p")
    val r = Seq(
      (1L, ts(10), Some(5.0)),
      (1L, ts(20), Option.empty[Double]) // the match — value null
    ).toDF("k", "ts", "v")
    val got = AsofJoin.asof(l, r, "k", "ts", "v")
      .select($"asof_value").as[Option[Double]].head()
    assert(got.isEmpty) // ASOF matches ts(20); must NOT carry 5.0 forward
  }

  test("NULL timestamps: right rows match nothing, left rows get no match") {
    val clicks = Seq(
      (1L, Some(ts(10)), "c1"),
      (1L, None, "c_null") // left NULL ts: must match nothing
    ).toDF("user_id", "ts", "click")
    val views = Seq(
      (1L, None, 42.0),    // right NULL ts: must never be anyone's match
      (1L, Some(ts(20)), 100.0) // after every left row → unmatched too
    ).toDF("user_id", "ts", "v")
    val got = AsofJoin.asof(clicks, views, "user_id", "ts", "v")
      .select($"click", $"asof_value")
      .as[(String, Option[Double])].collect().toSet
    assert(got == Set(("c1", None), ("c_null", None)))
  }

  test("keys never mix; left columns survive") {
    val l = Seq((1L, ts(1), "a"), (9L, ts(1), "b")).toDF("k", "ts", "payload")
    val r = Seq((1L, ts(0), 7.0)).toDF("k", "ts", "v")
    val got = AsofJoin.asof(l, r, "k", "ts", "v")
    assert(got.columns.toSet == Set("k", "ts", "payload", "asof_value"))
    val m = got.select($"k", $"asof_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(7.0) && m(9L).isEmpty)
  }

  test("plans as one shuffle on the key (window), not a theta join") {
    val l = Seq((1L, ts(1), "a")).toDF("k", "ts", "p")
    val r = Seq((1L, ts(0), 1.0)).toDF("k", "ts", "v")
    val plan = AsofJoin.asof(l, r, "k", "ts", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
