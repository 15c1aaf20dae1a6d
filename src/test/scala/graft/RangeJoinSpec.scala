package graft

import java.sql.Timestamp

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("pairs within the window, across bucket boundaries, no duplicates") {
    val l = Seq((1L, 10L, ts(100)), (1L, 11L, ts(250)), (2L, 12L, ts(100)))
      .toDF("k", "lid", "lts")
    val r = Seq(
      (1L, 20L, ts(130)),  // 30s from lid 10 → match
      (1L, 21L, ts(199)),  // 99s from 10 (crosses a bucket edge), 51s from 11
      (1L, 22L, ts(240)),  // 140s from 10 (no), 10s from 11 (yes)
      (2L, 23L, ts(300))   // 200s away → no match
    ).toDF("k", "rid", "rts")
    val got = RangeJoin.withinWindow(l, r, "k", "lts", "rts", windowSec = 100L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == Seq((10L, 20L), (10L, 21L), (11L, 21L), (11L, 22L)))
    assert(got.distinct.length == got.length) // bucket trick emits no dupes
  }

  test("plans as an equi join on (key, bucket), not a nested loop") {
    val l = Seq((1L, 1L, ts(0))).toDF("k", "lid", "lts")
    val r = Seq((1L, 2L, ts(1))).toDF("k", "rid", "rts")
    val plan = RangeJoin.withinWindow(l, r, "k", "lts", "rts", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
