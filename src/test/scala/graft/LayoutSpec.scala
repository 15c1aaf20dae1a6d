package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Z-order layout + zone-map skipping audit (q218). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches the hand-computed Morton code") {
    // a = 0b101 -> even positions 0,2,4 = 1 + 0 + 16; b = 0b011 ->
    // odd positions 1,3,5 = 2 + 8 + 0; total 27
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.interleave($"a", $"b", 3).as("zv"))
      .as[Long].head()
    assert(got == 27L, s"got $got")
    // bit-position identities
    val ids = Seq((1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L))
      .toDF("a", "b")
      .select(Layout.interleave($"a", $"b", 4).as("zv"))
      .as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L, 5L, 10L), s"got $ids")
  }

  test("skippingAudit on a uniform grid: zorder prunes every box, " +
    "linear cannot prune the b-only box") {
    // 64 x 64 uniform grid; 64 files of 64 rows each
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b =>
      (a.toLong * 64 + b, a.toLong, b.toLong))).toDF("k", "a", "b")
    val audit = Layout.skippingAudit(grid, "a", "b",
      bits = 6, nFiles = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(audit.size == 6)
    assert(audit.values.forall(_._1 == 64L), "files_total must be 64")
    // the linear a-sort prunes the a-box perfectly: only files holding
    // the box's a-columns survive
    val (_, linASkip, linAScan) = audit(("linear", "a_mid"))
    assert(linASkip >= 56, s"linear a_mid skipped only $linASkip")
    // ...and cannot prune the b-only box AT ALL (every file spans all b)
    val (_, linBSkip, linBScan) = audit(("linear", "b_mid"))
    assert(linBSkip == 0L && linBScan == 4096L,
      s"linear b_mid: skip=$linBSkip scan=$linBScan")
    // zorder prunes ALL THREE boxes
    for (box <- Seq("a_mid", "b_mid", "ab_mid")) {
      val (_, zSkip, _) = audit(("zorder", box))
      assert(zSkip > 0, s"zorder skipped nothing on $box")
    }
    // and beats linear where linear is blind
    val (_, zBSkip, zBScan) = audit(("zorder", "b_mid"))
    assert(zBSkip > linBSkip && zBScan < linBScan)
    // the 2-D box scans no more under zorder than under linear
    assert(audit(("zorder", "ab_mid"))._3 <= audit(("linear", "ab_mid"))._3)
  }

  test("skippingAudit: degenerate single-value dimension does not " +
    "divide by zero and every file trivially overlaps its box") {
    val flat = (0 until 100).map(i => (i.toLong, i.toLong, 7L))
      .toDF("k", "a", "b")
    val audit = Layout.skippingAudit(flat, "a", "b",
      bits = 4, nFiles = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    // b is constant: the b-only box [7,7] overlaps every file
    assert(audit(("linear", "b_mid")) == 0L)
    assert(audit(("zorder", "b_mid")) == 0L)
    // a still prunes
    assert(audit(("linear", "a_mid")) > 0L)
  }
}
