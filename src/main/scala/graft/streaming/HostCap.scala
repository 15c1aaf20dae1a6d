package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-host admission cap — the continuous form of the batch
  * crawl-budget policy (q95, `SparkEntry.qHostCap`): admit at most `cap`
  * documents per host for the stream's lifetime, dropping the rest AT
  * INGEST TIME instead of in a batch repair pass. The batch operator
  * picks the best-`cap` by quality after the fact; the stream can only
  * enforce first-`cap`-to-arrive (it cannot see the future), so the two
  * agree exactly when arrival order is the ranking order — asserted in
  * StreamingSpec.
  *
  * State discipline (the 100 TB concern): state per host is ONE long
  * (admitted count) in the state store, keyed by host — bytes per
  * domain, not per document, and hosts are naturally bounded (~1e8 for
  * the full web). No timeout: a crawl budget is stream-lifetime by
  * definition; use a windowed pre-aggregation instead if budgets reset
  * per epoch.
  *
  * Within one micro-batch the per-host iterator order is not defined by
  * Spark, so rows are admitted in (ts, id) order inside the batch —
  * this makes replays deterministic and matches event-time arrival.
  */
object HostCap {

  final case class HostDoc(host: String, doc_id: Long, ts: Long)

  def capPerHost(docs: Dataset[HostDoc], cap: Int): Dataset[HostDoc] = {
    require(cap > 0, s"cap must be > 0, got $cap")
    implicit val enc = Encoders.product[HostDoc]
    implicit val longEnc = Encoders.scalaLong
    docs.groupByKey(_.host)(Encoders.STRING)
      .flatMapGroupsWithState[Long, HostDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[HostDoc], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val batch = rows.toSeq.sortBy(d => (d.ts, d.doc_id))
          val room = math.max(0L, cap - admitted)
          val take = batch.take(math.min(room, Int.MaxValue).toInt)
          state.update(admitted + take.length)
          take.iterator
      }
  }
}
