package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous query serving: a STREAM of query vectors against the
  * STATIC vector corpus — the online form of the reference's `/query`
  * endpoint (`/root/reference/mock_vector_db_api.py:255-311`), which
  * serves one request at a time; here each micro-batch of requests is
  * answered by ONE shared corpus scan.
  *
  * foreachBatch over the audited batch operator
  * ([[graft.search.Search.topKBatch]]) is deliberately the whole
  * implementation: the corpus side is static (re-read each batch so
  * compactions/appends are picked up), the query batch is small and
  * BROADCASTS, and the per-query top-k is the WindowGroupLimit-bounded
  * rank the batch plan already audits (PLANS.md q02). A stream-stream
  * join is the wrong tool — there is no event-time relation between
  * queries and corpus rows. Results parity with the batch operator is
  * therefore structural (same code path), and StreamingSpec asserts it
  * end-to-end.
  *
  * Scale shape: per micro-batch cost is one corpus map-side pass ×
  * |batch queries| (prunable with any [[graft.search.Ann]] prefilter by
  * swapping `scan`), state size zero — no watermark, no state store.
  */
object StreamingSearch {

  /** Start serving: each micro-batch of `queries` is scored with
    * `scan(corpus, batch)` and handed to `sink`. The default scan is
    * the exact broadcast top-k over the `queryId`/`queryVec` columns;
    * pass a different `scan` (e.g. SQ8 or Hamming prescan + rerank) to
    * trade recall for scan cost. `queryId`/`queryVec` live in a
    * preceding parameter list so the default `scan` expression can
    * reference them — a custom column name reaches the default scan
    * instead of being silently ignored.
    */
  def serveTopK(queries: DataFrame, corpus: DataFrame,
                sink: DataFrame => Unit,
                k: Int = 5, threshold: Double = 0.1,
                queryId: String = "query_id", queryVec: String = "query_vec")(
                scan: (DataFrame, DataFrame, Int, Double) => DataFrame =
                  (c, q, kk, t) => graft.search.Search.topKBatch(
                    c, q, kk, t, queryId = queryId, queryVec = queryVec))
      : StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(scan(corpus, batch, k, threshold))
      }
      .start()

  /** Persisted-index scan for [[serveTopK]] (VERDICT r14 item 5's
    * serving seam): each micro-batch routes through the batched IVF
    * probe ([[graft.search.Ann.ivfSearchBatch]]) — every query probes
    * its own `nprobe` inverted lists and the lists scan partition-prunes
    * to the probe union — instead of a full corpus pass per batch. The
    * serve loop's `corpus` frame is ignored: the index IS the corpus's
    * serving layout (rebuild/append via writeIvf/appendToIvf, picked up
    * on the next batch because the lists are re-read each time).
    * nprobe = nCentroids is exact (recall 1.0, StreamingSpec pins
    * parity with the exact scan); smaller nprobe is the usual
    * recall-for-cost knob. Output shape matches topKBatch:
    * (queryId, vec_id, score, rank), threshold after ranking on the RAW
    * score (inside the probe, before its 6dp display rounding — the
    * same threshold semantic as topKBatch, so a score within 5e-7 of
    * the threshold lands identically on both serving paths; ADVICE
    * r15), score rounded 6dp by the probe.
    */
  def indexedScan(spark: org.apache.spark.sql.SparkSession,
                  indexPath: String, nprobe: Int,
                  queryId: String = "query_id", queryVec: String = "query_vec",
                  pred: Option[org.apache.spark.sql.Column] = None)
      : (DataFrame, DataFrame, Int, Double) => DataFrame = {
    import org.apache.spark.sql.functions.col
    (_, batch, k, t) =>
      graft.search.Ann.ivfSearchBatch(spark, indexPath, batch, k, nprobe,
        queryIdCol = queryId, queryVecCol = queryVec, threshold = t,
        pred = pred)
        .select(col(queryId), col("vec_id"), col("score"), col("rank"))
  }

  /** FILTERED continuous serving (q212's metadata predicate in streaming
    * form): [[indexedScan]] with a batch-wide predicate over the payload
    * columns stored in the inverted lists — pushed into the pruned
    * parquet scan each micro-batch, never a post-filter over scored
    * candidates. Per-REQUEST predicates (each query filtering its own
    * label) are a different shape: route those as join columns on the
    * queries frame, or partition the batch by predicate and serve one
    * scan per group.
    */
  def filteredIndexedScan(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, nprobe: Int,
                          pred: org.apache.spark.sql.Column,
                          queryId: String = "query_id",
                          queryVec: String = "query_vec")
      : (DataFrame, DataFrame, Int, Double) => DataFrame =
    indexedScan(spark, indexPath, nprobe, queryId, queryVec, Some(pred))

  /** TEXT-query serving seam (q210's composition in streaming form —
    * the reference's full online path, text in → neighbors out, as one
    * serve loop): each micro-batch of (queryId, `textCol`) rows is
    * embedded MAP-SIDE with the oracle-replayable
    * [[graft.embed.Md5TokenEmbedder]] and handed to `inner` — the exact
    * scan or [[indexedScan]] — unchanged. Composition keeps the two
    * halves independently testable: embed parity is q32/q210's gate,
    * scan parity is the serve-loop specs'.
    */
  def embedThenScan(inner: (DataFrame, DataFrame, Int, Double) => DataFrame,
                    textCol: String = "query_text",
                    queryVec: String = "query_vec",
                    embedder: graft.embed.Md5TokenEmbedder =
                      new graft.embed.Md5TokenEmbedder())
      : (DataFrame, DataFrame, Int, Double) => DataFrame = {
    import org.apache.spark.sql.functions.col
    (corpus, batch, k, t) => inner(corpus,
      batch.withColumn(queryVec,
        graft.embed.Embedder.embedDoubleColumn(col(textCol), embedder)),
      k, t)
  }
}
