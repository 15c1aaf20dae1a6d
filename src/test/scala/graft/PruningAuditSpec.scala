package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Column-pruning / filter-pushdown audit for flagship scans — the
  * "push down and prune" half of the 100 TB contract that
  * PlanAuditSpec's shape rules don't cover. A documents scan that
  * reads `text` for a metadata-only aggregate multiplies scan bytes
  * ~50×; Catalyst prunes automatically TODAY, but a future edit
  * (a UDF over the whole row, a cache() above the select, a schema
  * forced on read) can silently widen the scan, and nothing in the
  * correctness gate would notice. Each entry pins what the scan must
  * NOT read (and, where a point filter feeds the scan, that it reached
  * PushedFilters).
  */
class PruningAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def scansOf(name: String): Seq[FileSourceScanExec] = {
    // AQE wraps executedPlan in AdaptiveSparkPlanExec, which hides the
    // physical tree from collect() until execution — audit without it,
    // as PlanAuditSpec does (AQE never widens a scan's ReadSchema)
    val conf = spark.conf
    val before = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan
      (plan +: plan.subqueriesAll).flatMap(_.collect {
        case s: FileSourceScanExec => s
      })
    } finally conf.set("spark.sql.adaptive.enabled", before)
  }

  private def table(s: FileSourceScanExec): String =
    s.relation.location.rootPaths.map(_.getName).mkString(",")

  /** query -> (table substring, columns the scan must NOT read). */
  private val mustNotRead: Seq[(String, String, Set[String])] = Seq(
    ("q03_stats_by_source", "documents", Set("text")),
    ("q04_corpus_stats", "documents", Set("text")),
    ("q26_lang_histogram", "documents", Set("text")),
    ("q47_p95_outliers", "documents", Set("text")),
    ("q117_exact_quantiles", "documents", Set("text")),
    ("q146_winsorized_stats", "documents", Set("text")),
    ("q148_event_transitions", "events", Set("props", "value")),
    ("q08_window_rank", "orders", Set("o_comment", "o_clerk")),
    ("q22_bucket_stats", "embeddings", Set("label"))
  )

  test("metadata-only queries never read heavy columns off the scan") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((q, tbl, banned) <- mustNotRead) {
      val scans = scansOf(q).filter(s => table(s).contains(tbl))
      if (scans.isEmpty) failures += s"$q: no $tbl scan found (query or rule stale)"
      for (s <- scans) {
        val read = s.requiredSchema.fieldNames.toSet
        val bad = read intersect banned
        if (bad.nonEmpty)
          failures += s"$q: $tbl scan reads pruned-contract columns $bad (ReadSchema=$read)"
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("q01's query-vector point filter reaches the parquet scan") {
    // the broadcast side is `vec_id = <id>` — if this stops being pushed,
    // the query-vector lookup becomes a full scan of the embedding table
    val pushed = scansOf("q01_cosine_topk")
      .filter(s => table(s).contains("embeddings"))
      .map(s => s.metadata.getOrElse("PushedFilters", ""))
    assert(pushed.exists(_.contains("EqualTo(vec_id")),
      s"no EqualTo(vec_id, ...) in any embeddings scan's PushedFilters: $pushed")
  }
}
