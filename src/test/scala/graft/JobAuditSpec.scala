package graft

/** Mechanized job-count audit over every registered query (the companion
  * of PlanAuditSpec, VERDICT r11 item 4).
  *
  * Plan-shape rules can't see the one scale-killer class that lives
  * OUTSIDE the plan: driver-side action loops. A query that issues one
  * job per key/round/bucket (a `.collect()` inside a loop, an iterative
  * refinement that silently grew a round) is linear-in-jobs even when
  * every individual plan is perfectly partitioned — q179 costs what it
  * costs because of JOB COUNT (two windowed median rounds), not data.
  * This spec executes every query at sf0.001 under a per-query job group
  * and asserts an upper bound on the number of Spark jobs (actions) it
  * launches.
  *
  * Budgets are UPPER bounds: measured cold-session counts (dump mode,
  * r12) plus ~30-50% headroom. Warm caches (q28's persisted IVF index
  * under tmpdir, q174's in-JVM build-once books) only LOWER a count, so
  * the assertion holds regardless of suite order or container state;
  * the index-building queries carry budgets sized for their COLD path
  * (constant Lloyd-iteration counts), which a warm run undershoots by
  * design — that asymmetry is why there is no "stale entry" rule here,
  * unlike PlanAuditSpec's deterministic allowlists. The default budget
  * is deliberately tight (most queries are 1-4 jobs: construction
  * collects + the noop write); every query that legitimately needs more
  * carries an explicit entry with a justification, so raising a budget
  * is a conscious, reviewed act.
  *
  * Dump mode (env GRAFT_JOB_AUDIT_DUMP=1) additionally prints every
  * query's measured count — the tool that built this table.
  */
class JobAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val defaultBudget = 6

  /** name -> (budget, why it needs more jobs than the default).
    * Measured cold counts in parentheses (r12 dump, AQE off, sf0.001).
    */
  private val budgets: Map[String, (Int, String)] = Map(
    "q28_ivf_kmeans" -> (40,
      "(3 warm / more cold) k-means train + persist on first touch of a " +
        "data dir: constant Lloyd iterations, one job each; warm runs " +
        "reopen the on-disk index and pay ~3 jobs"),
    "q186_nprobe_curve" -> (40,
      "rides the same q28 index (cold build = constant Lloyd iterations); " +
        "the curve itself is one scored pass + a count + the noop write"),
    "q144_cluster_quality" -> (40,
      "(14) Davies-Bouldin rides the q28 index build on a cold dir " +
        "(constant-iteration k-means) before its one-pass scatter aggregate"),
    "q65_pq_topk" -> (24,
      "(16) PQ codebook training: constant Lloyd iterations per subspace " +
        "+ the trained-books collect for the oracle"),
    "q174_ivfpq" -> (30,
      "(20) IVF-PQ build-once path: coarse k-means + per-subspace PQ " +
        "training, all constant-iteration; warm (in-JVM cache) runs are ~2"),
    "q100_semdedup" -> (24,
      "(11) SemDeDup k-means clustering: constant Lloyd iterations"),
    "q126_whitened_topk" -> (12,
      "(6) covariance aggregate + driver-side Jacobi eigen-solve " +
        "(dim x dim, constant) + centroid collects, each a small job"),
    "q107_pagerank" -> (14,
      "(8) fixed 10 power iterations by design (PLANS.md); iteration " +
        "count is a constant, never data-dependent"),
    "q179_volume_anomaly" -> (24,
      "(19) two windowed median rounds (median of counts, then MAD) — " +
        "the documented job-count cost of the exact-median screen"),
    "q110_leak_split" -> (22,
      "(17) leak-free K-fold protocol: per-fold boundary collects over " +
        "the CONSTANT fold count (5), not over data"),
    "q94_dedup_funnel" -> (20,
      "(15) funnel stages measured separately by design: each stage's " +
        "count is its own 1-row action, constant stage count"),
    "q39_regional_revenue" -> (16,
      "(12) stats-driven broadcast decision reads dim-side counts first " +
        "(r11 fix replacing the forced hint); constant handful of probes"),
    "q86_keep_best" -> (16,
      "(12) keep-best joins the dup-cluster frame back twice (cluster " +
        "build + representative pick), constant protocol"),
    "q88_incremental_dedup" -> (16,
      "(12) incremental batch protocol: per-batch state save/load " +
        "round-trips, constant batch count in the fixture"),
    "q162_lpa_communities" -> (16,
      "(11) label propagation: fixed round count over the clone-collapsed " +
        "pair graph, one job per round"),
    "q40_dup_clusters" -> (16,
      "(11) connected components: fixed small-star/large-star iteration " +
        "cap, one job per iteration"),
    "q169_source_lang_mi" -> (14,
      "(10) MI needs the cell histogram plus the two marginal frames and " +
        "the 1-row entropy scalars — each a tiny separate action"),
    "q154_source_kl" -> (12,
      "(9) per-source KL: vocabulary frame + per-source mass scalars, " +
        "constant job handful"),
    "q160_kn_score" -> (12,
      "(8) interpolated KN: continuation-count frame + discount scalars " +
        "collected once each"),
    "q112_nb_lang" -> (10,
      "(7) NB training is one aggregate but the closed-form model is " +
        "collected per class-prior/vocab scalar"),
    "q178_seasonality" -> (10,
      "(7) hour-grid completion bounds + per-lag scalar collects"),
    "q64_hybrid_rrf" -> (10,
      "(7) two retrieval arms (BM25 + vector) each materialize their " +
        "top-k before the RRF fuse")
  )

  test("every registered query stays inside its job budget at sf0.001") {
    val sc = spark.sparkContext
    val conf = spark.conf
    val aqeBefore = conf.get("spark.sql.adaptive.enabled", "true")
    // AQE re-plans add jobs nondeterministically; count the static shape
    conf.set("spark.sql.adaptive.enabled", "false")
    val dump = sys.env.get("GRAFT_JOB_AUDIT_DUMP").contains("1")
    try {
      val registry = SparkEntry.queries ++ SparkEntry.benchOnly
      val failures = scala.collection.mutable.ArrayBuffer.empty[String]
      for (name <- registry.keys.toSeq.sorted) {
        val group = s"jobaudit-$name"
        sc.setJobGroup(group, name, interruptOnCancel = false)
        try {
          registry(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val n = sc.statusTracker.getJobIdsForGroup(group).length
          if (dump) info(f"$n%4d jobs  $name")
          val budget = budgets.get(name).map(_._1).getOrElse(defaultBudget)
          if (n > budget)
            failures += s"$name: $n jobs > budget $budget — a driver-side " +
              "action loop grew; either remove the loop or raise the budget " +
              "with a justification"
        } catch {
          case e: Exception => failures += s"$name: execution failed: ${e.getMessage}"
        } finally sc.clearJobGroup()
      }
      // every budget entry must name a registered query (catch renames)
      val unknown = budgets.keySet -- registry.keySet
      if (unknown.nonEmpty)
        failures += s"budget entries for unregistered queries: $unknown"
      assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
    } finally conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
