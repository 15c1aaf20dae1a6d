package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Quality-first corpus selection under a token budget: keep the
  * best-scored documents whose running token total fits the budget —
  * the "fill a 10B-token training mix with the highest-quality docs"
  * step of an LLM data pipeline.
  *
  * Semantics: order docs by (quality DESC, md5(id) ASC, id ASC), take
  * the maximal prefix whose inclusive running token sum is ≤ `budget`.
  * The hash tie-break is deliberate: among equal-quality docs the kept
  * set is an unbiased pseudo-random sample rather than an id-ordered
  * prefix (ids usually encode crawl order — a biased cut), and it is
  * what makes the skew path below exact (see `maxBucketRows`).
  *
  * The naive phrasing is a running sum over a GLOBAL ordering — a
  * single-partition Window, i.e. one reducer scanning the whole corpus;
  * a non-starter at 100 TB. This implementation gets the identical
  * result with no global sort:
  *   1. bucket docs by quality (`floor(q·buckets)` — monotone in q, so
  *      bucket order refines the global order),
  *   2. aggregate per-bucket token sums + row counts — the only
  *      mandatory full-data pass, a two-phase hash aggregate shuffling
  *      ≤ `buckets` rows,
  *   3. the driver prefix-sums the ≤ `buckets`-row bucket histogram
  *      into per-bucket offsets and DROPS every bucket whose offset
  *      already exceeds the budget (those docs can never be kept — the
  *      filter prunes them before any window work),
  *   4. a Window PARTITIONED BY bucket (never global) adds the
  *      within-bucket running sum to the broadcast-joined offset.
  *
  * Skew guard (`maxBucketRows`): `floor(q·buckets)` degenerates when one
  * quality value dominates — e.g. a constant-quality corpus (unscored
  * docs defaulting to 1.0) lands in ONE bucket, making the "partitioned"
  * window a single corpus-sized partition. Any bucket whose pass-1 row
  * count exceeds `maxBucketRows` is therefore SUB-BUCKETED: a second
  * aggregate (over the hot buckets only — zero extra cost on healthy
  * distributions) histograms (exact quality value, first-2-hex-of-md5)
  * cells, the driver folds those cells into the same prefix-sum — exact,
  * because (quality, md5-prefix) is a prefix of the global ordering
  * tuple (quality, md5, id), so cells are consecutive runs of the global
  * order — and the window partitions on (bucket, quality, sub-bucket),
  * capping the largest partition at ~1/256 of the hot value's rows.
  * A hot bucket can only be over-full because few exact values dominate
  * (each hot value carries > maxBucketRows/256ths of it), so the cell
  * histogram stays driver-sized; a hard `require` caps it regardless.
  *
  * `qualityCol` must be numeric in [0, 1) ∪ {1} and deterministic
  * (round it — ordering on an unrounded double is not reproducible
  * across engines); `idCol` must be unique, making the window ordering
  * total and the running sums exact.
  */
object TokenBudget {

  /** Per-group budgets: the "fill a training mixture" step where every
    * domain/source gets its OWN token budget (e.g. q74's mixture weights
    * times a global budget) and the quality-first prefix is taken within
    * each group independently. Same machinery as [[select]] with the
    * group riding in every key: the histogram is (group, bucket) — still
    * ≤ groups×(buckets+1) driver rows — offsets are prefix-summed per
    * group against that group's budget, and the window partitions on
    * (group, bucket, …), so the skew guard applies per group too.
    * Groups absent from `budgets` are dropped entirely (no offset rows
    * ⇒ the join eliminates them). Returns original columns plus
    * `cum_tokens`, the inclusive running token sum WITHIN the group.
    */
  def selectPerGroup(docs: DataFrame, groupCol: String, idCol: String,
                     qualityCol: String, tokenCol: String,
                     budgets: Map[String, Long], buckets: Int = 1000,
                     maxBucketRows: Long = 4L * 1000 * 1000): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    require(maxBucketRows > 0, s"maxBucketRows must be > 0, got $maxBucketRows")
    val spark = docs.sparkSession
    // groups without a budget can never contribute output — drop them
    // BEFORE any aggregation so the histogram collect is bounded by
    // groups-with-budget × buckets, not by distinct groups in the data
    // (per-host budgets over 1e8 hosts must not OOM the driver)
    val inScope = docs.filter(col(groupCol).isInCollection(budgets.keySet))
    val bucketed = inScope
      .withColumn("__bucket", floor(col(qualityCol) * buckets).cast(LongType))
      .withColumn("__tie", md5(col(idCol).cast(StringType).cast("binary")))

    val hist = bucketed.groupBy(col(groupCol), col("__bucket"))
      .agg(sum(col(tokenCol)).cast(LongType).as("__btok"),
        count(lit(1)).as("__bn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val hotCells = hist.filter(_._4 > maxBucketRows)
      .map { case (g, b, _, _) => (g, b) }.toSet

    val subHist: Map[(String, Long), Array[(Double, String, Long)]] =
      if (hotCells.isEmpty) Map.empty
      else {
        // restrict the cell aggregate to the hot (group, bucket) PAIRS
        // inside the plan — a hot group's healthy buckets must not be
        // aggregated at (quality, md5-prefix) granularity and collected
        val isHotPair = hotCells.map { case (g, b) =>
          col(groupCol) === g && col("__bucket") === b
        }.reduce(_ || _)
        val cells = bucketed
          .filter(isHotPair)
          .groupBy(col(groupCol), col("__bucket"),
            col(qualityCol).cast(DoubleType).as("__q"),
            substring(col("__tie"), 1, 2).as("__sub"))
          .agg(sum(col(tokenCol)).cast(LongType).as("__ctok"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            r.getString(3), r.getLong(4)))
        require(cells.length <= (1 << 21),
          s"TokenBudget per-group skew histogram has ${cells.length} cells; " +
          s"raise `buckets` (currently $buckets)")
        cells.groupBy(t => (t._1, t._2)).map { case (k, rs) =>
          k -> rs.map(t => (t._3, t._4, t._5))
            .sortBy { case (q, sub, _) => (-q, sub) }
        }
      }

    // per-group prefix sums (buckets descending within the group),
    // pruned at the group's budget; unknown groups contribute nothing
    val offsets = collection.mutable.ArrayBuffer.empty[Row]
    hist.groupBy(_._1).foreach { case (g, rows) =>
      budgets.get(g).foreach { budget =>
        var acc = 0L
        rows.sortBy(-_._2).foreach { case (_, b, btok, _) =>
          subHist.get((g, b)) match {
            case None =>
              if (acc <= budget) offsets += Row(g, b, -1.0, "", acc, budget)
              acc += btok
            case Some(cells) =>
              cells.foreach { case (q, sub, ctok) =>
                if (acc <= budget) offsets += Row(g, b, q, sub, acc, budget)
                acc += ctok
              }
          }
        }
      }
    }

    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      StructType(Seq(
        StructField(groupCol, StringType, nullable = false),
        StructField("__bucket", LongType, nullable = false),
        StructField("__q", DoubleType, nullable = false),
        StructField("__sub", StringType, nullable = false),
        StructField("__offset", LongType, nullable = false),
        StructField("__budget", LongType, nullable = false))))

    val isHot =
      if (hotCells.isEmpty) lit(false)
      else hotCells.map { case (g, b) =>
        col(groupCol) === g && col("__bucket") === b
      }.reduce(_ || _)
    val keyed = bucketed
      .withColumn("__q",
        when(isHot, col(qualityCol).cast(DoubleType)).otherwise(lit(-1.0)))
      .withColumn("__sub",
        when(isHot, substring(col("__tie"), 1, 2)).otherwise(lit("")))

    val w = Window.partitionBy(col(groupCol), col("__bucket"), col("__q"), col("__sub"))
      .orderBy(col(qualityCol).desc, col("__tie").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    keyed
      .join(broadcast(offDf), Seq(groupCol, "__bucket", "__q", "__sub"))
      .withColumn("cum_tokens",
        col("__offset") + sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= col("__budget"))
      .drop("__bucket", "__tie", "__q", "__sub", "__offset", "__budget")
  }

  /** docs(idCol, qualityCol, tokenCol, …) → the kept prefix, original
    * columns plus `cum_tokens` (global inclusive running token sum).
    */
  def select(docs: DataFrame, idCol: String, qualityCol: String,
             tokenCol: String, budget: Long, buckets: Int = 1000,
             maxBucketRows: Long = 4L * 1000 * 1000): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    require(maxBucketRows > 0, s"maxBucketRows must be > 0, got $maxBucketRows")
    val spark = docs.sparkSession
    val tie = md5(col(idCol).cast(StringType).cast("binary"))
    val bucketed = docs
      .withColumn("__bucket", floor(col(qualityCol) * buckets).cast(LongType))
      .withColumn("__tie", tie)

    // full-data pass #1: per-bucket token totals + row counts; ≤ buckets+1
    // rows reach the driver, never documents
    val hist = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(tokenCol)).cast(LongType).as("__btok"),
        count(lit(1)).as("__bn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)

    val hotBuckets = hist.filter(_._3 > maxBucketRows).map(_._1).toSet

    // skew pass (hot buckets only): (bucket, exact quality, md5[0:2])
    // cell sums. Bounded driver-side: hot cells are dominated by few
    // exact values by construction; the require is the hard backstop.
    val subHist: Map[Long, Array[(Double, String, Long)]] =
      if (hotBuckets.isEmpty) Map.empty
      else {
        val cells = bucketed
          .filter(col("__bucket").isInCollection(hotBuckets))
          .groupBy(col("__bucket"),
            col(qualityCol).cast(DoubleType).as("__q"),
            substring(col("__tie"), 1, 2).as("__sub"))
          .agg(sum(col(tokenCol)).cast(LongType).as("__ctok"))
          .collect()
        require(cells.length <= (1 << 21),
          s"TokenBudget skew histogram has ${cells.length} cells — the hot " +
          s"buckets carry too many distinct $qualityCol values; raise " +
          s"`buckets` (currently $buckets) so quality splits them instead")
        cells.map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
          .groupBy(_._1)
          .map { case (b, rs) =>
            b -> rs.map(t => (t._2, t._3, t._4))
              .sortBy { case (q, sub, _) => (-q, sub) }
          }
      }

    // Driver prefix-sum over segments in global order: buckets descending;
    // a hot bucket contributes its (quality DESC, sub ASC) cells in place.
    // Segment key = (__bucket, __q, __sub) with (-1.0, "") sentinels for
    // whole-bucket segments (quality is confined to [0,1], so -1 is free).
    // Segments whose offset exceeds the budget can never be kept (token
    // counts are non-negative) and are pruned pre-window.
    var acc = 0L
    val offsets = collection.mutable.ArrayBuffer.empty[Row]
    hist.foreach { case (b, btok, _) =>
      subHist.get(b) match {
        case None =>
          if (acc <= budget) offsets += Row(b, -1.0, "", acc)
          acc += btok
        case Some(cells) =>
          cells.foreach { case (q, sub, ctok) =>
            if (acc <= budget) offsets += Row(b, q, sub, acc)
            acc += ctok
          }
      }
    }

    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      StructType(Seq(
        StructField("__bucket", LongType, nullable = false),
        StructField("__q", DoubleType, nullable = false),
        StructField("__sub", StringType, nullable = false),
        StructField("__offset", LongType, nullable = false))))

    // the same segment key on the corpus side: hot buckets key by their
    // exact quality + md5 prefix, healthy buckets by the sentinels
    val isHot = if (hotBuckets.isEmpty) lit(false)
                else col("__bucket").isInCollection(hotBuckets)
    val keyed = bucketed
      .withColumn("__q",
        when(isHot, col(qualityCol).cast(DoubleType)).otherwise(lit(-1.0)))
      .withColumn("__sub",
        when(isHot, substring(col("__tie"), 1, 2)).otherwise(lit("")))

    // within-segment running sum; (quality, md5, id) is a total order
    // inside the segment, so offset + running = the global inclusive
    // cumsum. The largest partition is one healthy bucket or one
    // (hot value × md5-prefix) cell — never the corpus.
    val w = Window.partitionBy(col("__bucket"), col("__q"), col("__sub"))
      .orderBy(col(qualityCol).desc, col("__tie").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    keyed
      .join(broadcast(offDf), Seq("__bucket", "__q", "__sub"))
      .withColumn("cum_tokens",
        col("__offset") + sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__bucket", "__tie", "__q", "__sub", "__offset")
  }

  /** UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): split a total token budget across
    * languages as uniformly as possible, capping every language at
    * `epochCap` epochs of its own data so low-resource languages are
    * never over-repeated. The closed form exploits that with capacities
    * sorted ascending the capped languages are exactly a PREFIX (if
    * language i exceeds its fair share, every larger language does
    * too), so no sequential loop is needed:
    *
    *   k  = max { i : capacityᵢ·(L−i+1) + Σ_{j<i} capacityⱼ ≤ B }
    *   allocᵢ = capacityᵢ                    for i ≤ k (capped)
    *   allocᵢ = ⌊(B − Σ_{j≤k} capacityⱼ)/(L−k)⌋  otherwise (uniform)
    *
    * B = ⌊total·budgetNum/budgetDen⌋. All arithmetic is integer —
    * hash-exact across engines. Scale shape: the only corpus-sized work
    * is the per-language token aggregate (two-phase hash agg, native
    * [[graft.functions.BpeTokenCount]] kernel); every window after it
    * runs over |languages| rows.
    */
  def unimaxAllocation(docs: DataFrame, budgetNum: Long = 1, budgetDen: Long = 2,
                       epochCap: Int = 3, langCol: String = "lang",
                       textCol: String = "text"): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && epochCap > 0,
      s"need positive budget fraction and epoch cap, got $budgetNum/$budgetDen, $epochCap")
    val counts = docs.groupBy(col(langCol))
      .agg(sum(graft.functions.BpeTokenCount(col(textCol))).as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * epochCap)
    // |languages| rows from here on: the single-partition windows below
    // are over a handful of rows, never the corpus
    val wAsc = Window.orderBy(col("capacity").asc, col(langCol).asc)
    val wAll = Window.partitionBy()
    val ranked = counts
      .withColumn("__i", row_number().over(wAsc))
      .withColumn("__cum_before",
        coalesce(sum(col("capacity")).over(
          wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__L", count(lit(1)).over(wAll))
      .withColumn("__total", sum(col("n_tokens")).over(wAll))
      .withColumn("__B", expr(s"(__total * $budgetNum) div $budgetDen"))
      .withColumn("__capped",
        col("capacity") * (col("__L") - col("__i") + 1) + col("__cum_before") <= col("__B"))
    ranked
      .withColumn("__k", max(when(col("__capped"), col("__i")).otherwise(0L)).over(wAll))
      .withColumn("__cum_k",
        max(when(col("__capped"), col("__cum_before") + col("capacity"))
          .otherwise(0L)).over(wAll))
      .withColumn("alloc_tokens",
        when(col("__i") <= col("__k"), col("capacity"))
          .otherwise(expr("(__B - __cum_k) div (__L - __k)")))
      .withColumn("is_capped", col("__i") <= col("__k"))
      // integer micro-epochs: how many epochs of its own data each
      // language actually runs under this allocation
      .withColumn("micro_epochs", expr("(alloc_tokens * 1000000) div n_tokens"))
      .select(col(langCol), col("n_tokens"), col("capacity"),
        col("alloc_tokens"), col("is_capped"), col("micro_epochs"))
  }

  /** Packing-efficiency curve: for each candidate context length L,
    * the padding waste of document-isolated packing (every document
    * occupies ceil(tokens/L) blocks of its own — no cross-document
    * attention contamination) next to the concat-stream lower bound
    * (ceil(total/L), what q53-style greedy packing approaches). This is
    * the table that picks a training context length: the gap between
    * the two columns is exactly what sequence packing can recover, and
    * the waste_frac column is what doc-isolated batching pays at each L.
    *
    * Scale shape: one map-side token count ([[graft.functions
    * .BpeTokenCount]], codegen) exploded over the |Ls| candidate
    * lengths (constant fan-out), then one |Ls|-row hash aggregate —
    * nothing shuffles but per-L partials; no packing simulation, the
    * block counts are closed-form.
    */
  def packingCurve(docs: DataFrame, lengths: Seq[Int] = Seq(128, 256, 512, 1024),
                   textCol: String = "text"): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ >= 1),
      s"need positive context lengths, got $lengths")
    docs
      .select(graft.functions.BpeTokenCount(col(textCol)).cast("long").as("__t"))
      .filter(col("__t") > 0)
      .select(col("__t"),
        explode(typedLit(lengths.map(_.toLong))).as("context_len"))
      .groupBy(col("context_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("total_tokens"),
        // integer ceil-division: exact at any corpus scale (a double
        // quotient is safe below ~2^40 tokens but why carry the proof)
        sum(expr("(__t + context_len - 1) div context_len")).as("doc_blocks"))
      .withColumn("concat_blocks",
        expr("(total_tokens + context_len - 1) div context_len"))
      .withColumn("pad_tokens",
        col("doc_blocks") * col("context_len") - col("total_tokens"))
      .withColumn("waste_frac", round(
        col("pad_tokens").cast("double") /
          (col("doc_blocks") * col("context_len")).cast("double"), 6))
  }

  /** Curriculum shard striping: assign every document to one of
    * `nShards` training shards such that each shard carries the SAME
    * quality-decile mix, then audit the result. Data ordering matters
    * for training; a shard that drew mostly low-decile docs gives its
    * data-parallel worker a different curriculum than its peers. The
    * round-robin-within-decile construction needs a corpus-scale ordered
    * window, so the assignment is HASH striping instead — `md5(id) mod
    * nShards` inside each score decile: deterministic, partition-
    * invariant, no window over the corpus, and uniform in expectation
    * with deviation O(1/√(n_decile/nShards)), which the audit output
    * measures rather than assumes.
    *
    * Deciles come from the q155 cum-mass rule over the integer score
    * histogram (≤ |distinct scores| rows through the global window —
    * scores are integer-quantized by contract). Output: one row per
    * (shard, decile) with the exact count, the uniform expectation, and
    * the exact-integer-numerator relative deviation.
    */
  def stripedShards(perDoc: DataFrame, scoreCol: String, idCol: String,
                    nShards: Int, buckets: Int = 10): DataFrame = {
    require(nShards >= 2 && nShards <= 65536,
      s"need 2 <= nShards <= 65536, got $nShards")
    require(buckets >= 2 && buckets <= 1000,
      s"need 2 <= buckets <= 1000, got $buckets")
    // THE decile rule — shared with q155's calibration (Stats.bucketBounds)
    // so the two queries' bucket boundaries can never drift apart
    val bounds = graft.stats.Stats.bucketBounds(perDoc, scoreCol, buckets)
    val cells = perDoc.crossJoin(broadcast(bounds))
      .withColumn("decile", graft.stats.Stats.bucketIndex(col(scoreCol)))
      .withColumn("shard", pmod(
        graft.functions.HashFunctions.md5Int32(col(idCol).cast("string")),
        lit(nShards.toLong)))
      .groupBy(col("shard"), col("decile")).agg(count(lit(1)).as("n_docs"))
    val perDecile = cells.groupBy(col("decile")).agg(sum("n_docs").as("__nd"))
    // Complete the (shard × observed-decile) grid before reporting: a
    // shard that drew ZERO docs in a decile is the worst curriculum-skew
    // violation this audit exists to catch, and a grouped count silently
    // omits it. |grid| = nShards × buckets rows — driver-side tiny; the
    // shard frame is a broadcast range, never a shuffle of the corpus.
    val shards = cells.sparkSession.range(nShards).select(col("id").as("shard"))
    val grid = perDecile.crossJoin(broadcast(shards))
    grid.join(cells, Seq("shard", "decile"), "left")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .select(col("shard"), col("decile"), col("n_docs"),
        round(col("__nd").cast("double") / lit(nShards.toDouble), 6)
          .as("expected"),
        round((col("n_docs") * nShards - col("__nd")).cast("double") /
          col("__nd").cast("double"), 6).as("rel_dev"))
  }
}
