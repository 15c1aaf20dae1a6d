package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Self-defending against container-level timing noise (observed ±5x on
  * identical code across driver windows — see PERF.md):
  *   - each query runs SPARK_GRAFT_BENCH_PASSES times (default 3),
  *     INTERLEAVED (pass 1 over all queries, then pass 2, ...) so a
  *     transient slowdown hits one pass of many queries rather than all
  *     repetitions of one query;
  *   - the reported per-query number and the total are the per-query
  *     MEDIANS across passes; per-query minima ship alongside in
  *     "queries_min" for cross-checking;
  *   - a fixed no-op control job ("__control") runs once per pass and is
  *     reported separately as the noise floor — if the control's spread is
  *     wide, the window itself was noisy and cross-round deltas in that
  *     window are not code-attributable.
  *
  * Each query is materialized through the noop sink (full evaluation of
  * every column, no driver collect, no pruned-count shortcut) after a
  * warm-up of the session itself.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Fixed-size CPU-bound job used as the per-pass noise floor: a 2^22-row
    * range with a multiply-hash aggregate. No I/O, no shuffle beyond the
    * final single-partition agg; any variance in this number is the
    * container, not the engine.
    */
  private def control(spark: SparkSession): Unit = {
    spark.range(1L << 22)
      .selectExpr("sum(id * 2654435761) as s", "count(1) as c")
      .write.format("noop").mode("overwrite").save()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); without this the scan
      // can't even infer the schema (SparkEntry.readEvents converts the
      // nanos Long to an exact micros timestamp)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/session once (codegen, parquet footer cache paths) and
    // touch every table's footer/file listing so per-query numbers measure
    // compute, not first-touch metadata I/O.
    spark.range(1000).selectExpr("sum(id)").collect()
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try spark.read.parquet(f.getPath).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup skip ${f.getName}: ${e.getMessage}")
        }
      }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val controlSamples = collection.mutable.ListBuffer.empty[Double]

    for (pass <- 1 to passes) {
      val c0 = System.nanoTime()
      control(spark)
      val cSec = (System.nanoTime() - c0) / 1e9
      controlSamples += cSec
      System.err.println(f"[bench] pass $pass __control $cSec%8.3f s")
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        samples(name) = samples(name) :+ sec
        System.err.println(f"[bench] pass $pass $name%-24s $sec%8.3f s")
      }
    }

    val med = names.map { case (name, _) => name -> median(samples(name)) }
    val mins = names.map { case (name, _) => name -> samples(name).min }
    def jsonMap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    val ctlMed = median(controlSamples.toList)
    val ctlMin = controlSamples.min
    val ctlMax = controlSamples.max
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jsonMap(med)},""" +
      f""""queries_min":${jsonMap(mins)},"passes":$passes,""" +
      f""""control":{"median":$ctlMed%.3f,"min":$ctlMin%.3f,"max":$ctlMax%.3f},""" +
      f""""sf":"$sfDir"}""")
    spark.stop()
  }
}
