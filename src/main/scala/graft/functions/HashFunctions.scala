package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashes built from md5 hex prefixes.
  *
  * Spark's native `hash`/`xxhash64` are not reproducible in DuckDB, so
  * every operator whose output must be oracle-comparable (MinHash,
  * SimHash, fingerprints) derives integers from `md5(...)` instead:
  *
  *   Spark :  conv(substr(md5(x), 1, k), 16, 10)::long
  *   DuckDB:  ('0x' || substr(md5(x), 1, k))::BIGINT
  *
  * both yield the same non-negative integer (k <= 15 keeps it within a
  * signed 64-bit range). md5 is overkill cryptographically but it is the
  * one hash both engines share bit-for-bit.
  */
object HashFunctions {

  /** 32-bit non-negative hash of a string column (md5 prefix, 8 hex
    * chars). r19: computed by the native [[Md5PrefixLong]] kernel —
    * bit-identical to the documented conv/substring phrasing (which the
    * DuckDB oracles keep), without allocating and re-parsing the hex
    * string per evaluation. [[md5Int32Expr]] is the composed witness.
    */
  def md5Int32(c: Column): Column = Md5PrefixLong(c.cast("binary"), 8)

  /** 60-bit non-negative hash of a string column (md5 prefix, 15 hex chars). */
  def md5Int60(c: Column): Column = Md5PrefixLong(c.cast("binary"), 15)

  /** Composed expression-tree forms — the oracle-documenting twins the
    * specs assert the kernels against.
    */
  def md5Int32Expr(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  def md5Int60Expr(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Universal-family hash h_j(x) = (a_j * md5_32(x) + b_j) mod p, used by
    * MinHash. p is a prime > 2^32; a_j, b_j are derived deterministically
    * from the hash index j so both engines can reconstruct them.
    */
  val MinhashPrime: Long = 4294967311L // smallest prime > 2^32

  def minhashA(j: Int): Long = 2L * j + 1 // odd multipliers
  def minhashB(j: Int): Long = 1000000007L * (j + 1) % MinhashPrime
}

/** The engine-wide hasher switch: `spark.graft.hasher` = `md5` (default —
  * the oracle-replayable path every CORRECTNESS check runs) or `xxh` (the
  * production path: Spark-native XXH64 with no digest allocation — the
  * measured −37%…2.2× on the hot kernels at 100×, PERF.md r12 — but no
  * DuckDB twin, so never the default for an engine gated on hash-exact
  * oracle comparison).
  *
  * Hasher-parametric operators ([[graft.text.CorpusOps.hashedBigramQuality]],
  * [[graft.dedup.Dedup.cdcSharedChunks]]) default their `hasher` argument
  * to [[Hashers.FromConf]] and resolve it against the session at
  * COLUMN-CONSTRUCTION time — the kernels receive a fixed boolean, so
  * canonicalization, codegen, and plan caching never see a conf read in
  * the hot path, and flipping the conf mid-session affects only plans
  * built afterwards.
  */
object Hashers {

  val ConfKey = "spark.graft.hasher"

  /** Sentinel default for `hasher` parameters: resolve from the session
    * conf (md5 unless `spark.graft.hasher` says otherwise).
    */
  val FromConf = "conf"

  /** Canonicalize to "md5" | "xxh"; `FromConf` reads the session conf.
    * "xxhash64" is accepted as an alias of "xxh".
    */
  def resolve(spark: org.apache.spark.sql.SparkSession, hasher: String): String = {
    val raw = if (hasher == FromConf) spark.conf.get(ConfKey, "md5") else hasher
    raw match {
      case "md5" => "md5"
      case "xxh" | "xxhash64" => "xxh"
      case other => throw new IllegalArgumentException(
        s"hasher must be md5 or xxh (conf $ConfKey), got '$other'")
    }
  }
}
