package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import scala.util.hashing.MurmurHash3

/** Text → dense vector embedding interface.
  *
  * The reference embeds chunks with sentence-transformers
  * (`/root/reference/repo_to_vector.py:77-78,343`); that model is neither
  * available offline nor oracle-reproducible, so the engine treats the
  * embedder as a pluggable strategy. [[DeterministicEmbedder]] is the
  * default: a seeded token-hash projection that is pure, fast, and
  * identical on every executor — the canonical stand-in for batch model
  * inference (the real-model variant would be the same `mapPartitions`
  * shape with a per-partition model handle).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Seeded hash-projection embedding: each lowercase whitespace token adds a
  * signed magnitude to one of `dim` buckets; the result is L2-normalized.
  * Zero-token text yields the all-zero vector (which the reference's cosine
  * maps to score 0 — mock_vector_db_api.py:50-51).
  */
final class DeterministicEmbedder(val dim: Int = 64, seed: Int = 42) extends Embedder {
  override def embed(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    if (text != null) {
      // locale-independent lowercase (UTF8String = Spark lower()'s own
      // path): String.toLowerCase under a Turkish default locale maps I
      // to dotless ı, making embeddings differ ACROSS EXECUTORS with
      // different locales — breaking this embedder's determinism contract
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val it = lowered.split("\\s+").iterator.filter(_.nonEmpty)
      while (it.hasNext) {
        val t = it.next()
        val h = MurmurHash3.stringHash(t, seed)
        val idx = math.floorMod(h, dim)
        val sign = if (((h >>> 16) & 1) == 0) 1.0 else -1.0
        val mag = 1.0 + ((h >>> 17) & 0x7).toDouble / 8.0
        v(idx) += sign * mag
      }
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += v(i) * v(i); i += 1 }
    val out = new Array[Float](dim)
    if (ss > 0) {
      val n = math.sqrt(ss)
      i = 0
      while (i < dim) { out(i) = (v(i) / n).toFloat; i += 1 }
    }
    out
  }
}

/** Oracle-replayable embedder: the token hash is the first 8 hex chars of
  * md5 (the one hash Spark and DuckDB share bit-for-bit — see
  * [[graft.functions.HashFunctions]]), and [[embedDouble]] keeps the whole
  * computation in Double, so a scan→chunk→embed→cosine pipeline built on
  * it can be hash-compared against an independent DuckDB SQL phrasing
  * (q32's oracle). Bucket/sign/magnitude layout mirrors
  * [[DeterministicEmbedder]]; only the hash family differs.
  */
final class Md5TokenEmbedder(val dim: Int = 64) extends Embedder {
  override def embed(text: String): Array[Float] = {
    val d = embedDouble(text)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { out(i) = d(i).toFloat; i += 1 }
    out
  }

  /** Lossless form — no float cast, for oracle-exact pipelines. */
  def embedDouble(text: String): Array[Double] = {
    val v = new Array[Double](dim)
    if (text != null) {
      // lower through UTF8String (Spark lower()'s own path), NOT the
      // locale-sensitive String.toLowerCase — under a Turkish default
      // locale "I" would lowercase to dotless ı and break the bit-exact
      // parity with the q32 oracle's lower()
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val it = lowered.split("\\s+").iterator.filter(_.nonEmpty)
      while (it.hasNext) {
        val h = hash32(it.next())
        val idx = (h % dim).toInt
        val sign = if (((h >> 16) & 1L) == 0L) 1.0 else -1.0
        val mag = 1.0 + ((h >> 17) & 7L).toDouble / 8.0
        v(idx) += sign * mag
      }
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += v(i) * v(i); i += 1 }
    if (ss > 0) {
      val n = math.sqrt(ss)
      i = 0
      while (i < dim) { v(i) = v(i) / n; i += 1 }
    }
    v
  }

  /** First 4 md5 bytes of the UTF-8 form, big-endian, as an unsigned
    * 32-bit value — identical to `('0x' || substr(md5(t),1,8))::BIGINT`
    * in DuckDB and `conv(substr(md5(t),1,8),16,10)` in Spark SQL.
    * Reuses one MessageDigest per thread (the MinHashSignature /
    * Fingerprints convention) — getInstance per token would pay a JCA
    * provider lookup on the hottest loop of the embed path.
    */
  private def hash32(t: String): Long = {
    val md = Md5TokenEmbedder.digestLocal.get()
    md.reset()
    val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

object Md5TokenEmbedder {
  private[embed] val digestLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object Embedder {
  val Default: Embedder = new DeterministicEmbedder()

  /** Column form for DataFrame pipelines. The embedder instance is captured
    * in the UDF closure and shipped once per task (tiny — it is stateless).
    */
  def embedUdf(e: Embedder = Default): UserDefinedFunction =
    udf((s: String) => e.embed(s))

  def embedColumn(c: Column, e: Embedder = Default): Column = embedUdf(e)(c)

  /** Double-precision column form of [[Md5TokenEmbedder]] for
    * oracle-exact pipelines (no float quantization between embed and
    * cosine).
    */
  def embedDoubleColumn(c: Column, e: Md5TokenEmbedder): Column = {
    val f = udf((s: String) => e.embedDouble(s))
    f(c)
  }
}
