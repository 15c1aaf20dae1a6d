package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter membership probe against a DRIVER-RESIDENT word
  * array (the built filter is a few hundred bytes — it ships to executors
  * inside the serialized expression, exactly like Spark's own
  * `BloomFilterMightContain` runtime filter).
  *
  * Value-identical to the Column phrasing in [[graft.ops.Bloom]]
  * (md5 of `"bf_" + key`, first 15 hex chars as a 60-bit int,
  * Kirsch–Mitzenmacher `p_i = (h mod 2^30 + i·(2·(h >> 30)+1)) mod nbits`)
  * — but ONE md5 per row with a reused digest. The Column form computes
  * the hash through helper projections that the optimizer inlines into
  * each filter conjunct, and `FilterExec` predicates get no
  * common-subexpression elimination, so the md5 ran up to 4× per probe
  * there (~6 s over sf0.1 lineitem vs < 1 s here).
  */
case class BloomMightContain(child: Expression, words: Array[Long], probes: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string key column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomMightContain.check(input.asInstanceOf[UTF8String], words, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomMightContain.check($a, $wordsRef, $probes);")
  }

  // Case-class equality on an Array parameter is reference-based, which
  // would make two semantically identical probes never compare equal and
  // silently defeat canonicalization-based dedup (common filter
  // elimination, semanticEquals). Compare the filter by value.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && probes == b.probes &&
        java.util.Arrays.equals(words, b.words)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(probes),
      Integer.valueOf(java.util.Arrays.hashCode(words)))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  def apply(key: Column, words: Array[Long], probes: Int): Column =
    ColumnShim.column(
      BloomMightContain(ColumnShim.expression(key), words, probes))

  private val Prefix = "bf_".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `conv(substr(md5('bf_' || key), 1, 15), 16, 10)` without the hex
    * round-trip: the first 15 hex chars of the digest are the top 15
    * nibbles of its first 8 bytes.
    */
  def check(key: UTF8String, words: Array[Long], probes: Int): Boolean = {
    val md = digestLocal.get()
    md.reset()
    md.update(Prefix)
    val d = md.digest(key.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    val h = v >>> 4
    val h1 = h % 1073741824L
    val h2 = (h >>> 30) * 2L + 1L
    val nbits = words.length.toLong * Bits.BitsPerWord
    var p = 0
    while (p < probes) {
      val pos = ((h1 + p.toLong * h2) % nbits).toInt
      if (((words(pos >>> 5) >>> (pos & 31)) & 1L) == 0L) return false
      p += 1
    }
    true
  }

  private object Bits { val BitsPerWord = 32 }
}
