package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashFunctions.{minhashA, minhashB, MinhashPrime}

/** Native MinHash signature over a token array: word n-gram shingling,
  * md5-prefix hashing, and the k affine minima fused into one JVM pass
  * per row.
  *
  * Produces EXACTLY the values of the expression-tree phrasing in
  * [[graft.dedup.Dedup]] (and its DuckDB oracle):
  *   shingle  = tokens[i..i+n-1] joined with ' ' (whole-token-array
  *              fallback when fewer than n tokens)
  *   h32      = first 8 hex chars of md5(shingle) as unsigned int
  *              (= first 4 digest bytes, big-endian)
  *   sig[j]   = min over shingles of (a_j·h32 + b_j) mod p
  * Shingle DISTINCTNESS is deliberately skipped: duplicate shingles
  * cannot change a minimum, so the signature is identical without the
  * dedup pass.
  *
  * Why native: the HOF phrasing interprets ~(shingles × k) lambda
  * evaluations per row (higher-order functions don't codegen) and
  * re-slices the token array per shingle. This runs one tight loop with
  * a reused MessageDigest and stays inside whole-stage codegen via a
  * static helper call — the per-row cost drops from ~1 ms to
  * microseconds, which is the difference between a day and minutes over
  * a 100 TB corpus.
  */
case class MinHashSignature(child: Expression, n: Int = 3,
                            numHashes: Int = MinHashSignature.DefaultNumHashes)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($a, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  val DefaultNumHashes: Int = 16

  /** Column-API entry point over a token-array column. */
  def apply(tokens: Column): Column =
    ColumnShim.column(MinHashSignature(ColumnShim.expression(tokens)))

  def apply(tokens: Column, n: Int, numHashes: Int): Column =
    ColumnShim.column(MinHashSignature(ColumnShim.expression(tokens), n, numHashes))

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One-pass shingle→hash→minima kernel; called from both interpreted
    * eval and generated code.
    */
  def compute(tokens: ArrayData, n: Int, k: Int): GenericArrayData = {
    val nTok = tokens.numElements()
    val md = digestLocal.get()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)

    val nShingles = if (nTok >= n) nTok - n + 1 else 1
    val width = if (nTok >= n) n else nTok
    val space = ' '.toByte
    var i = 0
    while (i < nShingles) {
      md.reset()
      var t = 0
      while (t < width) {
        if (t > 0) md.update(space)
        val tok = tokens.get(i + t, StringType).asInstanceOf[UTF8String]
        if (tok != null) md.update(tok.getBytes)
        t += 1
      }
      val d = md.digest()
      // first 8 hex chars of md5 = first 4 bytes, big-endian, unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < k) {
        val v = (minhashA(j) * h + minhashB(j)) % MinhashPrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
