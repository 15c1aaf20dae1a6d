package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextAnalysis

/** Native language-ID over a token array: one pass scoring every token
  * against all stopword lists at once (hash-set membership), then the
  * same priority tie-break as the expression form
  * ([[TextAnalysis.langIdFromTokens]]) — first list in declaration order
  * reaching the max wins; zero hits everywhere → "unknown".
  *
  * The expression-tree phrasing walks the token array once per language
  * (5 interpreted `filter` lambdas per row); this is a single loop with
  * O(1) per-token membership tests, inlined into whole-stage codegen via
  * a static kernel. Value-identical by construction (same lists, same
  * counts, same tie order) — asserted by spec and the q16 DuckDB oracle.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${other.catalogString}")
  }

  // a null token array classifies as "unknown", matching the expression
  // form (its when-chain falls through null comparisons to the otherwise
  // branch) — so this expression never returns null
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    LangId.classifyNullable(
      if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        UTF8String ${ev.value} = graft.functions.LangId.classifyNullable(
          ${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangId {

  def apply(tokens: Column): Column =
    ColumnShim.column(LangId(ColumnShim.expression(tokens)))

  private val langs: Array[UTF8String] =
    TextAnalysis.StopwordLists.map(l => UTF8String.fromString(l._1)).toArray

  /** token → bitmask of the lists containing it (a token can be a
    * stopword in several languages, e.g. "la"/"de").
    */
  private val membership: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    TextAnalysis.StopwordLists.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.getOrDefault(k, 0)
        m.put(k, prev | (1 << i))
      }
    }
    m
  }

  private val unknown = UTF8String.fromString("unknown")

  /** Null-tolerant entry used by eval and generated code. */
  def classifyNullable(tokens: ArrayData): UTF8String =
    if (tokens == null) unknown else classify(tokens)

  def classify(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val scores = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val mask = membership.get(tokens.getUTF8String(i))
        if (mask != null) {
          val m = mask.intValue
          var j = 0
          while (j < langs.length) {
            if ((m & (1 << j)) != 0) scores(j) += 1
            j += 1
          }
        }
      }
      i += 1
    }
    var max = 0
    var j = 0
    while (j < langs.length) { if (scores(j) > max) max = scores(j); j += 1 }
    if (max == 0) return unknown
    j = 0
    while (j < langs.length) { // first list hitting the max wins (priority)
      if (scores(j) == max) return langs(j)
      j += 1
    }
    unknown // unreachable
  }
}
