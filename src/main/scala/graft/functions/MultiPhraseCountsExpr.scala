package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-phrase occurrence counter: for a fixed phrase list,
  * counts non-overlapping literal occurrences of EVERY phrase in one
  * call over the string — the single-pass replacement for the
  * length-delta-of-replace chain ([[graft.text.CorpusOps.phraseHits]]),
  * which allocates a full replaced copy of the text per phrase per row.
  * Counting semantics are identical to that chain (left-to-right,
  * advance past each match), spec-asserted equal.
  *
  * Returns `array<long>` aligned with the phrase list. The phrase array
  * ships with the plan as a reference object — fine for the blocklist
  * use case (tens to thousands of phrases); a lexicon-scale matcher
  * would want an Aho–Corasick automaton instead, same seam.
  */
case class MultiPhraseCounts(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "MultiPhraseCounts: phrase list must be non-empty, phrases non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "multi_phrase_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.catalogString}")
  }

  @transient private lazy val phraseArr: Array[String] = phrases.toArray

  override def nullSafeEval(input: Any): Any =
    MultiPhraseCounts.counts(input.asInstanceOf[UTF8String], phraseArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phrases", phraseArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MultiPhraseCounts.counts($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiPhraseCounts {

  def apply(c: Column, phrases: Seq[String]): Column =
    ColumnShim.column(MultiPhraseCounts(ColumnShim.expression(c), phrases))

  /** One string materialization, then an indexOf loop per phrase —
    * no copies, no regex. Non-overlapping count (advance past the
    * match), the exact semantic of counting via
    * (len(s) − len(replace(s, p, ''))) / len(p).
    */
  def counts(s: UTF8String, phrases: Array[String]): GenericArrayData = {
    val str = s.toString
    val out = new Array[Long](phrases.length)
    var k = 0
    while (k < phrases.length) {
      val p = phrases(k)
      var c = 0L
      var i = str.indexOf(p)
      while (i >= 0) {
        c += 1
        i = str.indexOf(p, i + p.length)
      }
      out(k) = c
      k += 1
    }
    new GenericArrayData(out)
  }
}
