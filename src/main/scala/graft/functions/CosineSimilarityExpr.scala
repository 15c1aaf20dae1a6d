package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst cosine-similarity expression with whole-stage codegen.
  *
  * Semantics match the reference engine's cosine
  * (`/root/reference/mock_vector_db_api.py:37-52`): all math in Double,
  * zero-norm input → 0.0 (not NaN), and a dimension mismatch is a hard
  * error (`mock_vector_db_api.py:270-272`). The accumulation order is the
  * same sequential left fold as [[VectorFunctions.cosineSimilarity]] and
  * DuckDB's `list_dot_product`, so results stay oracle-exact.
  *
  * Why this exists when the higher-order-function form already works: the
  * HOF pipeline (`aggregate(zip_with(...))`) materializes an intermediate
  * product array per row and walks the input three times (dot, ‖a‖, ‖b‖).
  * This expression runs one fused primitive loop per row over the
  * columnar `ArrayData` — no intermediate array, no boxing — and inlines
  * into the surrounding WholeStageCodegen stage, which is what you want
  * when the scan is 100 TB of 384-dim vectors.
  *
  * Array elements must be float or double and non-null (embedding vectors;
  * enforced upstream by the ingest schema).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  private def elemOk(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<float|double> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  // lazy vals: fixed per plan — a def would re-dispatch on dataType for
  // every row of the interpreted path
  private lazy val leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    }
    val lf = leftFloat
    val rf = rightFloat
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = $getX;
         |  final double $yv = $getY;
         |  $dot += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosineSim($"embedding", $"query_vec")`. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))
}
