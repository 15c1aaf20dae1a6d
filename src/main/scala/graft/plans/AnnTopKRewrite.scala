package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{CosineSimilarity, SignBucket}

/** OPT-IN plan rewrite: route a brute-force exact cosine top-k —
  *
  *   Limit(k, Sort(cosine_sim(vec, literal_query) DESC, ...,
  *     Project(..., corpus)))
  *
  * — to a sign-LSH bucket probe by inserting
  * `Filter(sign_bucket(vec) = sign_bucket(query))` beneath the sort, so
  * the scan scores only the query's own hyperplane bucket (~corpus/2^bits
  * rows) instead of every row. This is [[graft.search.Ann.ivfTopK]]'s
  * nprobe=1 semantics applied transparently to plans the user wrote as
  * exact scans.
  *
  * The rewrite CHANGES RESULT SEMANTICS (approximate recall: a true
  * neighbor straddling a hyperplane is missed), which is why it is
  * disabled unless `spark.graft.ann.topkRewrite=true` — silently trading
  * exactness for speed inside the optimizer is the wrong default for an
  * engine whose correctness gate is hash-exact oracle comparison (see
  * the package doc). Registered through [[graft.GraftExtensions]]
  * (injectOptimizerRule) or `spark.experimental.extraOptimizations`.
  *
  * Matching is deliberately narrow: topmost sort key must be a
  * DESCENDING cosine of (vector attribute, foldable query vector),
  * either directly or through one Project alias; the rule is idempotent
  * (an already-bucketed child never re-matches).
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.ann.topkRewrite"
  val BitsKey = "spark.graft.ann.topkRewrite.bits"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  private def bits: Int = {
    val raw = SQLConf.get.getConfString(BitsKey, "8")
    // validate HERE: optimizer-inserted expressions never run
    // checkInputDataTypes, so a bad conf would otherwise surface as a
    // wrapped shift (bits > 63) or a NumberFormatException mid-plan
    val b = try raw.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$BitsKey must be an integer in [1, 63], got '$raw'")
    }
    require(b >= 1 && b <= 63, s"$BitsKey must be in [1, 63], got $b")
    b
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s: Sort)) if s.global =>
        rewriteSort(s)
          .map(ns => gl.copy(child = ll.copy(child = ns)))
          .getOrElse(gl)
    }

  private def rewriteSort(s: Sort): Option[Sort] = s.order.headOption
    .filter(_.direction == Descending)
    .flatMap { head =>
      (head.child, s.child) match {
        // Sort directly over the cosine expression
        case (c: CosineSimilarity, child) if !alreadyProbed(child) =>
          probeFilter(c).map(f => s.copy(child = Filter(f, child)))
        // Sort on an attribute aliased to the cosine inside one Project
        case (a: AttributeReference, p: Project) if !alreadyProbed(p.child) =>
          p.projectList.collectFirst {
            case al @ Alias(c: CosineSimilarity, _) if al.exprId == a.exprId => c
          }.flatMap(c => probeFilter(c).map(f =>
            s.copy(child = p.copy(child = Filter(f, p.child)))))
        case _ => None
      }
    }

  /** Idempotency under fixed-point optimizer runs: never re-probe a
    * subtree that ALREADY contains a sign-bucket filter ANYWHERE below.
    * The deep search matters because this rule runs interleaved with
    * PushDownPredicates (when injected via GraftExtensions): the probe
    * filter inserted in iteration N gets pushed toward the scan, so an
    * immediate-child check would see the original shape again in
    * iteration N+1 and insert a duplicate probe every round until
    * maxIterations. Conservative by design: a user-authored SignBucket
    * predicate below the sort also suppresses the rewrite.
    */
  private def alreadyProbed(plan: LogicalPlan): Boolean =
    plan.exists {
      case Filter(cond, _) =>
        cond.exists { case _: SignBucket => true; case _ => false }
      case _ => false
    }

  /** The bucket predicate, when the cosine is (vector attr, foldable
    * query) and the child is not already bucket-filtered on that attr.
    */
  private def probeFilter(c: CosineSimilarity): Option[Expression] =
    (c.left, c.right) match {
      case (vec: AttributeReference, q) if q.foldable =>
        evalVector(q).map { arr =>
          EqualTo(SignBucket(vec, bits),
            Literal(SignBucket.bucketOf(arr, bits)))
        }
      case _ => None
    }

  private def evalVector(q: Expression): Option[Array[Double]] =
    q.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        Option(q.eval()).map { raw =>
          val arr = raw.asInstanceOf[ArrayData]
          val isFloat = q.dataType == ArrayType(FloatType, containsNull = false) ||
            q.dataType.asInstanceOf[ArrayType].elementType == FloatType
          Array.tabulate(arr.numElements()) { i =>
            if (arr.isNullAt(i)) 0.0
            else if (isFloat) arr.getFloat(i).toDouble
            else arr.getDouble(i)
          }
        }
      case _ => None
    }
}
