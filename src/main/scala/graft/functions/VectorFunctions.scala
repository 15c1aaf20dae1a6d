package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` columns, expressed with Spark's built-in
  * higher-order functions so Catalyst sees plain expressions (prunable,
  * push-down friendly) rather than opaque UDFs.
  *
  * Semantics follow the reference engine's cosine similarity
  * (`/root/reference/mock_vector_db_api.py:37-52`): all math in Double,
  * and a zero-norm vector yields similarity 0 (not NaN / -1).
  *
  * Evaluation-order note: `dot` is a sequential left fold
  * (`aggregate(zip_with(...))`), which is bit-identical to DuckDB's
  * `list_dot_product` over `DOUBLE[]` — verified empirically — so
  * oracle comparisons can be exact at full double precision.
  */
object VectorFunctions {

  /** Cast array<float|double> → array<double> elementwise. */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an array<double> column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity with the reference's zero-norm guard:
    * dot(a,b) / (||a|| * ||b||), or 0.0 if either norm is zero.
    * Inputs must already be array<double> (use [[asDouble]]).
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === lit(0.0) || nb === lit(0.0), lit(0.0))
      .otherwise(dotProduct(a, b) / (na * nb))
  }

  /** Squared L2 distance between two array<double> columns. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Elementwise mean of an array column group is expressed at call sites
    * via posexplode + groupBy(pos) + avg; see Ann.centroids.
    */

  /** Max-abs component of a vector — the int8 quantization scale. */
  def maxAbs(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 quantization: q_i = floor(127·v_i/scale + 0.5)
    * (deterministic floor-of-shifted, not banker's/HALF_UP rounding, so
    * every engine — and the DuckDB oracle — reproduces the same codes
    * bit-for-bit). scale = maxAbs(v); all-zero vectors quantize to zeros.
    * 4× storage reduction for a 100 TB embedding column; reconstruction
    * error ≤ scale/254 per component (verified in VectorFunctionsSpec).
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(lit(127.0) * x.cast("double") / scale + lit(0.5))
          .cast("int")))

  /** Inverse of [[quantizeInt8]]: v_i ≈ q_i·scale/127. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / lit(127.0))
}
