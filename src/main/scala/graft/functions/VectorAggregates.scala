package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregates over embedding columns — the UDAF extension point
  * (SURVEY.md §2.7) for corpus-level vector statistics.
  *
  * Scale shape: an `Aggregator` gets map-side partial aggregation from
  * Catalyst automatically, so a per-label centroid over N rows shuffles
  * only (labels × dim) doubles — vs the posexplode phrasing, which is
  * value-identical but shuffles N × dim exploded rows. The posexplode
  * form doubles as the DuckDB-oracle documentation of the semantics.
  */
object VectorAggregates {

  /** Element-wise sum + count accumulator. */
  final case class VecBuf(var sum: Array[Double], var n: Long)

  /** Mean vector (centroid) of an array<double> column. Null/empty
    * input rows are ignored; mismatched dims throw (corpus assumed
    * homogeneous, reference parity §2.9.8).
    */
  object CentroidAgg extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: VecBuf, a: Seq[Double]): VecBuf = {
      if (a == null || a.isEmpty) return b
      if (b.n == 0L && b.sum.isEmpty) b.sum = new Array[Double](a.length)
      require(b.sum.length == a.length,
        s"centroid: dimension mismatch (${b.sum.length} vs ${a.length})")
      var i = 0
      while (i < a.length) { b.sum(i) += a(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(x: VecBuf, y: VecBuf): VecBuf = {
      if (y.n == 0L) return x
      if (x.n == 0L) return y
      require(x.sum.length == y.sum.length,
        s"centroid: dimension mismatch (${x.sum.length} vs ${y.sum.length})")
      var i = 0
      while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: VecBuf): Seq[Double] =
      if (b.n == 0L) Seq.empty
      else b.sum.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: `centroid($"embedding")` (input array<double>). */
  val centroid: Column => Column = {
    val f = udaf(CentroidAgg)
    (c: Column) => f(c)
  }

  /** Element-wise sum + sum-of-squares + count accumulator. */
  final case class MomentsBuf(var sum: Array[Double],
                              var sumsq: Array[Double], var n: Long)

  /** First two element-wise moments of the corpus embedding matrix. */
  final case class VecMoments(sum: Seq[Double], sumsq: Seq[Double], n: Long)

  /** Per-dimension Σx and Σx² in ONE typed aggregate — the sufficient
    * statistic for every per-dimension mean/variance read (q176's
    * dead-dimension audit). Same scale story as [[CentroidAgg]]: map-side
    * partials shuffle 2·dim doubles per partition instead of the N·dim
    * exploded rows the posexplode phrasing (the oracle's documentation of
    * the semantics) would move.
    */
  object MomentsAgg extends Aggregator[Seq[Double], MomentsBuf, VecMoments] {
    override def zero: MomentsBuf =
      MomentsBuf(Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

    override def reduce(b: MomentsBuf, a: Seq[Double]): MomentsBuf = {
      if (a == null || a.isEmpty) return b
      if (b.n == 0L && b.sum.isEmpty) {
        b.sum = new Array[Double](a.length)
        b.sumsq = new Array[Double](a.length)
      }
      require(b.sum.length == a.length,
        s"moments: dimension mismatch (${b.sum.length} vs ${a.length})")
      var i = 0
      while (i < a.length) {
        val x = a(i); b.sum(i) += x; b.sumsq(i) += x * x; i += 1
      }
      b.n += 1
      b
    }

    override def merge(x: MomentsBuf, y: MomentsBuf): MomentsBuf = {
      if (y.n == 0L) return x
      if (x.n == 0L) return y
      require(x.sum.length == y.sum.length,
        s"moments: dimension mismatch (${x.sum.length} vs ${y.sum.length})")
      var i = 0
      while (i < x.sum.length) {
        x.sum(i) += y.sum(i); x.sumsq(i) += y.sumsq(i); i += 1
      }
      x.n += y.n
      x
    }

    override def finish(b: MomentsBuf): VecMoments =
      VecMoments(b.sum.toSeq, b.sumsq.toSeq, b.n)

    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    override def outputEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
  }

  /** Column form: `moments($"embedding")` (input array<double>). */
  val moments: Column => Column = {
    val f = udaf(MomentsAgg)
    (c: Column) => f(c)
  }

  /** Element-wise running min/max accumulator. */
  final case class MinMaxBuf(var mn: Array[Double], var mx: Array[Double],
                             var n: Long)

  /** Per-dimension corpus min and max. */
  final case class VecMinMax(mn: Seq[Double], mx: Seq[Double], n: Long)

  /** Per-dimension min AND max in ONE typed aggregate — the training
    * statistic for scalar quantization ([[graft.search.Ann.sq8Train]]).
    * Same scale story as [[CentroidAgg]]/[[MomentsAgg]]: map-side
    * partials shuffle 2·dim doubles per partition, never exploded rows.
    */
  object MinMaxAgg extends Aggregator[Seq[Double], MinMaxBuf, VecMinMax] {
    override def zero: MinMaxBuf =
      MinMaxBuf(Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

    override def reduce(b: MinMaxBuf, a: Seq[Double]): MinMaxBuf = {
      if (a == null || a.isEmpty) return b
      if (b.n == 0L && b.mn.isEmpty) {
        b.mn = Array.fill(a.length)(Double.PositiveInfinity)
        b.mx = Array.fill(a.length)(Double.NegativeInfinity)
      }
      require(b.mn.length == a.length,
        s"minmax: dimension mismatch (${b.mn.length} vs ${a.length})")
      var i = 0
      while (i < a.length) {
        val x = a(i)
        if (x < b.mn(i)) b.mn(i) = x
        if (x > b.mx(i)) b.mx(i) = x
        i += 1
      }
      b.n += 1
      b
    }

    override def merge(x: MinMaxBuf, y: MinMaxBuf): MinMaxBuf = {
      if (y.n == 0L) return x
      if (x.n == 0L) return y
      require(x.mn.length == y.mn.length,
        s"minmax: dimension mismatch (${x.mn.length} vs ${y.mn.length})")
      var i = 0
      while (i < x.mn.length) {
        if (y.mn(i) < x.mn(i)) x.mn(i) = y.mn(i)
        if (y.mx(i) > x.mx(i)) x.mx(i) = y.mx(i)
        i += 1
      }
      x.n += y.n
      x
    }

    override def finish(b: MinMaxBuf): VecMinMax =
      VecMinMax(b.mn.toSeq, b.mx.toSeq, b.n)

    override def bufferEncoder: Encoder[MinMaxBuf] = Encoders.product[MinMaxBuf]
    override def outputEncoder: Encoder[VecMinMax] = Encoders.product[VecMinMax]
  }

  /** Column form: `minMax($"embedding")` (input array<double>). */
  val minMax: Column => Column = {
    val f = udaf(MinMaxAgg)
    (c: Column) => f(c)
  }
}
