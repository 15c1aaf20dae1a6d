package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ChunkText, CosineSimilarity, SimHash}
import graft.text.Chunker

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * functions for the SQL surface, so `SELECT cosine_sim(a, b)` and
  * `SELECT simhash32(hs)` work in `spark.sql(...)` as well as through
  * the Column API.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("chunk_text"),
      new ExpressionInfo(classOf[ChunkText].getName, "chunk_text"),
      (exprs: Seq[Expression]) => {
        def lit(i: Int, dflt: Int): Int =
          if (exprs.length > i) exprs(i).eval().asInstanceOf[Number].intValue
          else dflt
        ChunkText(exprs.head,
          lit(1, Chunker.DefaultChunkSize), lit(2, Chunker.DefaultOverlap))
      }))
  }
}
