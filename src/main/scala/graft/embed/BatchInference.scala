package graft.embed

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Batched model inference over partitions — the canonical Spark pattern
  * for the reference's embedding stage (`repo_to_vector.py:308-374`,
  * which re-uses one loaded SentenceTransformer across all chunks).
  *
  * The UDF form ([[Embedder.embedColumn]]) calls the model row-at-a-time;
  * that is fine for the stateless hash projection but wrong for a real
  * model, where (a) loading weights per row/task is prohibitive and
  * (b) the accelerator wants batches. This runs `mapPartitions` with:
  *   - ONE handle initialization per partition (the model-load seam —
  *     here a counter-instrumented wrapper around the pluggable
  *     [[Embedder]]; a production impl holds the real model/session);
  *   - micro-batched encode calls (`batchSize` rows at a time — the
  *     shape a vectorized/Arrow UDF would see);
  *   - streaming iterators end-to-end: no partition-sized
  *     materialization beyond the current batch.
  */
object BatchInference {

  /** Partition-level handle: loaded once, encodes in batches. */
  trait ModelHandle {
    def encodeBatch(texts: Array[String]): Array[Array[Float]]
  }

  /** Handle factory seam; must be serializable (shipped to executors). */
  trait ModelLoader extends Serializable {
    def load(): ModelHandle
  }

  /** Test/offline loader wrapping the deterministic embedder; counts
    * loads so specs can assert once-per-partition initialization.
    */
  final class EmbedderLoader(embedder: Embedder = Embedder.Default)
      extends ModelLoader {
    def load(): ModelHandle = {
      EmbedderLoader.loads.incrementAndGet()
      new ModelHandle {
        def encodeBatch(texts: Array[String]): Array[Array[Float]] =
          texts.map(embedder.embed)
      }
    }
  }
  object EmbedderLoader {
    /** Per-JVM load counter (executors share the JVM in local mode). */
    val loads = new AtomicLong(0L)
  }

  /** Partition-level cross-encoder handle: scores (query, doc) PAIRS
    * jointly — the re-ranker model family (the bi-encoder above embeds
    * each side independently; a cross-encoder attends across the pair
    * and is far more accurate but cannot be indexed, which is why it
    * only ever sees a bounded candidate pool).
    */
  trait PairScorerHandle {
    def scoreBatch(queries: Array[String], docs: Array[String]): Array[Float]
  }

  /** Cross-encoder factory seam (serializable, shipped to executors). */
  trait PairScorerLoader extends Serializable {
    def load(): PairScorerHandle
  }

  /** Test/offline pair scorer: cosine of the deterministic embeddings
    * of the two sides — stands in for a real cross-encoder the way
    * [[EmbedderLoader]] stands in for a real bi-encoder; counts loads
    * for the once-per-partition assertion.
    */
  final class CosinePairScorerLoader(embedder: Embedder = Embedder.Default)
      extends PairScorerLoader {
    def load(): PairScorerHandle = {
      CosinePairScorerLoader.loads.incrementAndGet()
      new PairScorerHandle {
        def scoreBatch(queries: Array[String], docs: Array[String]): Array[Float] =
          queries.zip(docs).map { case (q, d) =>
            val a = embedder.embed(q); val b = embedder.embed(d)
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) {
              dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
              nb += b(i).toDouble * b(i); i += 1
            }
            if (na == 0.0 || nb == 0.0) 0.0f
            else (dot / (math.sqrt(na) * math.sqrt(nb))).toFloat
          }
      }
    }
  }
  object CosinePairScorerLoader {
    val loads = new AtomicLong(0L)
  }

  /** Append a `ce_score` column by batched per-partition cross-encoder
    * scoring of (`queryCol`, `textCol`) pairs — stage 2 of the
    * retrieve→rerank stack. The input should be a CANDIDATE POOL (any
    * stage-1 retriever: Search.topK, Ann.matryoshkaTopK, Hamming), so
    * cost is O(pool × model), never O(corpus). Same once-per-partition
    * handle + micro-batch discipline as [[embedPartitions]]; a caller
    * finishes with an ordinary per-query top-k window.
    */
  def rerankPartitions(candidates: DataFrame, queryCol: String,
                       textCol: String, loader: PairScorerLoader,
                       batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    val inSchema = candidates.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("ce_score", FloatType, nullable = false))
    val enc = Encoders.row(outSchema)
    val qIdx = inSchema.fieldIndex(queryCol)
    val tIdx = inSchema.fieldIndex(textCol)
    candidates.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val model = loader.load() // once per partition
        rows.grouped(batchSize).flatMap { batch =>
          def str(r: Row, i: Int) = {
            val v = r.get(i); if (v == null) "" else v.toString
          }
          val qs = batch.map(str(_, qIdx)).toArray
          val ds = batch.map(str(_, tIdx)).toArray
          val scores = model.scoreBatch(qs, ds)
          batch.iterator.zip(scores.iterator).map { case (r, sc) =>
            Row.fromSeq(r.toSeq :+ sc)
          }
        }
      }
    }(enc)
  }

  /** Append an `embedding` column to `df` by batched per-partition
    * inference over `textCol`. Preserves all input columns.
    */
  def embedPartitions(df: DataFrame, textCol: String,
                      loader: ModelLoader,
                      batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(outSchema)
    val textIdx = inSchema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val model = loader.load() // once per partition
        rows.grouped(batchSize).flatMap { batch =>
          val texts = batch.map { r =>
            val t = r.get(textIdx)
            if (t == null) "" else t.toString
          }.toArray
          val vecs = model.encodeBatch(texts)
          batch.iterator.zip(vecs.iterator).map { case (r, v) =>
            Row.fromSeq(r.toSeq :+ (v.toSeq: Seq[Float]))
          }
        }
      }
    }(enc)
  }
}
