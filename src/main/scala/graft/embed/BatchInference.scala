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
