package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Deterministic training-shard assignment: shard(doc) = md5_32(id) mod
  * nShards. Content-addressed and row-local — a doc's shard never
  * depends on other rows, so assignments are stable under corpus
  * growth, reproducible across engines (the md5 recipe is the portable
  * one the DuckDB oracle replays), and computable map-side with no
  * shuffle. An md5-uniform hash concentrates shard token totals
  * tightly; [[shardBalance]] is the audit that proves it per corpus.
  *
  * At scale the assignment is the WRITE layout: `partitionBy("shard")`
  * (or bucketBy) on the training-mix export makes a dataloader's
  * "read shard k" a partition-pruned scan, and the number of output
  * files per shard is controlled by the usual
  * `spark.sql.files.maxRecordsPerFile` knob — no driver involvement.
  */
object Sharding {

  /** docs + `shard` column (md5_32(idCol) mod nShards, non-negative). */
  def withShard(docs: DataFrame, idCol: String = "doc_id",
                nShards: Int = 16): DataFrame = {
    require(nShards > 0, s"nShards must be > 0, got $nShards")
    docs.withColumn("shard",
      pmod(HashFunctions.md5Int32(col(idCol).cast("string")), lit(nShards.toLong)))
  }

  /** Deterministic per-epoch shuffle: rank documents within each shard
    * by md5("epoch:id") — dataloaders get a reproducible order that
    * VARIES per epoch with no RNG state to checkpoint or coordinate
    * (resume-from-step is "skip pos < n", identical on every worker and
    * every rerun). The sort key is row-local, the ranking window is
    * partitioned by shard (never global), and a different `epoch` value
    * re-permutes everything while the shard membership stays fixed.
    */
  def epochOrder(docs: DataFrame, epoch: Int, idCol: String = "doc_id",
                 nShards: Int = 16): DataFrame =
    withShard(docs, idCol, nShards)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(
            HashFunctions.md5Int60(
              concat_ws(":", lit(epoch), col(idCol).cast("string"))),
            col(idCol))))

  /** Per-shard balance audit: (shard, n_docs, total_tokens,
    * max_doc_tokens) — the skew check a training-export job runs before
    * handing shards to the dataloader fleet.
    */
  def shardBalance(docs: DataFrame, tokenCol: String,
                   idCol: String = "doc_id", nShards: Int = 16): DataFrame =
    withShard(docs, idCol, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("total_tokens"),
        max(col(tokenCol)).cast("long").as("max_doc_tokens"))
}
