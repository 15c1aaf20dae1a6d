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
