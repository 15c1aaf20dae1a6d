package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 text ranking — the lexical companion to the reference's vector
  * top-k (`/root/reference/mock_vector_db_api.py:275-282` is the dense
  * half; a production retrieval engine pairs it with a sparse scorer and
  * fuses the two, see [[graft.search.Hybrid]]).
  *
  * Scoring follows Robertson–Spärck Jones BM25 with one deliberate
  * substitution: the idf is the *rational* odds form
  * `(N − df + 0.5) / (df + 0.5)` rather than its logarithm. The log is a
  * monotone map, so per-term rankings are unchanged, and staying inside
  * +,−,×,÷ keeps every score a deterministic IEEE-754 expression both
  * Spark and the DuckDB oracle evaluate bit-identically (no libm).
  *
  * Caveat for callers comparing against external BM25 implementations:
  * for MULTI-term queries the cross-term weighting differs from the
  * standard log-idf form — without the log's compression, rare terms
  * contribute far more relative weight — so multi-term document rankings
  * can deviate from e.g. Lucene's ordering even though each individual
  * term's ranking is identical.
  *
  * Scale notes:
  *  - document length `dl` is a per-row expression over the token array —
  *    no corpus-wide shuffle just to count tokens;
  *  - the explode is filtered to the query terms *before* any aggregation,
  *    so the (doc, term) shuffle carries only matching postings, not the
  *    corpus's full token stream;
  *  - document frequency is an aggregate over those postings (≤ |terms|
  *    rows) and is broadcast back — the corpus is shuffled once, on doc id;
  *  - the final top-k is ORDER BY + LIMIT → TakeOrderedAndProject
  *    (per-partition partial top-k, k-row driver merge).
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Non-empty whitespace tokens of `text`, the corpus-wide tokenizer
    * convention (TextAnalysis.tokens keeps empty strings; BM25's dl
    * must not count them).
    */
  private def cleanTokens(text: Column): Column =
    filter(TextAnalysis.tokens(text), t => t =!= "")

  /** Per-document BM25 scores for `terms` over `docs(idCol, textCol)`.
    * Returns (idCol, score) for every document matching ≥ 1 term; callers
    * apply their own ordering/limit. Scores are raw doubles — round on
    * output for oracle comparison, and rank on the rounded value (the
    * per-term sum is a floating-point aggregate whose grouping order is
    * not deterministic; rounding to 6 decimals absorbs the ±1 ulp wobble).
    */
  def score(docs: DataFrame,
            terms: Seq[String],
            idCol: String = "doc_id",
            textCol: String = "text",
            k1: Double = DefaultK1,
            b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // r19 second pass (guide §2.3/§5): ONE tokenize pass. The old shape
    // tokenized the corpus twice — once for the (N, avgdl) scalars, once
    // for the postings — because `base` carried the full token array and
    // was consumed by two separate jobs. Now the single corpus pass
    // projects (id, dl, matched-terms-only array) and checkpoints that
    // NARROW frame (the array holds only query-term occurrences); both
    // the scalar aggregate and the postings explode read the checkpoint.
    val base = docs.select(
      col(idCol),
      size(cleanTokens(col(textCol))).cast("long").as("dl"),
      filter(TextAnalysis.tokens(col(textCol)),
        t => terms.map(t === lit(_)).reduce(_ || _)).as("__m"))
      .localCheckpoint(eager = true)

    // Two corpus scalars (N, total token count) in one tiny job; avgdl as
    // exact-integer-sum ÷ count is the same double in any engine.
    val g = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).head()
    val n = g.getLong(0)
    require(n > 0, "BM25 over an empty corpus")
    val avgdl = g.getLong(1).toDouble / n

    // tf feeds BOTH the score join and the df aggregate; deriving both
    // from the checkpointed base keeps each a cheap postings-sized pass
    // (r19 round 1: filter INSIDE the token array before exploding — a
    // row per matching posting instead of a row per corpus token)
    val tf = base
      .select(col(idCol), col("dl"), explode(col("__m")).as("token"))
      .groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))

    val dfreq = tf.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).cast("double").as("df"))

    tf.join(broadcast(dfreq), "token")
      .withColumn("contrib",
        ((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("score"))
  }

  /** Top-k BM25: rank on the 6-decimal-rounded score (deterministic),
    * tie-break ascending id. Output (idCol, score) with score rounded.
    */
  def topK(docs: DataFrame,
           terms: Seq[String],
           k: Int,
           idCol: String = "doc_id",
           textCol: String = "text",
           k1: Double = DefaultK1,
           b: Double = DefaultB): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    score(docs, terms, idCol, textCol, k1, b)
      .select(col(idCol), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
