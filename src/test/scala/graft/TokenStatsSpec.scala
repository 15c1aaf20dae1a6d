package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Value-equivalence witness for the r19 [[graft.functions.TokenStats]]
  * kernel: every field must equal the composed size / array_distinct /
  * filter(isin) / explode-histogram phrasings it replaces, because the
  * q87/q103/q155/q172/q207 oracles replay THOSE phrasings in DuckDB.
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private val stop = TextAnalysis.StopwordLists.head._2

  private val boundary = Seq(
    "", " ", "   ", "the", "THE The the",
    "a b c a b c", "x\ty\nz  w", "one",
    "the of and to in is it a",              // all stopwords
    "Ünïcødé TØKENS höre ünïcødé tøkens",
    "trailing space ", " leading", "\t\n",
    "word").toDF("text")

  private def checkAgainstComposed(df: org.apache.spark.sql.DataFrame): Unit = {
    val w = TextAnalysis.tokens(col("text"))
    val both = df.select(
      TextAnalysis.tokenStats(col("text")).as("st"),
      size(w).cast("long").as("c_n_tok"),
      size(array_distinct(w)).cast("long").as("c_n_uniq"),
      TextAnalysis.stopwordHitsIn(w, stop).cast("long").as("c_stop"))
    val bad = both.filter(
      col("st.n_tok") =!= col("c_n_tok") ||
      col("st.n_uniq") =!= col("c_n_uniq") ||
      col("st.stop_hits") =!= col("c_stop"))
    assert(bad.count() == 0)
    assert(both.count() > 0)
  }

  test("n_tok / n_uniq / stop_hits == composed on real docs") {
    checkAgainstComposed(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
  }

  test("n_tok / n_uniq / stop_hits == composed on boundary shapes") {
    checkAgainstComposed(boundary)
  }

  test("ne_v / ne_n / ne_mx == the explode histogram on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val composed = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("v"), sum(col("c")).as("n"), max(col("c")).as("mx"))
    val kernel = docs
      .select(col("doc_id"), TextAnalysis.tokenStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.ne_v").as("v"), col("st.ne_n").as("n"),
        col("st.ne_mx").as("mx"))
      .filter(col("n") > 0)
    assert(composed.count() > 0)
    assert(kernel.count() == composed.count())
    assert(kernel.join(composed, Seq("doc_id", "v", "n", "mx")).count()
      == composed.count())
  }

  test("qualityScoreFromStats == qualityScoreFromTokens bit-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .unionByName(boundary.select(monotonically_increasing_id().as("doc_id"),
        col("text"), lit("x").as("source"), lit("en").as("lang"),
        length(col("text")).cast("long").as("n_chars")), allowMissingColumns = true)
    val w = TextAnalysis.tokens(col("text"))
    val both = docs.select(
      TextAnalysis.qualityScoreFromTokens(col("text"), w).as("c"),
      TextAnalysis.qualityScoreFromStats(col("text"),
        TextAnalysis.tokenStats(col("text"))).as("k"))
    // null-safe comparison: both must be null together or equal exactly
    val bad = both.filter(!(col("c") <=> col("k")))
    assert(bad.count() == 0)
    assert(both.count() > 0)
  }

  test("null text yields null struct and null score (composed semantics)") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val r = df.select(
      TextAnalysis.tokenStats(col("text")).as("st"),
      TextAnalysis.qualityScoreFromStats(col("text"),
        TextAnalysis.tokenStats(col("text"))).as("k"),
      TextAnalysis.qualityScore(col("text")).as("c")).collect()
    val nullRow = r.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2))
    val okRow = r.find(!_.isNullAt(0)).get
    assert(okRow.getAs[Double]("k") == okRow.getAs[Double]("c"))
  }
}
