package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Value-equivalence witness for the r19 [[Md5PrefixLong]] kernel:
  * md5Int32/md5Int60 must emit exactly the documented
  * conv(substring(md5(...), 1, k), 16, 10) values — every oracle-
  * replayable hash in the engine derives from them.
  */
class Md5PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("kernel md5Int32/md5Int60 == conv phrasing on real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      HashFunctions.md5Int32(col("text")).as("k32"),
      HashFunctions.md5Int32Expr(col("text")).as("c32"),
      HashFunctions.md5Int60(col("text")).as("k60"),
      HashFunctions.md5Int60Expr(col("text")).as("c60"))
    assert(both.filter(col("k32") =!= col("c32") ||
      col("k60") =!= col("c60")).count() == 0)
    assert(both.count() > 0)
  }

  test("kernel == conv phrasing on boundary values") {
    val df = Seq("", " ", "a", "Ünïcødé — tøkens", "0", "\n\t",
      "x" * 10000).toDF("s")
    val both = df.select(
      HashFunctions.md5Int32(col("s")).as("k32"),
      HashFunctions.md5Int32Expr(col("s")).as("c32"),
      HashFunctions.md5Int60(col("s")).as("k60"),
      HashFunctions.md5Int60Expr(col("s")).as("c60"))
    assert(both.filter(col("k32") =!= col("c32") ||
      col("k60") =!= col("c60")).count() == 0)
    // non-negative by construction (8/15 hex chars < 2^63)
    assert(both.filter(col("k32") < 0 || col("k60") < 0).count() == 0)
  }
}
