package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Contract for the native CharNgrams expression: byte-for-byte equal to the
  * interpreted HOF formulation it replaced (`transform(sequence(...),
  * i -> substring(text, i, 3))` + length filter), including code-point
  * (not byte) gram boundaries on multi-byte input.
  */
class NgramExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val hofTrigrams =
    "filter(transform(sequence(1, greatest(length(t) - 2, 1)), i -> substring(t, i, 3)), g -> length(g) = 3)"

  test("native == HOF trigrams on every fixture document") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf0001).select(col("text").as("t"))
    val mismatches = docs
      .select(expr("graft_ngrams(t, 3)").as("a"), expr(hofTrigrams).as("b"))
      .filter(col("a") =!= col("b"))
    assert(mismatches.isEmpty)
  }

  private val hofShingles =
    """CASE WHEN size(filter(split(t, ' '), x -> x != '')) < 3 THEN array()
       ELSE array_distinct(transform(
         sequence(1, size(filter(split(t, ' '), x -> x != '')) - 2),
         i -> concat(element_at(filter(split(t, ' '), x -> x != ''), i), '_',
                     element_at(filter(split(t, ' '), x -> x != ''), i + 1), '_',
                     element_at(filter(split(t, ' '), x -> x != ''), i + 2)))) END"""

  test("native token shingles == HOF shingles on every fixture document") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf0001).select(col("text").as("t"))
    val mismatches = docs
      .select(expr("graft_token_shingles(t, 3)").as("a"), expr(hofShingles).as("b"))
      .filter(col("a") =!= col("b"))
    assert(mismatches.isEmpty)
  }

  test("token shingles: multiple spaces, leading/trailing, <3 tokens") {
    GraftFunctions.register(spark)
    val rows = Seq("  a  b c  d ", "a b", "", "x y z")
      .toDF("t")
      .select(expr("graft_token_shingles(t, 3)").as("a"), expr(hofShingles).as("b"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    assert(rows(0).getSeq[String](0) == Seq("a_b_c", "b_c_d"))
    assert(rows(1).getSeq[String](0).isEmpty && rows(2).getSeq[String](0).isEmpty)
  }

  test("code-point grams on multi-byte text; short inputs yield empty") {
    GraftFunctions.register(spark)
    val rows = Seq("héllo wörld", "ab", "", "日本語のテキスト")
      .toDF("t")
      .select(col("t"), expr("graft_ngrams(t, 3)").as("a"), expr(hofTrigrams).as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for '${r.getString(0)}': ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
    assert(rows(1).getSeq[String](1).isEmpty && rows(2).getSeq[String](1).isEmpty)
  }
}
