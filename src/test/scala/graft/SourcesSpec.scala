package graft

import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Lossless round-trips through every standard format (SURVEY §2.2 scans/
  * sinks): csv and json (schema-forced read), orc and parquet (self-
  * describing, incl. nested arrays), text (reference line-file parity). */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("csv round-trip preserves customer exactly") {
    val orig = Tables.customer(spark, sf0001)
    val back = Sources.roundTrip(spark, orig, "csv", s"$tmp/customer_csv")
    assert(sortedRows(back).sameElements(sortedRows(orig)))
  }

  test("json round-trip preserves orders (incl. timestamps)") {
    val orig = Tables.orders(spark, sf0001)
    val back = Sources.roundTrip(spark, orig, "json", s"$tmp/orders_json")
    assert(sortedRows(back).sameElements(sortedRows(orig)))
  }

  test("orc round-trip preserves embeddings (incl. float arrays)") {
    val orig = Tables.embeddings(spark, sf0001)
    val back = Sources.roundTrip(spark, orig, "orc", s"$tmp/embeddings_orc")
    assert(sortedRows(back).sameElements(sortedRows(orig)))
  }

  test("parquet round-trip preserves documents") {
    val orig = Tables.documents(spark, sf0001)
    val back = Sources.roundTrip(spark, orig, "parquet", s"$tmp/documents_pq")
    assert(sortedRows(back).sameElements(sortedRows(orig)))
  }

  test("text sink/source parity (reference line-file model)") {
    val orig = Tables.documents(spark, sf0001).select("text")
    val back = Sources.textRoundTrip(spark, orig, s"$tmp/docs_text")
    assert(back.count() == orig.count())
    assert(sortedRows(back).sameElements(sortedRows(orig.toDF("value"))))
  }
}
