package graft

import org.apache.spark.sql.functions._

/** Enforces data assumptions the cross-engine oracles rely on, so they are
  * asserted rather than implicit:
  *
  * the q70/q71 byte-level oracles equate `ascii(char)` with the payload byte
  * and `length(text)` with the byte count, and q44 compares JVM substring
  * against DuckDB code-point substr — all valid only while fixture text is
  * pure ASCII (1 byte == 1 char == 1 code point). If a future fixture ships
  * multi-byte UTF-8, this fails loudly here instead of as an opaque oracle
  * hash mismatch.
  */
class FixtureInvariantSpec extends SparkSpec {

  private val asciiOnly = "^[\\x00-\\x7F]*$"

  test("documents.text is pure ASCII at sf0.001 and sf0.01") {
    Seq(sf0001, sf001).foreach { d =>
      val offenders = Tables.documents(spark, d)
        .filter(not(col("text").rlike(asciiOnly)))
      assert(offenders.isEmpty,
        s"non-ASCII text in $d documents — byte-level oracles (q44/q70/q71) " +
          s"assume 1 byte/char: ${offenders.select("doc_id").head(5).mkString(",")}")
    }
  }

  test("documents.text has no embedded newlines (line-sink assumption, q92)") {
    Seq(sf0001, sf001).foreach { d =>
      val bad = Tables.documents(spark, d)
        .filter(col("text").contains("\n") || col("text").contains("\r"))
      assert(bad.isEmpty, s"newline inside document text in $d — " +
        "a newline-delimited text sink would split the row")
    }
  }

  test("every document has at least one token (ratio-denominator assumption)") {
    // q40/q42/q45/q47 divide by token counts; a zero-token doc would yield
    // NaN on the Spark side vs engine-specific null/NaN in DuckDB. Enforce
    // the assumption instead of relying on it (fixtures currently bottom
    // out at 10 tokens/doc).
    Seq(sf0001, sf001).foreach { d =>
      val empty = Tables.documents(spark, d)
        .filter(size(expr("filter(split(text, ' '), t -> t != '')")) === 0)
      assert(empty.isEmpty, s"zero-token document in $d")
    }
  }

  test("documents.text has no doc where byte length != char length") {
    Seq(sf0001, sf001).foreach { d =>
      val bad = Tables.documents(spark, d)
        .filter(length(col("text")) =!= length(col("text").cast("binary")))
      assert(bad.isEmpty, s"multi-byte text in $d")
    }
  }
}
