package graft

import graft.operators.{Analytics, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame

/** Partition-invariance contracts: an operator whose algebra is exact
  * (integer counts, digests, min-structs — no float summation) must return
  * IDENTICAL results whatever the input partitioning, or it is not safe to
  * run on a cluster whose partitioning the caller doesn't control. Each op
  * runs on the fixture and on a 7-way round-robin repartition of it; the
  * collected row sets must match exactly. (Float-aggregating ops are
  * excluded by design — their 6-dp rounding absorbs but does not eliminate
  * summation-order ulps; their gates live in the DuckDB oracle runs.)
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def docs = Tables.documents(spark, sf0001)

  test("chunkDedup is partition-invariant") {
    val a = rows(TextAnalysis.chunkDedup(docs, "doc_id", "text"))
    val b = rows(TextAnalysis.chunkDedup(docs.repartition(7), "doc_id", "text"))
    assert(a == b)
  }

  test("removeBoilerplate is partition-invariant") {
    val a = rows(TextAnalysis.removeBoilerplate(docs, "doc_id", "text"))
    val b = rows(TextAnalysis.removeBoilerplate(docs.repartition(7), "doc_id", "text"))
    assert(a == b)
  }

  test("countMinEstimate is partition-invariant") {
    import org.apache.spark.sql.functions._
    def toks(df: DataFrame) = df.select(
      explode(expr("filter(split(text, ' '), t -> t != '')")).as("tok"))
    val probes = Seq("spark", "vector", "dup")
    val a = rows(Analytics.countMinEstimate(toks(docs), "tok", probes))
    val b = rows(Analytics.countMinEstimate(toks(docs.repartition(7)), "tok", probes))
    assert(a == b)
  }

  test("bloomProbe is partition-invariant") {
    import org.apache.spark.sql.functions._
    def toks(df: DataFrame) = df.select(
      explode(expr("filter(split(text, ' '), t -> t != '')")).as("tok"))
    val probes = Seq("spark", "vector", "dup", "quantum")
    val a = rows(Analytics.bloomProbe(toks(docs), "tok", probes))
    val b = rows(Analytics.bloomProbe(toks(docs.repartition(7)), "tok", probes))
    assert(a == b)
  }

  test("exact dedup keeper mapping is partition-invariant") {
    val a = rows(Dedup.exactDedup(docs, "doc_id", "text"))
    val b = rows(Dedup.exactDedup(docs.repartition(7), "doc_id", "text"))
    assert(a == b)
  }

  test("simHashDedup keeper mapping is partition-invariant") {
    val a = rows(Dedup.simHashDedup(docs, "doc_id", "text"))
    val b = rows(Dedup.simHashDedup(docs.repartition(7), "doc_id", "text"))
    assert(a == b)
  }

  // Round-10b exact operators. sortedNeighborhood's global rank is the
  // partition-sensitive machinery under test (range partition + two-pass
  // zipWithIndex over a TOTAL order — a partial order would let the rank,
  // and thus the window pairs, drift with the input layout).
  test("sortedNeighborhood pairs are partition-invariant") {
    def cust = Tables.customer(spark, sf0001)
    val a = rows(Dedup.sortedNeighborhood(cust, "c_custkey", "c_name"))
    val b = rows(Dedup.sortedNeighborhood(cust.repartition(7), "c_custkey", "c_name"))
    assert(a == b)
  }

  test("setSimilarityJoin (pigeonhole) is partition-invariant") {
    val a = rows(Dedup.setSimilarityJoin(docs, "doc_id", "text"))
    val b = rows(Dedup.setSimilarityJoin(docs.repartition(7), "doc_id", "text"))
    assert(a == b)
  }

  test("containmentJoin is partition-invariant") {
    val a = rows(Dedup.containmentJoin(docs, "doc_id", "text"))
    val b = rows(Dedup.containmentJoin(docs.repartition(7), "doc_id", "text"))
    assert(a == b)
  }

  test("bpeMerges is partition-invariant") {
    val a = rows(TextAnalysis.bpeMerges(docs, "text", rounds = 3))
    val b = rows(TextAnalysis.bpeMerges(docs.repartition(7), "text", rounds = 3))
    assert(a == b)
  }

  test("groupedAuc is partition-invariant") {
    import org.apache.spark.sql.functions._
    def ev = Tables.events(spark, sf0001)
    def auc(df: DataFrame) = Analytics.groupedAuc(
      df.withColumn("dow", dayofweek(col("ts"))), "dow", "value",
      col("event_type") === "purchase")
    assert(rows(auc(ev)) == rows(auc(ev.repartition(7))))
  }
}
