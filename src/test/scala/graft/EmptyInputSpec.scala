package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Graph, Layout, Privacy, Similarity, Skew, TextAnalysis}

/** Degenerate-input contracts for the round-10b operators: an EMPTY input
  * must yield an empty (or well-defined) result, never a crash. Under ANSI
  * mode (Spark 4's default) this is a real failure class — an eagerly
  * evaluated broadcast/collect of a 0/0 division or a null bound throws at
  * runtime (the q180 saturated-pool crash was exactly this family). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def docs0 = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def ev0 =
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("ER / similarity operators return empty on empty input") {
    assert(Dedup.sortedNeighborhood(docs0, "doc_id", "text").isEmpty)
    assert(Dedup.setSimilarityJoin(docs0, "doc_id", "text").isEmpty)
    assert(Dedup.containmentJoin(docs0, "doc_id", "text").isEmpty)
    assert(Dedup.linkageScore(docs0, "doc_id", "text", Seq("text")).isEmpty)
  }

  test("analytics operators tolerate empty input") {
    assert(Analytics.coOccurrence(docs0.toDF("b", "it"), "b", "it").isEmpty)
    assert(Analytics.touchAttribution(ev0, "user_id", "ts", "event_id",
      "event_type", "purchase", Seq("view")).isEmpty)
    assert(Analytics.sessionPaths(ev0, "user_id", "ts", "event_id",
      "event_type").isEmpty)
    assert(Analytics.seasonalDecompose(ev0, "event_type", "ts", "value").isEmpty)
    assert(Analytics.equalFreqBins(ev0, "event_type", "value", "event_id").isEmpty)
    assert(Analytics.madOutliers(ev0, "event_type", "value", "event_id").isEmpty)
    assert(Analytics.activeUsers(ev0, "user_id", "ts").isEmpty)
    assert(Analytics.targetEncode(ev0, "event_type", "event_id", "value").isEmpty)
    assert(Analytics.groupedAuc(ev0, "event_type", "value", lit(true)).isEmpty)
    assert(Analytics.ksTest(ev0, lit(true), "value").isEmpty)
    assert(Analytics.psi(ev0, lit(true), "value").isEmpty)
    assert(Analytics.calibrationBins(ev0, "value", lit(true)).isEmpty)
    assert(Analytics.abTest(ev0, lit(0L), "user_id", lit(true)).isEmpty)
    assert(Analytics.welchTest(ev0, lit(0L), "user_id", "value").isEmpty)
  }

  test("graph / layout / text / skew operators tolerate empty input") {
    val e0 = Seq.empty[(String, String)].toDF("src", "dst")
    val f0 = Seq.empty[(String, Double)].toDF("n", "f")
    assert(Graph.neighborhoodAgg(e0, "src", "dst", f0, "n", "f").isEmpty)
    assert(Layout.skipStats(docs0.toDF("x", "y"), "x", "y").isEmpty)
    assert(Skew.keySkewProfile(docs0, "doc_id").isEmpty)
    assert(TextAnalysis.bpeMerges(docs0, "text").isEmpty)
    assert(TextAnalysis.bpeFertility(docs0, "text", "doc_id").isEmpty)
  }

  test("round-18 operators tolerate empty input (ANSI-mode no-crash contracts)") {
    val iv0 = Seq.empty[(Long, Long)].toDF("g", "v")
    val vec0 = Seq.empty[(Long, Seq[Double], Boolean)].toDF("id", "vec", "b")
    val e0 = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Analytics.kruskalWallis(ev0, "event_type", "value").isEmpty)
    assert(Analytics.robustGroupProfile(iv0, "g", "v").isEmpty)
    assert(Analytics.wilsonIntervals(ev0, "event_type", lit(true)).isEmpty)
    assert(Analytics.snapshotAggMerge(ev0, "user_id", "value",
      lit(true)).isEmpty)
    assert(Analytics.cusumDrift(ev0, "ts").isEmpty)
    assert(Analytics.conversionLagQuantiles(ev0, "user_id", "ts",
      "event_id", "event_type", "click", "purchase", Seq(500)).isEmpty)
    assert(TextAnalysis.vocabGrowth(docs0, "doc_id", "text").isEmpty)
    assert(Privacy.entropyLDiversityAudit(docs0, Seq(col("doc_id")),
      col("text")).isEmpty)
    assert(Graph.hits(e0, "src", "dst").isEmpty)
    assert(Similarity.centroidDrift(vec0, "id", "vec", col("b")).isEmpty)
    // 1-row global summaries stay WELL-DEFINED on empty input: all-null
    // statistics, never a 0/0 ANSI crash
    val ck = Analytics.cohenKappa(ev0, col("event_type"), col("event_type"))
      .collect()
    assert(ck.length == 1 && ck.head.isNullAt(2) && ck.head.isNullAt(4))
    val nd = TextAnalysis.ndcgAtK(docs0, "doc_id", "text", Seq("x"))
      .as[(Int, Double, Double, Option[Double])].collect().toSeq
    assert(nd == Seq((10, 0.0, 0.0, None)))
  }

  test("round-19 operators tolerate empty input (ANSI-mode no-crash contracts)") {
    val e0 = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    // SSSP on an empty graph: the source itself is still settled at 0.
    val ss = Graph.sssp(e0, "src", "dst", "w", "x")
      .as[(String, Long)].collect().toSeq
    assert(ss == Seq("x" -> 0L))
    assert(Analytics.concentrationProfile(ev0, "event_type",
      "user_id").isEmpty)
    assert(Analytics.interArrivalStats(ev0, "user_id", "ts", "event_id",
      "event_type").isEmpty)
    assert(TextAnalysis.vocabRichness(docs0.toDF("lang", "text"), "lang",
      "text").isEmpty)
    assert(Analytics.joinViewMaintenance(
      Seq.empty[(Long, String, Boolean)].toDF("ak", "ag", "ab"),
      Seq.empty[(Long, String, Double, Boolean)].toDF("bk", "bg", "v", "bb"),
      "ak", "bk", "ag", "bg", "v", col("ab"), col("bb")).isEmpty)
    // 1-row / spine-shaped global summaries stay WELL-DEFINED: all-null
    // statistics, never a 0/0 ANSI crash
    val rt = Analytics.robustTrend(ev0, "ts").collect()
    assert(rt.length == 1 && rt.head.isNullAt(2) && rt.head.isNullAt(3))
    val ac = Analytics.autocorrelation(ev0, "ts")
      .as[(Int, Long, Option[Double])].collect().toSeq
    assert(ac.size == 7 && ac.forall(_._3.isEmpty))
    val se0 = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.degreeDistribution(se0, "src", "dst").isEmpty)
    assert(TextAnalysis.normalizationImpact(docs0.toDF("source", "text"),
      "source", "text").isEmpty)
    assert(Dedup.crossSplitLeakage(docs0, "doc_id", "text").isEmpty)
    assert(Analytics.neymanAllocation(ev0, "event_type", "value").isEmpty)
  }

  test("round-20 operators tolerate empty input (ANSI-mode no-crash contracts)") {
    assert(Analytics.isotonicCalibration(ev0, "value",
      col("event_type") === "purchase").isEmpty)
    assert(Analytics.abPower(ev0, "event_type", "user_id", "value").isEmpty)
    assert(Analytics.mutualInfo(ev0, col("event_type"),
      dayofweek(col("ts"))).isEmpty)
    assert(TextAnalysis.readability(docs0, "doc_id", "text").isEmpty)
    assert(Analytics.seqPatterns(ev0, "user_id", "ts", "event_id",
      "event_type").isEmpty)
    assert(Analytics.logRank(ev0, "user_id", "ts",
      pmod(col("user_id"), lit(2L))).isEmpty)
    val e0 = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.personalizedPageRank(e0, "src", "dst", Seq("x")).isEmpty)
    assert(Graph.kTruss(e0, "src", "dst", k = 4).isEmpty)
    assert(Graph.bridges(e0, "src", "dst").isEmpty)
  }
}
