package graft

import graft.operators
import graft.operators.{Analytics, AsOf, Dedup, Similarity, Skew, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contracts for the public [[Graft]] facade — specifically the delegation
  * signatures, after the round-2 bug where `similarPairs`'s `topN` bound
  * positionally to `topPairs`'s `dim` and silently degenerated LSH candidate
  * generation to the full cross product.
  */
class FacadeSpec extends SparkSpec {

  test("similarPairs == topPairs(dim=64) on the fixtures") {
    val emb = Tables.embeddings(spark, sf0001)
    val viaFacade = Graft.similarPairs(emb, "vec_id", "embedding").collect()
    val direct = Similarity.topPairs(emb, "vec_id", "embedding", 64).collect()
    assert(viaFacade.toSeq == direct.toSeq)
  }

  test("similarPairs plan has no cross product / nested-loop join") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = Graft.similarPairs(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"facade similarPairs degenerated to all-pairs:\n$p")
  }

  test("langId on a corpus with no trigrams answers 'unknown' instead of crashing") {
    import spark.implicits._
    val tiny = Seq((1L, "ab", "en"), (2L, "x", "de")).toDF("doc_id", "text", "lang")
    val out = Graft.langId(tiny, "doc_id", "text", "lang").collect()
    assert(out.length == 2 && out.forall(_.getString(2) == "unknown"))
  }

  test("facade delegation sweep: plans identical to the direct operator calls") {
    // The round-2 bug class (a facade default binding positionally to the
    // wrong operator parameter) changes the logical plan — so plan identity
    // modulo expression ids locks EVERY checkpoint-free facade entry at once.
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "lid")
    val right = Seq((1L, 8L, 1.5), (2L, 25L, 2.5)).toDF("k", "t", "v")
    // Timestamp-typed events for the retention family (to_date needs a
    // date/timestamp/string time column).
    val ev = Seq((1L, 10L, 1L, "a"), (2L, 20L, 2L, "b"))
      .toDF("user_id", "t", "rid", "event_type")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    def norm(df: DataFrame): String =
      df.queryExecution.logical.toString.replaceAll("#\\d+", "#")
    val pairs: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("exactDedup", Graft.exactDedup(docs, "doc_id", "text"),
        Dedup.exactDedup(docs, "doc_id", "text")),
      ("simHash", Graft.simHash(docs, "doc_id", "text"),
        Dedup.simHash(docs, "doc_id", "text")),
      ("knn", Graft.knn(emb, "vec_id", "embedding", col("vec_id") < 5),
        Similarity.knnBruteForce(emb, "vec_id", "embedding", col("vec_id") < 5)),
      ("annLsh", Graft.annLsh(emb, "vec_id", "embedding", 64, col("vec_id") < 5, 10),
        Similarity.annLsh(emb, "vec_id", "embedding", 64, col("vec_id") < 5, 10)),
      ("annIvf", Graft.annIvf(emb, "vec_id", "label", "embedding", col("vec_id") < 5),
        Similarity.ivfSearch(emb, "vec_id", "label", "embedding", col("vec_id") < 5)),
      ("centroids", Graft.centroids(emb, "label", "embedding"),
        Similarity.centroids(emb, "label", "embedding")),
      ("tokenStats", Graft.tokenStats(docs, "doc_id", "text"),
        TextAnalysis.tokenStats(docs, "doc_id", "text")),
      ("qualityScore", Graft.qualityScore(docs, "doc_id", "text"),
        TextAnalysis.qualityScore(docs, "doc_id", "text")),
      ("fingerprint", Graft.fingerprint(docs, "doc_id", "text"),
        TextAnalysis.fingerprint(docs, "doc_id", "text")),
      ("winnow", Graft.winnow(docs, "doc_id", "text"),
        TextAnalysis.winnow(docs, "doc_id", "text")),
      ("tokenCounts", Graft.tokenCounts(docs, "doc_id", "text"),
        TextAnalysis.tokenCounts(docs, "doc_id", "text")),
      ("curate", Graft.curate(docs, "doc_id", "text"),
        TextAnalysis.curate(docs, "doc_id", "text")),
      ("hashSplit", Graft.hashSplit(docs, "doc_id"),
        TextAnalysis.hashSplit(docs, "doc_id")),
      ("repetitionSignals", Graft.repetitionSignals(docs, "doc_id", "text"),
        TextAnalysis.repetitionSignals(docs, "doc_id", "text")),
      ("scrub", Graft.scrub(docs, "doc_id", "text", "\\bcustomer\\b", "<PII>"),
        TextAnalysis.scrub(docs, "doc_id", "text", "\\bcustomer\\b", "<PII>")),
      ("stratifiedSample", Graft.stratifiedSample(docs, "source", "doc_id"),
        TextAnalysis.stratifiedSample(docs, "source", "doc_id")),
      ("asofJoin", Graft.asofJoin(left, right, "k", "t", Seq("v"), "nearest", Some(5.0)),
        AsOf.asofJoin(left, right, "k", "t", Seq("v"), "nearest", Some(5.0))),
      ("saltedAggregate", Graft.saltedAggregate(docs, "lang", "doc_id", 4),
        Skew.saltedAggregate(docs, "lang", "doc_id", 4)),
      ("kmvDistinct", Graft.kmvDistinct(docs, "lang", "doc_id", 8),
        Analytics.kmvDistinct(docs, "lang", "doc_id", 8)),
      ("kmvSketch", Graft.kmvSketch(docs, "lang", "doc_id", 8),
        Analytics.kmvSketch(docs, "lang", "doc_id", 8)),
      ("chunkDocuments", Graft.chunkDocuments(docs, "doc_id", "text", 32, 8),
        TextAnalysis.chunkDocuments(docs, "doc_id", "text", 32, 8)),
      ("funnel", Graft.funnel(left.toDF("user_id", "ts", "event_type"),
          Seq("user_id"), "ts", "ts", "event_type", Seq("a", "b")),
        Analytics.funnel(left.toDF("user_id", "ts", "event_type"),
          Seq("user_id"), "ts", "ts", "event_type", Seq("a", "b"))),
      ("mergeLatest", Graft.mergeLatest(right, right, Seq("k"), Seq("t")),
        Analytics.mergeLatest(right, right, Seq("k"), Seq("t"))),
      ("tableDiff", Graft.tableDiff(right, right, Seq("k"), Seq("v")),
        Analytics.tableDiff(right, right, Seq("k"), Seq("v"))),
      ("histogram", Graft.histogram(right, "v", 0.0, 1.0, 4),
        Analytics.histogram(right, "v", 0.0, 1.0, 4)),
      ("histogramQuantiles",
        Graft.histogramQuantiles(right, "v", 0.0, 1.0, 4, Seq(0.5)),
        Analytics.histogramQuantiles(right, "v", 0.0, 1.0, 4, Seq(0.5))),
      ("packShards", Graft.packShards(right, "k", "t", 100L),
        operators.Packing.packShards(right, "k", "t", 100L)),
      ("retention", Graft.retention(ev, "user_id", "ts"),
        Analytics.retention(ev, "user_id", "ts")),
      ("cohortFunnel", Graft.cohortFunnel(ev, "user_id", "ts", "rid",
          "event_type", Seq("a", "b")),
        Analytics.cohortFunnel(ev, "user_id", "ts", "rid",
          "event_type", Seq("a", "b"))),
      ("weightedSample", Graft.weightedSample(docs, "doc_id", "n_chars", 5),
        TextAnalysis.weightedSample(docs, "doc_id", "n_chars", 5)),
      ("bm25", Graft.bm25(docs, "doc_id", "text", Seq("spark", "dup"), 5),
        TextAnalysis.bm25(docs, "doc_id", "text", Seq("spark", "dup"), 5)),
      ("sessionize", Graft.sessionize(ev, "user_id", "ts", "rid"),
        Analytics.sessionize(ev, "user_id", "ts", "rid")),
      ("zorderCluster", Graft.zorderCluster(docs, "doc_id", "n_chars", 8),
        operators.Layout.zorderCluster(docs, "doc_id", "n_chars", 8)),
      ("aggState", Graft.aggState(right, Seq("k"), "v"),
        Analytics.aggState(right, Seq("k"), "v")),
      ("scd2", Graft.scd2(ev, "user_id", "ts", "rid", "event_type"),
        Analytics.scd2(ev, "user_id", "ts", "rid", "event_type")),
      ("skyline", Graft.skyline(right, "k", "v"),
        Analytics.skyline(right, "k", "v")),
      ("corpusMix", Graft.corpusMix(docs, "doc_id", "lang",
          Map("en" -> 1.0), 5L),
        TextAnalysis.corpusMix(docs, "doc_id", "lang", Map("en" -> 1.0), 5L)),
      ("mergeAggStates",
        Graft.mergeAggStates(Analytics.aggState(right, Seq("k"), "v"),
          Analytics.aggState(right, Seq("k"), "v"), Seq("k")),
        Analytics.mergeAggStates(Analytics.aggState(right, Seq("k"), "v"),
          Analytics.aggState(right, Seq("k"), "v"), Seq("k"))),
      ("intervalConcurrency", Graft.intervalConcurrency(right, "k", "t"),
        Analytics.intervalConcurrency(right, "k", "t")),
      ("groupedTrend", Graft.groupedTrend(right, "k", "t", "v"),
        Analytics.groupedTrend(right, "k", "t", "v")),
      ("groupZScoreOutliers", Graft.groupZScoreOutliers(right, "k", "v"),
        Analytics.groupZScoreOutliers(right, "k", "v")),
    )
    pairs.foreach { case (n, f, d) =>
      assert(norm(f) == norm(d), s"facade.$n plan drifted from the operator's:\n${norm(f)}")
    }
  }

  test("facade delegation sweep: checkpoint-based ops produce identical rows") {
    // localCheckpoint embeds fresh RDD ids in the plan, so for these entries
    // compare produced rows instead of plan strings.
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    def rows(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet
    assert(rows(Graft.minHashLsh(docs, "doc_id", "text")) ==
      rows(Dedup.minHashLsh(docs, "doc_id", "text")))
    assert(rows(Graft.ngramJaccard(docs, "doc_id", "text")) ==
      rows(Dedup.ngramJaccard(docs, "doc_id", "text")))
    assert(rows(Graft.dedupNearDup(docs, "doc_id", "text")) ==
      rows(Dedup.dedupNearDup(docs, "doc_id", "text")))
    assert(rows(Graft.semanticDedup(emb, "vec_id", "label", "embedding")) ==
      rows(Similarity.semanticDedup(emb, "vec_id", "label", "embedding")))
    val edges = Dedup.ngramJaccard(docs, "doc_id", "text")
    assert(rows(Graft.connectedComponents(edges, "id1", "id2")) ==
      rows(Dedup.connectedComponents(edges, "id1", "id2")))
    assert(rows(Graft.contamination(docs, "doc_id", "text")) ==
      rows(TextAnalysis.contamination(docs, "doc_id", "text")))
    assert(rows(Graft.pageRank(edges, "id1", "id2")) ==
      rows(operators.Graph.pageRank(edges, "id1", "id2")))
    assert(rows(Graft.triangleCount(edges, "id1", "id2")) ==
      rows(operators.Graph.triangleCount(edges, "id1", "id2")))
    assert(rows(Graft.tfidf(docs, "doc_id", "text")) ==
      rows(TextAnalysis.tfidf(docs, "doc_id", "text")))
    assert(rows(Graft.corpusDecision(docs, "doc_id", "text")) ==
      rows(TextAnalysis.corpusDecision(docs, "doc_id", "text")))
    assert(rows(Graft.simHashNearDup(docs, "doc_id", "text")) ==
      rows(Dedup.simHashNearDup(docs, "doc_id", "text")))
    assert(rows(Graft.lmScore(docs, "doc_id", "text", col("lang") === "en")) ==
      rows(TextAnalysis.lmScore(docs, "doc_id", "text", col("lang") === "en")))
    assert(rows(Graft.fuzzyJoin(docs, "doc_id", "text")) ==
      rows(Dedup.fuzzyJoin(docs, "doc_id", "text")))
    assert(rows(Graft.vocabCoverage(docs, "doc_id", "text")) ==
      rows(TextAnalysis.vocabCoverage(docs, "doc_id", "text")))
    // round-10b surface (sampled — every new facade method is a one-line
    // delegation; these three cover the three new module routes)
    assert(rows(Graft.setSimilarityJoin(docs, "doc_id", "text")) ==
      rows(Dedup.setSimilarityJoin(docs, "doc_id", "text")))
    assert(rows(Graft.bpeMerges(docs, "text", rounds = 2)) ==
      rows(TextAnalysis.bpeMerges(docs, "text", rounds = 2)))
    val ev = Tables.events(spark, sf0001)
    assert(rows(Graft.ksTest(ev, col("event_type") === "purchase", "value")) ==
      rows(operators.Analytics.ksTest(ev, col("event_type") === "purchase", "value")))
  }

  test("ngramJaccard threads maxDf: a df-cap of 0 excludes every shingle") {
    val docs = Tables.documents(spark, sf0001)
    assert(Graft.ngramJaccard(docs, "doc_id", "text", maxDf = 0).isEmpty)
    // and the default cap keeps the fixture result unchanged
    val capped = Graft.ngramJaccard(docs, "doc_id", "text").collect().toSet
    val uncapped = Graft.ngramJaccard(docs, "doc_id", "text",
      maxDf = Int.MaxValue).collect().toSet
    assert(capped == uncapped && capped.nonEmpty)
  }
}
