package graft

import graft.operators.Similarity
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
