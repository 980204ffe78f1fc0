package graft

import graft.operators.{Analytics, Packing}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded-random property laws for the analytics operators' algebraic
  * claims — the invariants that make them safe to distribute:
  *
  *  - mergeLatest is SPLIT-INSENSITIVE under a total version order (any
  *    batching of the updates folds to the same final state) — the law q87's
  *    streaming upsert rides on;
  *  - packShards' shard assignment is a pure function of the (id, tokens)
  *    SET — independent of row order and partitioning;
  *  - funnel stage counts match a naive per-key replay.
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("mergeLatest: any batch split folds to the same final state") {
    val rowsGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(1L, 8L), Gen.choose(1L, 20L), Gen.choose(0, 999)))
    cases(Gen.zip(rowsGen, Gen.choose(1, 5)), 8).foreach { case (raw, nChunks) =>
      // Unique version per key: (v, seq) with seq = index ⇒ total order.
      val rows = raw.zipWithIndex.map { case ((k, v, p), i) =>
        (k, v, i.toLong, p.toString)
      }
      val whole = rows.toDF("k", "v", "seq", "payload")
      def empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], whole.schema)
      val direct = Analytics.mergeLatest(empty, whole, Seq("k"), Seq("v", "seq"))
        .drop("_src").collect().map(_.toString).toSet
      val folded = rows.grouped(math.max(1, rows.size / nChunks)).toSeq
        .foldLeft(empty) { (state, chunk) =>
          Analytics.mergeLatest(state,
            chunk.toDF("k", "v", "seq", "payload"), Seq("k"), Seq("v", "seq"))
            .drop("_src").localCheckpoint(true)
        }.collect().map(_.toString).toSet
      assert(folded == direct, s"split into $nChunks chunks diverged")
    }
  }

  test("packShards: assignment is invariant to row order and partitioning") {
    val rowsGen = Gen.listOfN(80, Gen.choose(1L, 300L))
    cases(Gen.zip(rowsGen, Gen.choose(50L, 500L)), 6).zipWithIndex.foreach {
      case ((toks, budget), caseIdx) =>
      val rows = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val a = Packing.packShards(rows.toDF("doc_id", "n_tok"),
          "doc_id", "n_tok", budget)
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // Seeded per case: a failing permutation must be replayable.
      val b = Packing.packShards(
          new scala.util.Random(caseIdx.toLong).shuffle(rows)
            .toDF("doc_id", "n_tok")
            .repartition(7), "doc_id", "n_tok", budget)
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"budget $budget: layout depends on physical order")
    }
  }

  test("funnel: matches a naive per-key replay") {
    val evGen = Gen.listOfN(50, Gen.zip(
      Gen.choose(1L, 6L), Gen.choose(0L, 40L), Gen.oneOf("s", "v", "c", "p", "x")))
    val stages = Seq("s", "v", "c", "p")
    cases(evGen, 8).foreach { raw =>
      val rows = raw.zipWithIndex.map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
      val got = Analytics.funnel(rows.toDF("u", "t", "rid", "ty"),
          Seq("u"), "t", "rid", "ty", stages)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // Naive model: per key, walk events in (t, rid) order; advance the
      // stage pointer when the next stage's type appears.
      val expect = rows.groupBy(_._1).map { case (_, evs) =>
        var stage = 0
        evs.sortBy(e => (e._2, e._3)).foreach { e =>
          if (stage < stages.length && e._4 == stages(stage)) stage += 1
        }
        stage
      }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      assert(got == expect, s"funnel diverged: got $got expect $expect")
    }
  }

  test("funnel maxGap: matches a naive gap-bounded per-key replay") {
    val evGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(1L, 6L), Gen.choose(0L, 40L), Gen.oneOf("s", "v", "c", "p", "x")))
    val stages = Seq("s", "v", "c", "p")
    val gap = 7L
    cases(evGen, 8).foreach { raw =>
      val rows = raw.zipWithIndex.map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
      val got = Analytics.funnel(rows.toDF("u", "t", "rid", "ty"),
          Seq("u"), "t", "rid", "ty", stages, maxGapSec = Some(gap))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // Naive model: per key, walk events in (t, rid) order; the pointer
      // advances on the next stage's type only within `gap` of the time the
      // PREVIOUS stage first completed (anchors are first-completion times,
      // never refreshed by later repeats — the operator's t_i semantics).
      val expect = rows.groupBy(_._1).map { case (_, evs) =>
        var stage = 0
        var anchor = Long.MinValue
        evs.sortBy(e => (e._2, e._3)).foreach { e =>
          if (stage < stages.length && e._4 == stages(stage) &&
              (stage == 0 || e._2 <= anchor + gap)) {
            anchor = e._2; stage += 1
          }
        }
        stage
      }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      assert(got == expect, s"gap funnel diverged: got $got expect $expect")
    }
  }
}
