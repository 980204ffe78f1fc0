package graft

import graft.operators.{Analytics, Graph, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-19 locks: the three r18 ADVICE contracts (cohenKappa's
  * pairwise-complete null rule, snapshotAggMerge's defined-boolean
  * split, vocabGrowth's non-negative-id bucket domain) and
  * hand-computable cases for the round's new operators as they land.
  * Every expected value is derivable on paper from the inputs. */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- cohenKappa null contract --

  test("cohenKappa: units with a NULL rater value are excluded from n (r18 ADVICE, arm 1)") {
    // Five units, two carrying a NULL rating — the pairwise-complete
    // rule keeps exactly the three fully-rated units:
    //   (x,x) (x,y) (y,y)  =>  n=3, agree=2,
    //   na = {x:2, y:1}, nb = {x:1, y:2}, S = 2*1 + 1*2 = 4,
    //   kappa = (3*2 - 4)/(9 - 4) = 0.4, po = 2/3, pe = 4/9.
    val df = Seq(
      (Some("x"), Some("x")), (Some("x"), Some("y")), (Some("y"), Some("y")),
      (None: Option[String], Some("x")), (Some("y"), None: Option[String]))
      .toDF("a", "b")
    val out = Analytics.cohenKappa(df, col("a"), col("b"))
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((3L, 2L, 0.666667, 0.444444, 0.4)))
  }

  test("cohenKappa: TOTAL rater expressions keep null-input units (r18 ADVICE, arm 2)") {
    // The q257 shape: raters are when(..).otherwise(..) over nullable
    // inputs, so a NULL input maps to 'drop' — a CATEGORY, not a NULL
    // rating — and the unit counts. All three units agree:
    //   (keep,keep) (drop,drop) (drop,drop)  =>  n=3, agree=3, po=1,
    //   na = nb = {keep:1, drop:2}, S = 1 + 4 = 5,
    //   kappa = (9-5)/(9-5) = 1. Filtering the RAW columns IS NOT NULL
    //   would read n=1 — the divergence the contract forbids.
    val df = Seq((Some(10L), Some(10L)), (None: Option[Long], Some(2L)),
        (Some(3L), None: Option[Long]))
      .toDF("a", "b")
    val out = Analytics.cohenKappa(df,
        when(col("a") >= 5, lit("keep")).otherwise(lit("drop")),
        when(col("b") >= 5, lit("keep")).otherwise(lit("drop")))
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((3L, 3L, 1.0, 0.555556, 1.0)))
  }

  // ----------------------------------- snapshotAggMerge defined split --

  test("snapshotAggMerge: a NULL split lands in delta, never in neither (r18 ADVICE)") {
    // k1 carries values 1, 2, 3 with split true/false/NULL. Pre-fix the
    // NULL row fell out of both snapshots (n=2, total=3); the coalesced
    // split books it in delta, so the merge certificate covers ALL
    // admitted rows: n=3, total=6, mean=2,
    // variance = ((1+4+9) - 36/3)/3 = 2/3.
    val df = Seq(("k1", 1.0, Some(true)), ("k1", 2.0, Some(false)),
        ("k1", 3.0, None: Option[Boolean]))
      .toDF("k", "v", "b")
    val out = Analytics.snapshotAggMerge(df, "k", "v", col("b"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("k1", 3L, 6.0, 2.0, 0.666667)))
    // Certificate form: the 3-way-split merge must equal the all-in-base
    // single state (merge(state(base), state(delta)) == state(union)).
    val whole = Analytics.snapshotAggMerge(df, "k", "v", lit(true))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == whole)
  }

  // -------------------------------------- vocabGrowth bucket domain --

  test("vocabGrowth: non-negative ids keep every bucket in [0, buckets) (r18 ADVICE)") {
    // The documented div/`//` agreement domain: ids 0..9 with buckets=5
    // give bucket = (id*5) div 10 in {0..4}; tokens 't0'..'t9' each
    // first appear in their own doc, so new_types tracks docs and
    // cum_types is the running doc count.
    val docs = (0L to 9L).map(i => (i, s"t$i common")).toDF("id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "id", "text", buckets = 5)
      .orderBy(col("bucket"))
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1, 2, 3, 4))
    assert(out.forall { case (_, nd, nt, _, _) => nd == 2 && nt == 4 })
    // 'common' is new only in bucket 0: new_types = 3,2,2,2,2 cum 3,5,7,9,11
    assert(out.map(_._4) == Seq(3L, 2L, 2L, 2L, 2L))
    assert(out.map(_._5) == Seq(3L, 5L, 7L, 9L, 11L))
  }

  // ------------------------------------------------- weighted SSSP --

  test("sssp: hand-built weighted graph — shortcuts beat hops, caps bind (q267)") {
    // Undirected weighted graph:
    //   A-B w1, B-C w1, A-C w5  (2-hop path 2 beats direct 5)
    //   C-D w1                  (dist D = 3 via A-B-C-D)
    //   D-E w10, C-E w9         (dist E = min(3+10, 2+9) = 11)
    //   F-G w1                  (disconnected from A: absent)
    val edges = Seq(("A", "B", 1L), ("B", "C", 1L), ("A", "C", 5L),
        ("C", "D", 1L), ("D", "E", 10L), ("C", "E", 9L), ("F", "G", 1L))
      .toDF("s", "t", "w")
    val out = Graph.sssp(edges, "s", "t", "w", "A", maxRounds = 8)
      .orderBy(col("node")).as[(String, Long)].collect().toSeq
    assert(out == Seq("A" -> 0L, "B" -> 1L, "C" -> 2L, "D" -> 3L,
      "E" -> 11L))
    // Round cap semantics: with maxRounds = 1 only direct edges settle
    // (the <=1-edge walk minimum — A-C reads its DIRECT weight 5).
    val capped = Graph.sssp(edges, "s", "t", "w", "A", maxRounds = 1)
      .orderBy(col("node")).as[(String, Long)].collect().toSeq
    assert(capped == Seq("A" -> 0L, "B" -> 1L, "C" -> 5L))
    // Parallel edges: the cheapest member wins.
    val par = Seq(("A", "B", 7L), ("A", "B", 2L)).toDF("s", "t", "w")
    assert(Graph.sssp(par, "s", "t", "w", "A").orderBy(col("node"))
      .as[(String, Long)].collect().toSeq == Seq("A" -> 0L, "B" -> 2L))
  }

  test("sssp: frontier early-exit equals the full-round answer (q267)") {
    // A path graph settles in |V|-1 rounds; a huge cap must not change
    // the answer (the frontier empties and the loop exits).
    val path = Seq(("n1", "n2", 3L), ("n2", "n3", 4L)).toDF("s", "t", "w")
    val a = Graph.sssp(path, "s", "t", "w", "n1", maxRounds = 2)
      .orderBy(col("node")).as[(String, Long)].collect().toSeq
    val b = Graph.sssp(path, "s", "t", "w", "n1", maxRounds = 64)
      .orderBy(col("node")).as[(String, Long)].collect().toSeq
    assert(a == Seq("n1" -> 0L, "n2" -> 3L, "n3" -> 7L))
    assert(a == b)
  }
}
