package graft

import graft.operators.{Analytics, Graph, Layout, Packing, Privacy, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computable locks for the round-17 second and third batches: the
  * chi-squared categorical drift test (q238), the per-domain domination
  * cap (q239), the product-quantization coding audit (q240), the
  * order-invariant snapshot fingerprint (q241), the decile lift/gains
  * table (q242), the deterministic epoch shuffle (q243), Kaplan-Meier
  * survival (q244), RA-index link prediction (q245), the t-closeness
  * audit (q246) and the label-separation audit (q247). Every expected
  * value below is derivable on paper from the inputs — the same
  * fixture-free discipline as Round11OpsSpec/Round17OpsSpec. */
class Round17bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- chi2Drift --

  private def eventsAt(rows: Seq[(String, Long)]) =
    rows.toDF("event_type", "t")
      .select(col("event_type"), expr("timestamp_micros(t)").as("ts"))

  test("chi2Drift: hand-computed 3x2 table") {
    // Midpoint split: lo = 0, hi = 100 => period 1 iff 2t < 100.
    // Placement: A 3 pre / 1 post; B 1 pre / 3 post; C 1 pre / 1 post
    // (C's t = 100 row lands post: 200 < 100 is false).
    // Margins: rt = (4, 4, 2), ct = (5, 5), N = 10 => E = rt/2 per cell:
    //   A: E=2: (3-2)^2/2 = .5, (1-2)^2/2 = .5
    //   B: E=2: .5 / .5      C: E=1: 0 / 0
    // chi2 = 2.0, dof = (3-1)(2-1) = 2.
    val out = Analytics.chi2Drift(eventsAt(Seq(
        "A" -> 0L, "A" -> 10L, "A" -> 20L, "A" -> 60L,
        "B" -> 0L, "B" -> 70L, "B" -> 80L, "B" -> 90L,
        "C" -> 0L, "C" -> 100L)), "event_type", "ts")
      .orderBy(col("event_type"), col("period"))
      .as[(String, Int, Long, Double, Double, Double, Long)]
      .collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq(
      ("A", 1, 3L), ("A", 2, 1L), ("B", 1, 1L), ("B", 2, 3L),
      ("C", 1, 1L), ("C", 2, 1L)))
    assert(out.forall(r => r._6 == 2.0 && r._7 == 2L))
    assert(out.map(_._5) == Seq(0.5, 0.5, 0.5, 0.5, 0.0, 0.0))
    assert(out.map(_._4) == Seq(2.0, 2.0, 2.0, 2.0, 1.0, 1.0))
  }

  test("chi2Drift: absent cell enters the spine at obs = 0") {
    // C occurs ONLY pre-midpoint; the (C, 2) cell must exist with obs 0
    // and a positive expected count (a real deviation).
    // Placement: A 1 pre / 1 post, C 2 pre / 0 post => rt = (2, 2),
    // ct = (3, 1), N = 4 => E(C,2) = 2*1/4 = .5, term = .25/.5 = .5.
    val out = Analytics.chi2Drift(eventsAt(Seq(
        "A" -> 0L, "A" -> 90L, "C" -> 10L, "C" -> 20L)),
        "event_type", "ts")
      .filter(col("event_type") === "C" && col("period") === 2)
      .as[(String, Int, Long, Double, Double, Double, Long)]
      .collect().toSeq
    assert(out.size == 1)
    assert(out.head._3 == 0L && out.head._4 == 0.5 && out.head._5 == 0.5)
  }

  // ------------------------------------------------------- domainCap --

  test("domainCap: rank order, keep verdicts and the truncation flag") {
    val docs = Seq(
      // g1: 4 docs, cap 3 => rank by (len DESC, id ASC), id 13 dropped
      (10L, "g1", 50L), (11L, "g1", 40L), (12L, "g1", 40L), (13L, "g1", 10L),
      // g2: 2 docs, under the cap => all kept, not capped
      (20L, "g2", 9L), (21L, "g2", 7L)
    ).toDF("doc_id", "grp", "len")
    val out = TextAnalysis.domainCap(docs, Seq("grp"), "len", "doc_id", 3)
      .select(col("doc_id"), col("rk"), col("group_total"), col("kept"),
        col("capped"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      (10L, 1L, 4L, true, true), (11L, 2L, 4L, true, true),
      (12L, 3L, 4L, true, true), (13L, 4L, 4L, false, true),
      (20L, 1L, 2L, true, false), (21L, 2L, 2L, true, false)))
  }

  // --------------------------------------------------------- pqAudit --

  test("pqAudit: hand-computed assignment, error sums and the tie rule") {
    // dim 4, m = 2 (w = 2), k = 2, scale = 1. Codebook = ids 0 and 1:
    //   code0 = [0,0 | 1,1]   code1 = [1,1 | 0,0]
    // id2 = [1,1 | 0,0] -> sub0 code1 d0, sub1 code1 d0
    // id3 = [0,3 | 1,1] -> sub0: d(code0)=9, d(code1)=5 -> code1 d5;
    //                      sub1: code0 d0
    // id4 = [1,0 | 0,0] -> sub0: d(code0)=1 = d(code1)=1 -> TIE -> code0;
    //                      sub1: code1 d0
    // audit: sub0: code0 {id0, id4} err 1; code1 {id1, id2, id3} err 5
    //        sub1: code0 {id0, id3} err 0; code1 {id1, id2, id4} err 0
    val emb = Seq(
      (0L, Seq(0f, 0f, 1f, 1f)), (1L, Seq(1f, 1f, 0f, 0f)),
      (2L, Seq(1f, 1f, 0f, 0f)), (3L, Seq(0f, 3f, 1f, 1f)),
      (4L, Seq(1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqAudit(emb, "vec_id", "embedding", m = 2, k = 2,
        scale = 1)
      .orderBy(col("sub"), col("code"))
      .as[(Int, Int, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (0, 0, 2L, 1L, Some(0.5)), (0, 1, 3L, 5L, Some(1.666667)),
      (1, 0, 2L, 0L, Some(0.0)), (1, 1, 3L, 0L, Some(0.0))))
  }

  test("pqAudit: unused codes stay on the spine at n = 0") {
    // Two seeds, but every vector sits exactly ON seed 0 => code 1 of
    // both subspaces audits at n = 0 with NULL mean error.
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(9f, 9f, 9f, 9f)),
      (2L, Seq(0f, 0f, 0f, 0f)), (3L, Seq(0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqAudit(emb, "vec_id", "embedding", m = 2, k = 2,
        scale = 1)
      .orderBy(col("sub"), col("code"))
      .as[(Int, Int, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (0, 0, 3L, 0L, Some(0.0)), (0, 1, 1L, 0L, Some(0.0)),
      (1, 0, 3L, 0L, Some(0.0)), (1, 1, 1L, 0L, Some(0.0))))
  }

  // ------------------------------------------- snapshotFingerprint --

  test("snapshotFingerprint: row-order invariance and change detection") {
    val a = Seq((1L, "g1", "x"), (2L, "g1", "y"), (3L, "g2", "z"))
      .toDF("id", "grp", "v")
    // Same rows, reversed arrival order => every group unchanged.
    val sameShuffled = Seq((3L, "g2", "z"), (2L, "g1", "y"), (1L, "g1", "x"))
      .toDF("id", "grp", "v")
    val unchanged = Layout.snapshotFingerprint(a, sameShuffled, "grp",
        Seq("id", "v"))
      .select(col("grp"), col("changed"))
      .as[(String, Boolean)].collect().toMap
    assert(unchanged == Map("g1" -> false, "g2" -> false))
    // One value edited in g1; g2 untouched; g3 only in B.
    val b = Seq((1L, "g1", "x"), (2L, "g1", "EDITED"), (3L, "g2", "z"),
        (4L, "g3", "w"))
      .toDF("id", "grp", "v")
    val diff = Layout.snapshotFingerprint(a, b, "grp", Seq("id", "v"))
      .select(col("grp"), col("n_a"), col("n_b"), col("changed"))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(diff("g1") == (("g1", 2L, 2L, true)))
    assert(diff("g2") == (("g2", 1L, 1L, false)))
    assert(diff("g3") == (("g3", 0L, 1L, true)))
  }

  test("snapshotFingerprint: NULL and empty-string rows hash apart") {
    // The chr(2) NULL sentinel must keep (NULL) and ('') distinguishable.
    val a = Seq((1L, "g", Option.empty[String])).toDF("id", "grp", "v")
    val b = Seq((1L, "g", Option(""))).toDF("id", "grp", "v")
    val out = Layout.snapshotFingerprint(a, b, "grp", Seq("id", "v"))
      .select(col("changed")).as[Boolean].collect().toSeq
    assert(out == Seq(true))
  }

  // ------------------------------------------------------- liftTable --

  test("liftTable: hand-computed gains over ten single-unit deciles") {
    // Scores 10..1, responders = the three TOP scores => deciles 1..3
    // respond. Base rate 3/10: lift = (1*10)/(1*3) = 3.333333 on
    // responding deciles, 0 elsewhere; capture climbs 1/3, 2/3, then 1.
    val units = (1L to 10L).map(i => (i, 11L - i, if (i <= 3) 1L else 0L))
      .toDF("uid", "score", "resp")
    val out = Analytics.liftTable(units, "uid", "score", "resp")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out.map(_._1) == (1L to 10L))
    assert(out.forall(r => r._2 == 1L))
    assert(out.map(_._3) == Seq(1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(out.take(3).forall(r =>
      r._4 == 1.0 && r._5 == Some(3.333333)))
    assert(out.drop(3).forall(r => r._4 == 0.0 && r._5 == Some(0.0)))
    assert(out.map(_._6) == Seq(Some(0.333333), Some(0.666667), Some(1.0),
      Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(1.0), Some(1.0),
      Some(1.0)))
  }

  test("liftTable: zero responders yield NULL lift, never a throw") {
    val units = (1L to 10L).map(i => (i, i, 0L)).toDF("uid", "score", "resp")
    val out = Analytics.liftTable(units, "uid", "score", "resp")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out.size == 10 && out.forall(r => r._5.isEmpty && r._6.isEmpty))
  }

  // ---------------------------------------------------- epochShuffle --

  test("epochShuffle: (shard, pos) is a permutation matching the global hash order") {
    val docs = (1L to 100L).toDF("doc_id")
    val out = Packing.epochShuffle(docs, "doc_id", epoch = 1,
        rowsPerShard = 8L)
      .select(col("doc_id"), col("shard") * 8 + col("pos"))
      .as[(Long, Long)].collect().toSeq
    // Ranks cover 0..99 exactly once.
    assert(out.map(_._2).sorted == (0L until 100L))
    // The two-level rank equals the single global (bucket, hash, id)
    // order — the oracle's formulation, replayed here independently.
    val expected = docs
      .withColumn("_h", expr(graft.operators.CrossHash.h60Expr(
        "concat('1', ':', cast(doc_id as string))")))
      .withColumn("_bucket", (col("_h") % Packing.Buckets).cast("int"))
      .orderBy(col("_bucket"), col("_h"), col("doc_id"))
      .select(col("doc_id")).as[Long].collect().toSeq
    val byRank = out.sortBy(_._2).map(_._1)
    assert(byRank == expected)
  }

  test("epochShuffle: epochs permute differently, reruns agree") {
    val docs = (1L to 50L).toDF("doc_id")
    def order(epoch: Int) = Packing.epochShuffle(docs, "doc_id", epoch, 8L)
      .select(col("doc_id"), col("shard") * 8 + col("pos"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._2).map(_._1)
    assert(order(1) == order(1))
    assert(order(1) != order(2))
  }

  // ---------------------------------------------------- kaplanMeier --

  test("kaplanMeier: hand-computed life table with censoring") {
    // Horizon = day 20 (u4's last event); censor window 7 days => churn
    // iff last event < day 13. u1/u3 end day 2, u2 day 3 (all churned);
    // u4 spans day 10..20 (duration 10, censored AT the horizon).
    // Life table: d=2 (dd=2), d=3 (dd=1), d=10 (cc=1); risk 4 -> 2 -> 1.
    // Factors .5 / .5 / 1 => S = .5, .25, .25.
    val day = 86400000000L
    val ev = Seq((1L, 0L), (1L, 2 * day), (2L, 0L), (2L, 3 * day),
        (3L, 0L), (3L, 2 * day), (4L, 10 * day), (4L, 20 * day))
      .toDF("user_id", "t")
      .select(col("user_id"), expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.kaplanMeier(ev, "user_id", "ts", lit(0L))
      .orderBy(col("d"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 4L, 2L, 0L, 0.5),
      (0L, 3L, 2L, 1L, 0L, 0.25),
      (0L, 10L, 1L, 0L, 1L, 0.25)))
  }

  // ------------------------------------------------- linkPrediction --

  test("linkPrediction: hand-computed RA scores and tie order") {
    // Bipartite: centers 10 (deg 3: 1,2,3) and 11 (deg 2: 1,2).
    // Wedges: via 10 -> (1,2),(1,3),(2,3) at 1e6 div 3 = 333333;
    //         via 11 -> (1,2) at 500000;
    //         via 1 and via 2 (deg 2 each) -> (10,11) at 500000 twice.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L))
      .toDF("src", "dst")
    val out = Graph.linkPrediction(edges, "src", "dst", m = 8, topK = 10)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (10L, 11L, 2L, 1000000L, false),
      (1L, 2L, 2L, 833333L, false),
      (1L, 3L, 1L, 333333L, false),
      (2L, 3L, 1L, 333333L, false)))
  }

  test("linkPrediction: the per-center cap bounds fan-out and flags pairs") {
    // m = 2: center 10 keeps neighbors {1, 2} only => (1,3)/(2,3) vanish
    // and (1,2) is flagged — endpoint 1 neighbors the capped center 10.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L))
      .toDF("src", "dst")
    val out = Graph.linkPrediction(edges, "src", "dst", m = 2, topK = 10)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (10L, 11L, 2L, 1000000L, false),
      (1L, 2L, 2L, 833333L, true)))
  }

  test("linkPrediction: a pair whose capped wedge was fully pruned still flags (r17 ADVICE)") {
    // m = 2: center 10 (deg 4, capped) keeps {1, 2}; the (3, 4) wedge
    // through 10 is ENTIRELY pruned, yet (3, 4) survives via the
    // uncapped center 11 — its true common_neighbors is 2, reported 1.
    // The r17 produced-pair flag read false here (the ADVICE case); the
    // adjacency-derived flag reads true because 3 neighbors capped 10.
    // (10, 11) stays false: no endpoint has a capped neighbor, so its
    // score is GUARANTEED complete.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L),
      (3L, 11L), (4L, 11L)).toDF("src", "dst")
    val out = Graph.linkPrediction(edges, "src", "dst", m = 2, topK = 10)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (10L, 11L, 2L, 1000000L, false),
      (3L, 4L, 1L, 500000L, true),
      (1L, 2L, 1L, 250000L, true)))
  }

  // ----------------------------------------------- tClosenessAudit --

  test("tClosenessAudit: hand-computed EMD over two buckets") {
    // Global: bucket 0 x2, bucket 1 x2 (N=4, B=2; cumQ = .5, 1).
    // g1 = [0,0,1]: cumP = 2/3, 1 => t = |2/3-.5| / 1 = .166667 (ok).
    // g2 = [1]:     cumP = 0, 1   => t = .5 (violated at .25).
    val rows = Seq(("g1", 0L), ("g1", 0L), ("g1", 1L), ("g2", 1L))
      .toDF("grp", "v")
    val out = Privacy.tClosenessAudit(rows, Seq("grp"), col("v"), 0.25)
      .orderBy(col("grp"))
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(("g1", 3L, 0.166667, false), ("g2", 1L, 0.5, true)))
  }

  // --------------------------------------------- labelSeparation --

  // ----------------------------------------------- attributionModels --

  private def r9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
  private def r6(x: BigDecimal): Double =
    x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("attributionModels: linear/position/decay credits and the direct branch") {
    // u1: signup(0s), view(1200s), purchase(1200s, later id) -> k=2.
    // u2: lone purchase -> direct 1/1/1.
    // u3: signup(0), view(600s), click(1200s), purchase(1800s) -> k=3,
    //     position credits .4/.2/.4 in (us, id) order.
    val s2us = 1000000L
    val ev = Seq(
      (1L, 1L, "signup", 0L), (1L, 2L, "view", 1200 * s2us),
      (1L, 3L, "purchase", 1200 * s2us),
      (2L, 4L, "purchase", 500 * s2us),
      (3L, 5L, "signup", 0L), (3L, 6L, "view", 600 * s2us),
      (3L, 7L, "click", 1200 * s2us), (3L, 8L, "purchase", 1800 * s2us)
    ).toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.attributionModels(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("signup", "view", "click"))
      .orderBy(col("channel"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // Decay weights replayed with the operator's own 9-dp rule.
    val (w1s, w1v) = (r9(math.exp(-1200.0 / 3600)), r9(1.0))
    val wTot1 = w1s + w1v
    val (d1s, d1v) = (r9(w1s.toDouble / wTot1.toDouble),
      r9(w1v.toDouble / wTot1.toDouble))
    val (w3s, w3v, w3c) = (r9(math.exp(-1800.0 / 3600)),
      r9(math.exp(-1200.0 / 3600)), r9(math.exp(-600.0 / 3600)))
    val wTot3 = w3s + w3v + w3c
    val (d3s, d3v, d3c) = (r9(w3s.toDouble / wTot3.toDouble),
      r9(w3v.toDouble / wTot3.toDouble), r9(w3c.toDouble / wTot3.toDouble))
    val third = r9(1.0 / 3)
    assert(out == Seq(
      ("click", 1L, r6(third), 0.4, r6(d3c)),
      ("direct", 1L, 1.0, 1.0, 1.0),
      ("signup", 2L, r6(BigDecimal(0.5) + third), 0.9, r6(d1s + d3s)),
      ("view", 2L, r6(BigDecimal(0.5) + third), 0.7, r6(d1v + d3v))))
  }

  test("attributionModels: per-conversion linear and position credits sum to ~1") {
    val s2us = 1000000L
    val ev = Seq(
      (9L, 10L, "click", 0L), (9L, 11L, "view", 60 * s2us),
      (9L, 12L, "signup", 120 * s2us), (9L, 13L, "view", 180 * s2us),
      (9L, 14L, "purchase", 240 * s2us)
    ).toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.attributionModels(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("signup", "view", "click"))
      .as[(String, Long, Double, Double, Double)].collect()
    // k = 4: linear 4 x .25; position .4 + .1 + .1 + .4; decay sums to
    // 1 within the 9-dp per-credit rounding.
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-8)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-8)
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-8)
    assert(out.filter(_._1 == "view").map(_._4).sum == 0.5) // .4 last + .1 middle
  }

  // ------------------------------------------------- spearmanCorr --

  test("spearmanCorr: monotone groups hit +/-1; ties use doubled ranks; constant is NULL") {
    val rows = Seq(
      ("A", 1.0, 10.0), ("A", 2.0, 20.0), ("A", 3.0, 30.0),
      ("B", 1.0, 30.0), ("B", 2.0, 20.0), ("B", 3.0, 10.0),
      ("C", 1.0, 5.0), ("C", 1.0, 7.0), ("C", 2.0, 9.0),
      ("D", 4.0, 1.0), ("D", 4.0, 2.0)
    ).toDF("g", "x", "y")
    val out = Analytics.spearmanCorr(rows, "g", "x", "y")
      .orderBy(col("g"))
      .as[(String, Long, Option[Double])].collect().toSeq
    // C: doubled ranks rx=(3,3,6), ry=(2,4,6) => rho = 18/sqrt(18*24)
    //   = sqrt(3)/2 = .866025 at 6 dp.
    assert(out == Seq(
      ("A", 3L, Some(1.0)), ("B", 3L, Some(-1.0)),
      ("C", 3L, Some(0.866025)), ("D", 2L, None)))
  }

  // ------------------------------------------------ profileDrift --

  test("profileDrift: per-column stat diffs and the null-safe verdict") {
    val a = Seq((1L, Option("x")), (2L, Option("x")),
      (3L, Option.empty[String])).toDF("id", "v")
    val b = a.filter(col("id") =!= 3)
    val out = operators.Relational.profileDrift(a, b, Seq("id", "v"))
      .orderBy(col("col_name"))
      .select(col("col_name"), col("n_rows_a"), col("n_rows_b"),
        col("null_rate_a"), col("null_rate_b"), col("n_distinct_a"),
        col("n_distinct_b"), col("max_a"), col("max_b"), col("drifted"))
      .as[(String, Long, Long, Double, Double, Long, Long,
        Option[Long], Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      ("id", 3L, 2L, 0.0, 0.0, 3L, 2L, Some(3L), Some(2L), true),
      ("v", 3L, 2L, 0.333333, 0.0, 1L, 1L, None, None, true)))
    val same = operators.Relational.profileDrift(a, a, Seq("id", "v"))
      .select(col("drifted")).as[Boolean].collect().toSeq
    assert(same == Seq(false, false))
  }

  // --------------------------------------------- quantileNormalize --

  test("quantileNormalize: hand-computed per-mille mapping onto the pooled grid") {
    // Pooled (N=3): v=10 covers pm 1..333, v=20 -> 334..666, v=30 ->
    // 667..1000. Group A (n=2): v=10 at r2=2 -> pm 500 -> 20; v=20 at
    // r2=4 -> pm 1000 -> 30. Group B (n=1): v=30 -> pm 1000 -> 30.
    val rows = Seq(("A", 10L), ("A", 20L), ("B", 30L)).toDF("g", "v")
    val out = Analytics.quantileNormalize(rows, "g", "v")
      .orderBy(col("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 10L, 1L, 500L, 20L), ("A", 20L, 1L, 1000L, 30L),
      ("B", 30L, 1L, 1000L, 30L)))
  }

  test("quantileNormalize: ties share one doubled-rank position") {
    // A = [5, 5]: one cell (c=2), r2 = 3 -> pm = ceil(3*500/2) = 750,
    // landing in the pooled 7-span (667..1000).
    val rows = Seq(("A", 5L), ("A", 5L), ("B", 7L)).toDF("g", "v")
    val out = Analytics.quantileNormalize(rows, "g", "v")
      .orderBy(col("g"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 5L, 2L, 750L, 7L), ("B", 7L, 1L, 1000L, 7L)))
  }

  test("labelSeparation: hand-computed cohesion, nearest centroid, ratio") {
    // A = {(0,0), (2,0)} -> centroid (1,0), intra d2 = 1+1 (msd 1.0);
    // B = {(10,0)} -> centroid (10,0), intra 0 (ratio NULL).
    // inter d2(A,B) = 81. sep(A) = 81 * 2 / 2 = 81.
    val emb = Seq((0L, "A", Seq(0f, 0f)), (1L, "A", Seq(2f, 0f)),
        (2L, "B", Seq(10f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.labelSeparation(emb, "vec_id", "label",
        "embedding", scale = 1)
      .orderBy(col("label"))
      .as[(String, Long, Double, String, Long, Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      ("A", 2L, 1.0, "B", 81L, Some(81.0)),
      ("B", 1L, 0.0, "A", 81L, None)))
  }
}
