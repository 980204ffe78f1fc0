package graft

import graft.operators.{Analytics, Privacy, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-18 locks: the two ADVICE contracts (pqAudit remainder,
  * attributionModels degenerate decay) and hand-computable cases for
  * the round's new operators — Kruskal-Wallis H (q253), the robust
  * median/MAD group profile (q254), the vocabulary growth curve (q255),
  * entropy l-diversity (q256), Cohen's kappa (q257) and the
  * partial-state aggregate merge (q258). Every expected value is
  * derivable on paper from the inputs. */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ pqAudit remainder --

  test("pqAudit: trailing d mod m dims are dropped (r17 ADVICE contract)") {
    // d = 10, m = 4 => subvector width 2, coded positions 0..7; dims 9
    // and 10 must influence nothing. Corpus A carries junk in the
    // trailing dims; corpus B zeroes them — audits must be identical.
    def vecs(junk: Int => Double) = (0 until 10).map { i =>
      (i.toLong, (0 until 8).map(p => (i * 8 + p) / 10.0) ++
        Seq(junk(i), junk(i) * 2))
    }
    def audit(rows: Seq[(Long, Seq[Double])]) =
      Similarity.pqAudit(rows.toDF("vid", "vec"), "vid", "vec",
          m = 4, k = 8)
        .orderBy(col("sub"), col("code"))
        .as[(Int, Int, Long, Long, Option[Double])].collect().toSeq
    val withJunk = audit(vecs(i => 7.5 * i - 31.0))
    val zeroed = audit(vecs(_ => 0.0))
    assert(withJunk == zeroed)
    assert(withJunk.size == 32) // the full m x k spine survives
  }

  // ----------------------------------- attributionModels degenerate decay --

  test("attributionModels: all-zero decay weights fall back to the linear split (r17 ADVICE)") {
    // One click at t = 0, then purchases every 29 min (sub-gap chain =
    // ONE session) out to 46 * 29 min ≈ 22.2 h. Purchases 45 and 46 sit
    // > 21.4 h after the only touch, so their 9-dp weight rounds to 0
    // and w_tot = 0 — the pre-guard engine emitted NaN→null and the two
    // conversions vanished from decay_credit. The guard defines the
    // degenerate case as the linear split: every model credits exactly
    // one unit per conversion.
    val gapUs = 1740L * 1000000L // 29 min
    val ev = ((0L, "click") +: (1L to 46L).map(i => (i, "purchase")))
      .map { case (i, et) => (7L, i, et, i * gapUs) }
      .toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.attributionModels(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("signup", "view", "click"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("click", 46L, 46.0, 46.0, 46.0)))
  }

  // --------------------------------------------------- kruskalWallis --

  test("kruskalWallis: hand-computed H, and the all-tied NULL") {
    // A = {1, 2}, B = {3, 4}: pooled doubled ranks 2, 4, 6, 8.
    // R2_A = 6, R2_B = 14; terms 2·(6/4 − 2.5)² = 2 and 2·(14/4 − 2.5)²
    // = 2; H = 12·4 / (4·5) = 2.4; no ties → h_tie_adj = 2.4.
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val out = Analytics.kruskalWallis(df, "g", "v")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(out == Seq((2L, 4L, 2.4, Some(2.4))))
    // every pooled value identical: T = N³ − N → C = 0 → H = 0, adj NULL
    val tied = Seq(("A", 7.0), ("A", 7.0), ("B", 7.0), ("B", 7.0))
      .toDF("g", "v")
    val out2 = Analytics.kruskalWallis(tied, "g", "v")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(out2 == Seq((2L, 4L, 0.0, None)))
  }

  // ----------------------------------------------- robustGroupProfile --

  test("robustGroupProfile: hand-computed median/MAD/outlier count") {
    // A = [1, 2, 3, 100]: med = value at ⌈4/2⌉ = 2; deviations
    // [1, 0, 1, 98] → MAD = value at pos 2 of [0, 1, 1, 98] = 1;
    // outliers beyond 5·MAD: only 98; max_dev = 98.
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 100L)).toDF("g", "v")
    val out = Analytics.robustGroupProfile(df, "g", "v", kTimes = 5)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 4L, 2L, 1L, 1L, 98L)))
    // the integral-value contract is inherited from groupQuantilesExact
    val frac = Seq(("A", 1.5)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Analytics.robustGroupProfile(frac, "g", "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  // -------------------------------------------------------- vocabGrowth --

  test("vocabGrowth: hand-computed curve over two buckets") {
    // ids 0..3, buckets = 2 → docs {0,1} in bucket 0, {2,3} in bucket 1.
    // Tokens: b0 = [a,b] + [b,c] (4); b1 = [c,d,a] + [] (3).
    // First buckets: a,b,c → 0; d → 1 ⇒ new_types 3 then 1; cum 3, 4.
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "c d a"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", "text", buckets = 2)
      .orderBy(col("bucket"))
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0, 2L, 4L, 3L, 3L), (1, 2L, 3L, 1L, 4L)))
  }

  // ---------------------------------------------- entropyLDiversityAudit --

  test("entropyLDiversityAudit: hand-computed entropy and the skew-vs-distinct gap") {
    // g1 = [x, x, y, z]: distinct 3, but H = −(.5 ln .5 + 2·.25 ln .25)
    // = 1.039720770 (9-dp terms) → exp(H) ≈ 2.828427 < 3 → NOT ok —
    // exactly the skewed class the q196 distinct count waves through.
    // g2 = [x, y, z] uniform: H = 3·0.366204096 → exp ≈ 3.0 → ok.
    val r9t = (p: Double) => BigDecimal(-p * math.log(p))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val h1 = (r9t(0.5) + r9t(0.25) + r9t(0.25)).toDouble
    val h2 = (r9t(1.0 / 3) * 3).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "z"),
      ("g2", "x"), ("g2", "y"), ("g2", "z")).toDF("grp", "sv")
    val out = Privacy.entropyLDiversityAudit(df, Seq(col("grp")),
        col("sv"), l = 3)
      .orderBy(col("_qi0"))
      .as[(String, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("g1", 4L, 3L, r6(h1), r6(math.exp(h1)), false),
      ("g2", 3L, 3L, r6(h2), r6(math.exp(h2)), true)))
    assert(r6(math.exp(h2)) == 3.0, "the uniform class sits exactly at l")
  }

  // ---------------------------------------------------------- cohenKappa --

  test("cohenKappa: the textbook 2x2 table") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no: po = 35/50 = .7,
    // pe = (25·30 + 25·20)/2500 = .5, κ = (.7 − .5)/(1 − .5) = .4.
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val out = Analytics.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Double, Double, Option[Double])].collect().toSeq
    assert(out == Seq((50L, 35L, 0.7, 0.5, Some(0.4))))
    // both raters constant and equal: pe = 1 → κ undefined (NULL)
    val const = Seq.fill(4)(("k", "k")).toDF("a", "b")
    val out2 = Analytics.cohenKappa(const, col("a"), col("b"))
      .as[(Long, Long, Double, Double, Option[Double])].collect().toSeq
    assert(out2 == Seq((4L, 4L, 1.0, 1.0, None)))
  }

  // ------------------------------------------------- snapshotAggMerge --

  test("snapshotAggMerge: merged moments equal the single-pass recompute") {
    // k1: base [1.00, 3.00], delta [5.00] → n 3, total 9, mean 3,
    // var = (35 − 27)/3 = 2.666667. k2: delta-only [2.00] → var 0.
    val df = Seq(("k1", 1.0, true), ("k1", 3.0, true), ("k1", 5.0, false),
      ("k2", 2.0, false)).toDF("k", "v", "b")
    val out = Analytics.snapshotAggMerge(df, "k", "v", col("b"))
      .orderBy(col("k"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("k1", 3L, 9.0, 3.0, 2.666667), ("k2", 1L, 2.0, 2.0, 0.0)))
  }

  // ---------------------------------------------------------- cusumDrift --

  test("cusumDrift: hand-computed 4-day series with the one-sided clamps") {
    // Counts [10, 10, 10, 22]: mean = 13, sigma = sqrt(27) = 3*sqrt(3).
    // The hi side stays clamped at 0 for three days then jumps on the
    // spike; the lo side accumulates the small deficit and resets to 0
    // on the spike. No alarm (h = 4*sigma = 20.78).
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sig = math.sqrt(27.0)
    val mean = 13.0
    val slack = sig * 0.5
    var (hi, lo) = (0.0, 0.0)
    val expect = Seq(10L, 10L, 10L, 22L).zipWithIndex.map { case (n, i) =>
      hi = r9(math.max(0.0, hi + (n - mean - slack)))
      lo = r9(math.max(0.0, lo + (mean - slack - n)))
      (java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), n, hi, lo,
        false, false)
    }
    val ev = Seq.tabulate(10)(i => (1, i)) ++ Seq.tabulate(10)(i => (2, i)) ++
      Seq.tabulate(10)(i => (3, i)) ++ Seq.tabulate(22)(i => (4, i))
    val df = ev.toDF("d", "i")
      .select(expr("cast(concat('2024-01-0', d, ' 12:00:00') as timestamp)")
        .as("ts"))
    val out = Analytics.cusumDrift(df, "ts").orderBy(col("day"))
      .as[(java.sql.Date, Long, Double, Double, Boolean, Boolean)]
      .collect().toSeq
    assert(out == expect)
    assert(out(3)._3 > 6.4 && out(3)._4 == 0.0,
      "spike day: hi jumps, lo clamps to 0")
  }

  // ------------------------------------------ conversionLagQuantiles --

  test("conversionLagQuantiles: hand-computed median of three lags") {
    // One user, one dow: clicks at 0 s and 100 s; purchases at 30 s
    // (lag 30 s), 150 s (lag 50 s from the click at 100), 160 s (lag
    // 60 s). pm = 500 picks position ceil(3/2) = 2 -> 50 s.
    val s2us = 1000000L
    val ev = Seq(
      (7L, 1L, "click", 0L), (7L, 2L, "click", 100 * s2us),
      (7L, 3L, "purchase", 30 * s2us), (7L, 4L, "purchase", 150 * s2us),
      (7L, 5L, "purchase", 160 * s2us)
    ).toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.conversionLagQuantiles(ev, "user_id", "ts",
        "event_id", "event_type", "click", "purchase", Seq(500))
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(out.map(r => (r._2, r._3, r._4)) == Seq((500, 3L, 50 * s2us)))
  }

  // ------------------------------------------------- wilsonIntervals --

  test("wilsonIntervals: hand-computed 3/10 interval") {
    val df = (Seq.fill(3)(("g", true)) ++ Seq.fill(7)(("g", false)))
      .toDF("grp", "succ")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (p, n) = (0.3, 10.0)
    val denom = 1.0 + 1.96 * 1.96 / n
    val center = (p + 1.96 * 1.96 / (2.0 * n)) / denom
    val half = 1.96 * math.sqrt(p * (1.0 - p) / n +
      1.96 * 1.96 / (4.0 * n * n)) / denom
    val out = Analytics.wilsonIntervals(df, "grp", col("succ"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("g", 10L, 3L, 0.3, r6(center - half), r6(center + half))))
    // the interval stays inside [0, 1] even at the extremes (the Wald
    // failure modes): k = 0 has lo = 0 exactly and hi > 0
    val zero = Seq.fill(5)(("z", false)).toDF("grp", "succ")
    val oz = Analytics.wilsonIntervals(zero, "grp", col("succ"))
      .as[(String, Long, Long, Double, Double, Double)].collect().head
    assert(oz._5 == 0.0 && oz._6 > 0.0 && oz._6 < 1.0)
  }

  // --------------------------------------------------- centroidDrift --

  test("centroidDrift: identical snapshots cohere at cosine 1; orthogonal ones at 0") {
    // identical: every per-dim delta 0, L2 0, cosine exactly 1.0
    val same = Seq((1L, Seq(0.5, 0.25), true), (2L, Seq(0.5, 0.25), false))
      .toDF("id", "vec", "b")
    val o1 = graft.operators.Similarity.centroidDrift(same, "id", "vec",
        col("b"))
      .orderBy(col("pos"))
      .as[(Int, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(o1.map(r => (r._1, r._6, r._7, r._8)) ==
      Seq((0, 0L, 0L, Some(1.0)), (1, 0L, 0L, Some(1.0))))
    // orthogonal centroids: base (1000, 0) vs delta (0, 1000)
    val orth = Seq((1L, Seq(1.0, 0.0), true), (2L, Seq(0.0, 1.0), false))
      .toDF("id", "vec", "b")
    val o2 = graft.operators.Similarity.centroidDrift(orth, "id", "vec",
        col("b"))
      .orderBy(col("pos"))
      .as[(Int, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(o2 == Seq(
      (0, 1L, 1L, 1000L, 0L, 1000L, 2000000L, Some(0.0)),
      (1, 1L, 1L, 0L, 1000L, -1000L, 2000000L, Some(0.0))))
  }

  // ---------------------------------------------------------------- hits --

  test("hits: engine matches a BigInt replay of the exact fixed-point fold") {
    // Bipartite 1→10, 2→10, 2→11: hub 2 points at both authorities, so
    // it must dominate hub 1; authority 10 has both hubs, so it must
    // dominate 11. The replay IS the spec'd arithmetic: exact sums, one
    // floor division per half-iteration.
    val S = BigInt(graft.operators.Graph.Scale)
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L))
    var hub = Map(1L -> S, 2L -> S)
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      val ar = edges.groupBy(_._2).map { case (b, es) =>
        b -> es.map(e => hub(e._1)).sum }
      val am = ar.values.max
      auth = ar.map { case (b, v) => b -> (v * S / am) }
      val hr = edges.groupBy(_._1).map { case (a, es) =>
        a -> es.map(e => auth(e._2)).sum }
      val hm = hr.values.max
      hub = hr.map { case (a, v) => a -> (v * S / hm) }
    }
    val expect =
      auth.toSeq.map { case (n, v) => ("authority", n, v.toLong) }
        .sortBy(r => (-r._3, r._2)) ++
      hub.toSeq.map { case (n, v) => ("hub", n, v.toLong) }
        .sortBy(r => (-r._3, r._2))
    val out = graft.operators.Graph.hits(
        edges.toDF("src", "dst"), "src", "dst")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == expect)
    assert(out.head._2 == 10L && out(1)._2 == 11L, "authority order")
    assert(out(2)._2 == 2L && out(3)._2 == 1L, "hub order")
  }

  // ---------------------------------------------------------------- ndcg --

  test("ndcgAtK: perfect retrieval scores exactly 1.0; zero relevance is NULL") {
    // Every document contains every term → identical scores AND
    // identical relevance → ranked order (score DESC, id) == ideal
    // order (rel DESC, id) == id order → dcg == idcg → ndcg = 1.0.
    val perfect = (1L to 3L).map(i => (i, "vector dup spark"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ndcgAtK(perfect, "doc_id", "text",
        Seq("vector", "dup", "spark"), k = 3)
      .as[(Int, Double, Double, Option[Double])].collect().toSeq
    assert(out.size == 1 && out.head._1 == 3)
    assert(out.head._2 == out.head._3 && out.head._4 == Some(1.0))
    // no term appears anywhere: bm25 retrieves nothing, IDCG = 0 → NULL
    val none = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val out2 = TextAnalysis.ndcgAtK(none, "doc_id", "text",
        Seq("vector"), k = 3)
      .as[(Int, Double, Double, Option[Double])].collect().toSeq
    assert(out2 == Seq((3, 0.0, 0.0, None)))
  }
}
