package graft

import graft.operators.{Analytics, Dedup, Graph, TextAnalysis}
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

  // ----------------------------------------- concentration profile --

  test("concentrationProfile: hand-computed Gini/HHI/top-share (q269)") {
    // Group g: units u1 (1 event), u2 (1), u3 (2) — sorted [1, 1, 2]:
    //   six2 = 2*(1*1 + 2*1 + 3*2) = 18, N = 3, S = 4
    //   gini = (18 - 4*4)/(3*4) = 1/6, hhi = (1+1+4)/16 = 0.375,
    //   top = 2/4 = 0.5.
    // Group eq: two units with 1 each — gini exactly 0.
    val df = Seq(("g", "u1"), ("g", "u2"), ("g", "u3"), ("g", "u3"),
        ("eq", "a"), ("eq", "b"))
      .toDF("grp", "unit")
    val out = Analytics.concentrationProfile(df, "grp", "unit")
      .orderBy(col("grp"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("eq", 2L, 2L, 0.0, 0.5, 0.5),
      ("g", 3L, 4L, 0.166667, 0.375, 0.5)))
  }

  // ------------------------------------------------- robust trend --

  test("robustTrend: strictly rising series — tau_b = 1, Sen slope is the median pairwise slope (q270)") {
    // Day counts 1, 2, 4 over consecutive days: S = 3 (all concordant),
    // no tied counts so tau_b = 3/sqrt(3*3) = 1; slopes {1, 1.5, 2},
    // median 1.5.
    def day(d: Int, k: Int) = (1 to k).map(i =>
      java.sql.Timestamp.valueOf(f"2024-01-0$d%d 0$i%02d:00:00"))
    val ev = (day(1, 1) ++ day(2, 2) ++ day(3, 4)).toDF("ts")
    val out = Analytics.robustTrend(ev, "ts")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((3L, 3L, 1.0, 1.5)))
    // All-equal counts: every pair ties, the tie term consumes n0 and
    // tau_b is NULL; the flat slopes median 0.
    val flat = (day(1, 2) ++ day(2, 2) ++ day(3, 2)).toDF("ts")
    val f = Analytics.robustTrend(flat, "ts")
      .select(col("n_days"), col("s"), col("tau_b").isNull.as("nl"),
        col("sen_slope")).as[(Long, Long, Boolean, Double)].collect().toSeq
    assert(f == Seq((3L, 0L, true, 0.0)))
  }

  // --------------------------------------------- vocabulary richness --

  test("vocabRichness: hand-computed Chao1 + Good-Turing coverage (q271)") {
    // lang en: "a b" + "a c c" -> freqs a:2, b:1, c:2
    //   V = 3, N = 5, F1 = 1, F2 = 2
    //   chao1 = 3 + 1*0/(2*3) = 3.0, coverage = 1 - 1/5 = 0.8
    val docs = Seq(("en", "a b"), ("en", "a c c")).toDF("lang", "text")
    val out = TextAnalysis.vocabRichness(docs, "lang", "text")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(out == Seq(("en", 3L, 5L, 1L, 2L, 3.0, 0.8)))
    // All singletons: F2 = 0 exercises the bias-corrected denominator:
    // chao1 = 2 + 2*1/2 = 3, coverage = 0.
    val s = Seq(("de", "x y")).toDF("lang", "text")
    assert(TextAnalysis.vocabRichness(s, "lang", "text")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq == Seq(("de", 2L, 2L, 2L, 0L, 3.0, 0.0)))
  }

  // ---------------------------------------------- autocorrelation --

  test("autocorrelation: hand-computed lag-1/lag-2 on a 3-day series (q272)") {
    // Counts [1, 2, 4] (deviations [-4/3, -1/3, 5/3] around 7/3):
    // exact identity gives r1 = (9*14 - 18*9 + 2*49)/(3*(3*21 - 49))
    //   = (126 - 162 + 98)/42 = 62/42... compute via the spec below.
    // Use [1, 2, 3] instead — clean: x-bar = 2, devs [-1, 0, 1]:
    //   r1 = ((-1)(0) + (0)(1)) / 2 = 0, r2 = (-1)(1)/2 = -0.5;
    //   lags 3..7 have no pairs -> NULL.
    def day(d: Int, k: Int) = (1 to k).map(i =>
      java.sql.Timestamp.valueOf(f"2024-01-0$d%d 0$i%02d:00:00"))
    val ev = (day(1, 1) ++ day(2, 2) ++ day(3, 3)).toDF("ts")
    val out = Analytics.autocorrelation(ev, "ts")
      .select(col("lag"), col("n_pairs"), col("acf"))
      .as[(Int, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(out.take(2) == Seq((1, 2L, Some(0.0)), (2, 1L, Some(-0.5))))
    assert(out.drop(2).forall(_._3.isEmpty))
    // n_pairs is a COUNT: lags past the series clamp to 0, never go
    // negative (ADVICE r19 — lag 7 on a 3-day series is 0 pairs, not -4).
    assert(out.drop(2).forall(_._2 == 0L))
  }

  // --------------------------------------------------- burstiness --

  test("interArrivalStats: hand-computed gaps, CV and Goh-Barabasi B (q273)") {
    // One user, type x, events at 0 s / 10 s / 30 s: gaps 10 s, 20 s.
    //   mean 15 s, sd 5 s, cv = 1/3, B = (5-15)/(5+15) = -0.5.
    val ev = Seq((7L, 1L, "x", 0L), (7L, 2L, "x", 10000000L),
        (7L, 3L, "x", 30000000L))
      .toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.interArrivalStats(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 2L, 15.0, 5.0, 0.333333, -0.5)))
  }

  test("interArrivalStats: NULL type/ts rows are excluded symmetrically (q273)") {
    // ADVICE r19: a NULL event_type would form a group ordered
    // NULLS-FIRST by Spark and NULLS-LAST by DuckDB; both engines now
    // filter them at the input. The NULL-type row at t=10 s must not be
    // a group OR a lag predecessor: the surviving gap is 30 s, not 20 s.
    val ev = Seq((7L, 1L, Some("x"), Some(0L)),
        (7L, 2L, None: Option[String], Some(10000000L)),
        (7L, 3L, Some("x"), Some(30000000L)),
        (7L, 4L, Some("x"), None: Option[Long]))
      .toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.interArrivalStats(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 1L, 30.0, 0.0, 0.0, -1.0)))
  }

  // ----------------------------------- join-view delta maintenance --

  test("joinViewMaintenance: maintained view == recompute; NULL split lands in delta (q274)") {
    // a: key 1 in base, key 2 in delta, key 3 with a NULL split (must
    // book as delta, q258's rule). b: one base and one delta row on
    // key 1, a delta row on key 2, a base row on key 3.
    val a = Seq((1L, "p", Some(true)), (2L, "p", Some(false)),
        (3L, "q", None: Option[Boolean]))
      .toDF("ak", "ag", "ab")
    val b = Seq((1L, "r", 10.0, Some(true)), (1L, "r", 5.0, Some(false)),
        (2L, "s", 7.0, Some(false)), (3L, "r", 2.0, Some(true)))
      .toDF("bk", "bg", "v", "bb")
    val out = Analytics.joinViewMaintenance(a, b, "ak", "bk", "ag", "bg",
        "v", col("ab"), col("bb"))
      .orderBy(col("_ga"), col("_gb"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("p", "r", 2L, 15.0), ("p", "s", 1L, 7.0),
      ("q", "r", 1L, 2.0)))
    // Certificate: any split placement must equal the all-in-base state.
    val whole = Analytics.joinViewMaintenance(a, b, "ak", "bk", "ag", "bg",
        "v", lit(true), lit(true))
      .orderBy(col("_ga"), col("_gb"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == whole)
  }

  // ------------------------------------------- degree distribution --

  test("degreeDistribution: hand-computed spectrum, CCDF and Hill alpha (q275)") {
    // A-B, A-C, A-D, B-C: degrees A:3 B:2 C:2 D:1 ->
    //   dist {1:1, 2:2, 3:1}, nt = 4, ccdf(desc) 3->0.25 2->0.75 1->1.
    //   Tail (d >= 2): ntail = 3,
    //   slt = round(2*ln(2/1.5), 9) + round(1*ln(3/1.5), 9)
    //       = 0.575364145 + 0.693147181 = 1.268511326,
    //   alpha = 1 + 3/1.268511326 = 3.364977 (6 dp).
    val e = Seq(("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"))
      .toDF("s", "t")
    val out = Graph.degreeDistribution(e, "s", "t")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 1.0, 3.364977), (2L, 2L, 0.75, 3.364977),
      (3L, 1L, 0.25, 3.364977)))
    // All degrees below dmin: alpha NULL, spectrum still emitted.
    val lone = Seq(("X", "Y")).toDF("s", "t")
    val l = Graph.degreeDistribution(lone, "s", "t")
      .select(col("degree"), col("alpha").isNull).as[(Long, Boolean)]
      .collect().toSeq
    assert(l == Seq((1L, true)))
  }

  // --------------------------------------- normalization dedup impact --

  test("normalizationImpact: formatting variants collapse under the normal form (q276)") {
    // Three formatting variants of one sentence + one unique doc: raw
    // digests all distinct; normalized collapses the three.
    val docs = Seq(("s1", "Hello, World!"), ("s1", "hello world"),
        ("s1", "hello  world"), ("s1", "unique")).toDF("source", "text")
    val out = TextAnalysis.normalizationImpact(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("s1", 4L, 4L, 2L, 0L, 2L, 0.5)))
  }

  // ------------------------------------- cross-split near-dup leakage --

  test("crossSplitLeakage: exactly the straddling near-dup pairs survive (q277)") {
    // Two near-identical doc families over enough ids that both splits
    // appear; the audit must equal the manual composition (LSH pairs
    // joined to q48 splits, straddlers only) and every returned pair
    // must straddle.
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) base else base + " extra")).toDF("doc_id", "text")
    val out = Dedup.crossSplitLeakage(docs, "doc_id", "text")
      .as[(Long, Long, Double, String, String)].collect().toSeq
    assert(out.forall(p => p._4 != p._5), "a non-straddling pair leaked in")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    val split = TextAnalysis.hashSplit(docs.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    val expect = pairs.filter(p => split(p._1) != split(p._2))
      .map(p => (p._1, p._2, p._3, split(p._1), split(p._2))).toSet
    assert(out.toSet == expect)
    assert(expect.nonEmpty, "fixture produced no straddling pairs — widen it")
    assert(pairs.exists(p => split(p._1) == split(p._2)),
      "fixture produced no same-split pair — the filter arm is untested")
  }

  // ------------------------------------------------ Neyman allocation --

  test("neymanAllocation: hand-computed seats sum to the budget exactly (q278)") {
    // a: [0, 10] (sd 5, w 10); b: [0,0,0,0] (sd 0, w 0); c: [2, 4]
    // (sd 1, w 2). W = 12; quotas a 833.333333, b 0, c 166.666667;
    // floors 833/0/166 leave ONE seat -> largest remainder (c, 2/3)
    // takes it: 833/0/167, sum exactly 1000.
    val df = Seq(("a", 0.0), ("a", 10.0), ("b", 0.0), ("b", 0.0),
        ("b", 0.0), ("b", 0.0), ("c", 2.0), ("c", 4.0)).toDF("st", "v")
    val out = Analytics.neymanAllocation(df, "st", "v")
      .orderBy(col("st"))
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out == Seq(("a", 2L, 5.0, 833.333333, 833L),
      ("b", 4L, 0.0, 0.0, 0L), ("c", 2L, 1.0, 166.666667, 167L)))
    assert(out.map(_._5).sum == 1000L)
    // Degenerate (every stratum constant): proportional-to-N fallback.
    val const = Seq(("x", 5.0), ("x", 5.0), ("x", 5.0), ("y", 5.0))
      .toDF("st", "v")
    val f = Analytics.neymanAllocation(const, "st", "v")
      .orderBy(col("st")).as[(String, Long, Double, Double, Long)]
      .collect().toSeq
    assert(f == Seq(("x", 3L, 0.0, 750.0, 750L), ("y", 1L, 0.0, 250.0, 250L)))
  }
}
