package graft

import graft.operators.{Analytics, Graph, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-20 locks: hand-computable cases for the round's new operators
  * as they land. Every expected value is derivable on paper from the
  * inputs. */
class Round20OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------- isotonic calibration --

  test("isotonicCalibration: PAV pools a decreasing violation exactly (q281)") {
    // Four 1-row cells with raw rates [1, 0, 0, 1] (bins = 4 over
    // scores 0..3, one row each). PAV merges the violating prefix:
    // [1] > [0] -> pool 1/2; 1/2 > [0] -> pool 1/3; 1/3 <= [1] stops.
    // Fitted = [1/3, 1/3, 1/3, 1] — and the max-min closed form agrees:
    // e.g. fitted(1) = min over j of mean(1..j) = min(1, 1/2, 1/3, 1/2).
    val df = Seq((0.0, true), (1.0, false), (2.0, false), (3.0, true))
      .toDF("score", "lab")
    val out = Analytics.isotonicCalibration(df, "score", col("lab"), bins = 4)
      .orderBy(col("bin"))
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0, 1L, 1L, 1.0, 0.333333),
      (1, 1L, 0L, 0.0, 0.333333),
      (2, 1L, 0L, 0.0, 0.333333),
      (3, 1L, 1L, 1.0, 1.0)))
  }

  test("isotonicCalibration: already-monotone rates are unchanged; constant scores land in bin 0 (q281)") {
    val mono = Seq((0.0, false), (1.0, false), (2.0, true), (3.0, true))
      .toDF("score", "lab")
    val outM = Analytics.isotonicCalibration(mono, "score", col("lab"), bins = 4)
      .orderBy(col("bin"))
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(outM.map(_._4) == outM.map(_._5),
      s"monotone input must be a fixed point of the fit: $outM")
    val const = Seq((5.0, true), (5.0, false)).toDF("score", "lab")
    val outC = Analytics.isotonicCalibration(const, "score", col("lab"), bins = 4)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(outC == Seq((0, 2L, 1L, 0.5, 0.5)))
  }

  // ------------------------------------------------------ A/B power --

  test("abPower: hand-computed two-arm MDE (q287)") {
    // Arm 0 = even users {0, 2} with values {10, 14}: n=2, mean=12,
    // var=((100+196)-288)/2=4. Arm 1 = odd users {1, 3} with {20, 22}:
    // n=2, mean=21, var=((400+484)-882)/2=1.
    // MDE = 2.801585 * sqrt(4/2 + 1/2) = 4.429695; rel = MDE/12.
    val df = Seq((0L, "g", 10.0), (2L, "g", 14.0),
        (1L, "g", 20.0), (3L, "g", 22.0))
      .toDF("user_id", "grp", "value")
    val out = Analytics.abPower(df, "grp", "user_id", "value")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out == Seq(("g", 2L, 2L, 12.0, 21.0, 4.429695, 0.369141)))
  }

  test("abPower: a group with only one arm is dropped, zero control mean nulls the relative MDE (q287)") {
    val df = Seq((0L, "one", 1.0), (2L, "one", 2.0), // even users only
        (0L, "z", -1.0), (2L, "z", 1.0), (1L, "z", 5.0), (3L, "z", 7.0))
      .toDF("user_id", "grp", "value")
    val out = Analytics.abPower(df, "grp", "user_id", "value")
      .orderBy(col("grp"))
      .as[(String, Long, Long, Double, Double, Double, Option[Double])]
      .collect().toSeq
    assert(out.map(_._1) == Seq("z"), s"one-armed group must drop: $out")
    assert(out.head._4 == 0.0 && out.head._7.isEmpty,
      s"zero control mean must NULL mde_rel: $out")
  }

  // ---------------------------------------------- mutual information --

  test("mutualInfo: perfectly dependent pair gives MI = ln 2 and NMI = 1 (q288)") {
    // Cells (a,1)x2 and (b,2)x2: each term 0.5*ln(2*4/(2*2)) = 0.5*ln2;
    // MI = ln2 = 0.693147; Hx = Hy = ln2; NMI = 1.
    val df = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val out = Analytics.mutualInfo(df, col("x"), col("y"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq((4L, 2L, 0.693147, 0.693147, 0.693147, 1.0)))
  }

  test("mutualInfo: independent pair gives MI = 0; constant column NULLs NMI (q288)") {
    // Uniform 2x2 product distribution: every term ln(1) = 0.
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val outI = Analytics.mutualInfo(ind, col("x"), col("y"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(outI == Seq((4L, 4L, 0.0, 0.693147, 0.693147, 0.0)))
    val const = Seq(("a", 1), ("a", 2)).toDF("x", "y")
    val outC = Analytics.mutualInfo(const, col("x"), col("y"))
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().toSeq
    assert(outC.head._3 == 0.0 && outC.head._4 == 0.0 && outC.head._6.isEmpty,
      s"constant x: MI 0, Hx 0, NMI NULL: $outC")
  }

  // ------------------------------------------- sequential patterns --

  test("seqPatterns: gapped subsequences with per-user distinct support (q282)") {
    // u1 = [a, b, a], u2 = [a, b] (order by ts, id):
    //   L1: a in both (2), b in both (2).
    //   L2: (a,b) in both (2); (a,a) and (b,a) only in u1 (1 each) —
    //       (a,a) is the GAPPED pair q170's contiguous trigrams miss.
    //   L3: (a,b,a) only in u1 (1).
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq((1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "a"),
        (2L, t(0), 4L, "a"), (2L, t(1), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.seqPatterns(ev, "user_id", "ts", "event_id",
        "event_type", minSupport = 1)
      .as[(Int, String, Option[String], Option[String], Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2, r._3, r._4))
    assert(out == Seq(
      (1, "a", None, None, 2L),
      (1, "b", None, None, 2L),
      (2, "a", Some("a"), None, 1L),
      (2, "a", Some("b"), None, 2L),
      (2, "b", Some("a"), None, 1L),
      (3, "a", Some("b"), Some("a"), 1L)))
  }

  test("seqPatterns: the cap prunes events past position `cap` before pairing (q282)") {
    // One user with [a, a, a, b]: cap = 3 keeps only the three a's, so
    // no pattern may contain b and (a,a) has support 1.
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq((1L, t(0), 1L, "a"), (1L, t(1), 2L, "a"),
        (1L, t(2), 3L, "a"), (1L, t(3), 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.seqPatterns(ev, "user_id", "ts", "event_id",
        "event_type", cap = 3, minSupport = 1)
      .as[(Int, String, Option[String], Option[String], Long)]
      .collect().toSeq
    assert(out.forall(r => r._2 == "a" && !r._3.contains("b")
      && !r._4.contains("b")), s"capped-away b leaked: $out")
    assert(out.toSet == Set((1, "a", None, None, 1L),
      (2, "a", Some("a"), None, 1L), (3, "a", Some("a"), Some("a"), 1L)))
  }

  // --------------------------------------- personalized PageRank --

  test("personalizedPageRank: one round on a path routes restart mass to the source (q283)") {
    // Path a-b-c, source {a}, damping 85, 1 iter, Scale = 1e9:
    //   init: a = 1e9, b = c = 0; degrees a:1, b:2, c:1.
    //   round 1 messages: a sends 1e9 to b; b and c send 0.
    //   a' = 150_000_000 (restart only), b' = 850_000_000, c' = 0.
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = Graph.personalizedPageRank(e, "src", "dst", Seq("a"), iters = 1)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("b", 850000000L), ("a", 150000000L), ("c", 0L)))
  }

  // ------------------------------------------------------ k-truss --

  test("kTruss: K4 survives the 4-truss peel, a pendant triangle is peeled (q284)") {
    // K4 on {1,2,3,4}: every edge closes exactly 2 triangles -> support
    // 2 >= k-2, survives. Pendant triangle {4,5,6}: each edge closes 1
    // -> peeled in round 1; K4 supports are unchanged after the peel.
    val k4 = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val pend = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val e = (k4 ++ pend).toDF("src", "dst")
    val out = Graph.kTruss(e, "src", "dst", k = 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out == k4.map { case (a, b) => (a, b, 2L) }.toSeq.sorted)
  }

  // ------------------------------------------------------ bridges --

  test("bridges: two triangles joined by one edge — exactly the connector and the tail are bridges (q289)") {
    // Triangles {1,2,3} and {4,5,6} joined by 3-4, plus tail 6-7:
    // cycle edges are never bridges; 3-4 and 6-7 disconnect the graph.
    // Hand trace of the fingerprint algebra: BFS root 1, tree
    // 1-2,1-3,3-4,4-5,4-6,6-7; non-tree 2-3 (r1), 5-6 (r2);
    // sub(4)=r2^r2=0 -> 3-4 bridge; sub(7)=0 -> 6-7 bridge;
    // sub(2)=r1, sub(3)=r1^0=r1 (4's subtree cancels r2), sub(5)=r2,
    // sub(6)=r2 -> all non-zero, not bridges.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
        (3L, 4L), (6L, 7L))
      .toDF("src", "dst")
    val out = Graph.bridges(e, "src", "dst")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(out == Seq((3L, 4L), (6L, 7L)))
  }

  test("bridges: a tree is all bridges, a cycle has none (q289)") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.bridges(path, "src", "dst")
      .as[(Long, Long)].collect().toSeq.sorted
      == Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(Graph.bridges(cycle, "src", "dst").isEmpty)
    // two components: each component's bridges independently
    val two = Seq((1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    assert(Graph.bridges(two, "src", "dst")
      .as[(Long, Long)].collect().toSeq.sorted == Seq((1L, 2L)))
  }

  // ----------------------------------------------------- log-rank --

  test("logRank: hand-computed three-event-day table (q285)") {
    // Arm 0 (even users): u0 d=2 event, u2 d=0 event. Arm 1 (odd):
    // u1 d=1 event, u3 d=5 = horizon -> censored (censorDays = 0).
    // Pooled event days {0,1,2}; at-risk/expected per day:
    //   t=0: n=(2,2) d=(1,0) e0=0.5   v=0.25
    //   t=1: n=(1,2) d=(0,1) e0=1/3   v=2/9
    //   t=2: n=(1,1) d=(1,0) e0=0.5   v=0.25
    // o0=2, e0=1.333333, o1=1, e1=1.666667,
    // chi2=(2-1.333333333)^2/0.722222222 = 0.615385.
    def day(n: Int) = java.sql.Timestamp.valueOf(f"2024-01-0${n + 1}%d 00:00:00")
    val ev = Seq((0L, day(0)), (0L, day(2)), (2L, day(0)),
        (1L, day(0)), (1L, day(1)), (3L, day(0)), (3L, day(5)))
      .toDF("user_id", "ts")
    val out = Analytics.logRank(ev, "user_id", "ts",
        pmod(col("user_id"), lit(2L)), censorDays = 0)
      .as[(Long, Long, Double, Long, Double, Option[Double])]
      .collect().toSeq
    assert(out == Seq((3L, 2L, 1.333333, 1L, 1.666667, Some(0.615385))))
  }

  // ---------------------------------------------------- readability --

  test("readability: hand-computed Flesch on two sentences (q286)") {
    // "Hello world. It works!" — 2 terminal runs, 4 words, vowel groups
    // he-llo(2) world(1) it(1) works(1) = 5 syllables:
    // 206.835 - 1.015*(4/2) - 84.6*(5/4) = 99.055.
    // "abc" — no terminal punct but 1 word: sentence floor kicks in,
    // 206.835 - 1.015*1 - 84.6*1 = 121.22. Empty text: 0 words, NULL.
    val df = Seq((1L, "Hello world. It works!"), (2L, "abc"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "doc_id", "text")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 4L, 5L, Some(99.055)),
      (2L, 1L, 1L, 1L, Some(121.22)),
      (3L, 0L, 0L, 0L, None)))
  }
}
