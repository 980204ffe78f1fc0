package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Contracts for the analytics operators (funnel / CDC merge / KMV /
  * histogram) beyond what the DuckDB hash gate proves: semantics on
  * adversarial hand-built fixtures, estimator error bounds, and the plan
  * shapes that make them 100 TB-safe. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- funnel --

  test("funnel: strictly-ordered semantics on a hand-built fixture") {
    // u1 completes in order; u2 has the purchase BEFORE the click (stage 3);
    // u3 never signs up but does everything else (stage 0); u4 converts with
    // every step at the SAME timestamp — row-id tie-break applies, and the
    // ascending event_id order happens to run signup->purchase (stage 4).
    val ev = Seq(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "click"), (1L, 40L, 4L, "purchase"),
      (2L, 10L, 5L, "signup"), (2L, 20L, 6L, "view"),
      (2L, 25L, 7L, "purchase"), (2L, 30L, 8L, "click"),
      (3L, 10L, 9L, "view"), (3L, 20L, 10L, "click"),
      (3L, 30L, 11L, "purchase"),
      (4L, 10L, 12L, "signup"), (4L, 10L, 13L, "view"),
      (4L, 10L, 14L, "click"), (4L, 10L, 15L, "purchase"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.funnel(ev, Seq("user_id"), "ts", "event_id",
        "event_type", Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 3 -> 1L, 4 -> 2L), s"got $got")
  }

  test("funnel maxGap: a stage landing outside the window doesn't convert") {
    // u1 converts fully with gaps of 5 (within gap 10); u2's click comes 11
    // units after the first view — outside the bound, so it stalls at 2
    // even though a later purchase would chain from it; u3 shows the gap is
    // measured from the FIRST valid completion (view at t=20 sets the
    // anchor; the t=35 click misses the 10-unit window even though a second
    // view at t=30 would have been close enough).
    val ev = Seq(
      (1L, 10L, 1L, "signup"), (1L, 15L, 2L, "view"),
      (1L, 20L, 3L, "click"), (1L, 25L, 4L, "purchase"),
      (2L, 10L, 5L, "signup"), (2L, 15L, 6L, "view"),
      (2L, 26L, 7L, "click"), (2L, 27L, 8L, "purchase"),
      (3L, 10L, 9L, "signup"), (3L, 20L, 10L, "view"),
      (3L, 30L, 11L, "view"), (3L, 35L, 12L, "click"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.funnel(ev, Seq("user_id"), "ts", "event_id",
        "event_type", Seq("signup", "view", "click", "purchase"),
        maxGapSec = Some(10L))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(4 -> 1L, 2 -> 2L), s"got $got")
  }

  test("funnel maxGap: fractional numeric times are compared un-truncated") {
    // True gap 2.95 - 1.9 = 1.05 > 1: a long-cast of the times (1 and 2)
    // would wrongly pass the gate.
    val ev = Seq((1L, 1.9, 1L, "a"), (1L, 2.95, 2L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.funnel(ev, Seq("user_id"), "ts", "event_id",
        "event_type", Seq("a", "b"), maxGapSec = Some(1L))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L), s"got $got")
  }

  test("funnel maxGap: rejects time columns without arithmetic (string)") {
    val ev = Seq((1L, "2024-01-01", 1L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, Seq("user_id"), "ts", "event_id", "event_type",
        Seq("a", "b"), maxGapSec = Some(1L))
    }
    // …but the unbounded form never does time arithmetic, so any orderable
    // column (string dates included) still works.
    val ok = Analytics.funnel(ev, Seq("user_id"), "ts", "event_id",
        "event_type", Seq("a", "b"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ok == Map(1 -> 1L))
  }

  test("funnel: all four stage windows share one exchange and one sort") {
    val df = Analytics.queries("q69_funnel")(spark, sf0001)
    df.collect()
    // AQE prints Final AND Initial plans — count only the final one.
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // Chained running-max flags must not re-shuffle or re-sort per stage:
    // one hashpartitioning(user_id, day) exchange and one Sort beneath the
    // Window stack (the other exchanges belong to the two downstream aggs).
    val windowSorts = "Sort \\[user_id".r.findAllIn(p).size
    assert(windowSorts == 1, s"expected 1 window sort, got $windowSorts:\n$p")
    val partExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(partExchanges == 1,
      s"expected 1 key exchange for the funnel windows, got $partExchanges:\n$p")
  }

  // ------------------------------------------------------------- upsert --

  test("sessionize: gap splits, boundary gap does NOT split, ids restart per user") {
    import spark.implicits._
    // user 1: events at 0s, 60s, 1860s (gap exactly 30min → SAME session,
    // the split needs gap > threshold), 3700s (> 30min after → new session).
    // user 2: one event → one singleton session.
    val ev = Seq(
      (1L, 10L, 0L), (1L, 11L, 60L), (1L, 12L, 1860L), (1L, 13L, 5561L),
      (2L, 20L, 0L)
    ).toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"))
    val got = Analytics.sessionize(ev, "user_id", "ts", "event_id")
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 0L, 1860000000L, 1860000000L),
      (1L, 2L, 1L, 5561000000L, 5561000000L, 0L),
      (2L, 1L, 1L, 0L, 0L, 0L)), s"got ${got.toSeq}")
  }

  test("transitionMatrix: counts/probabilities on a hand fixture; ts then id order") {
    import spark.implicits._
    // user 1 path: a→b→a→c (same ts for b/a at 20 — event_id breaks the
    // tie, so the pair is b→a, not a→b twice). user 2 path: a→b.
    // Singleton user 3 contributes nothing.
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 20L, "a"),
      (1L, 4L, 30L, "c"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "b"),
      (3L, 7L, 10L, "z"),
    ).toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val got = Analytics.transitionMatrix(ev, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // From a: →b twice (u1 first hop, u2). From b: →a once (tie-break),
    // from a: →c once. So a→b 2 of 3 a-transitions, a→c 1 of 3, b→a 1 of 1.
    assert(got == Map(
      ("a", "b") -> (2L, 0.666667), ("a", "c") -> (1L, 0.333333),
      ("b", "a") -> (1L, 1.0)), s"got $got")
  }

  test("hllSketch: estimator within 3 standard errors at n >> m") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => ("g", s"v$i")).toDF("g", "v")
    val est = Analytics.hllSketch(df, "g", "v").head().getDouble(3)
    val se = 1.04 / math.sqrt(Analytics.HllRegisters.toDouble)
    assert(math.abs(est - n) / n < 3 * se, s"est $est vs exact $n")
  }

  test("hllSketch: duplicate-insensitive (max-register idempotence), no distinct pass") {
    import spark.implicits._
    val base = (1 to 400).map(i => ("g", s"v${i % 57}")).toDF("g", "v")
    val dup = base.union(base).union(base)
    val a = Analytics.hllSketch(base, "g", "v").head()
    val b = Analytics.hllSketch(dup, "g", "v").head()
    // Identical register state, not merely a close estimate.
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2) &&
      a.getDouble(3) == b.getDouble(3))
    // And the plan really has no deduplicating exchange before the hash:
    // exactly the two aggregate exchanges (group,reg) then (group).
    val plan = Analytics.hllSketch(base, "g", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("distinct"), plan)
  }

  test("hllSketch: small-range linear counting lands near tiny exact counts") {
    import spark.implicits._
    val df = Seq(("g", "x"), ("g", "y"), ("g", "z")).toDF("g", "v")
    val est = Analytics.hllSketch(df, "g", "v").head().getDouble(3)
    // 256·ln(256/253) = 3.018 — the raw estimator would report ~2.16×m/…
    // biased high; linear counting must land within half a unit.
    assert(math.abs(est - 3.0) < 0.5, s"est $est")
  }

  test("aggState: merging any 3-way split reproduces the single-pass state") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 900).map(i => (i, (i % 7).toLong, rnd.nextDouble() * 1000.0))
    val df = rows.toDF("i", "k", "v")
    val whole = Analytics.aggState(df, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> r).toMap
    // three disjoint batches, merged left-associatively
    val parts = (0 until 3).map(p =>
      Analytics.aggState(df.filter(col("i") % 3 === p), Seq("k"), "v"))
    val merged = parts.reduce((a, b) => Analytics.mergeAggStates(a, b, Seq("k")))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(merged.keySet == whole.keySet)
    merged.foreach { case (k, m) =>
      val w = whole(k)
      assert(m.getLong(1) == w.getLong(1), s"cnt drift at k=$k")   // exact
      assert(m.getDouble(3) == w.getDouble(3), s"min drift at k=$k") // exact
      assert(m.getDouble(4) == w.getDouble(4), s"max drift at k=$k") // exact
      assert(math.abs(m.getDouble(2) - w.getDouble(2)) <=
        1e-9 * math.abs(w.getDouble(2)), s"sum drift at k=$k") // assoc-only
    }
  }

  test("mergeLatest: latest version wins; updates beat base on exact ties") {
    val base = Seq((1L, 10L, 100L, "b1"), (2L, 10L, 101L, "b2"),
      (3L, 30L, 102L, "b3")).toDF("k", "v", "seq", "payload")
    val upd = Seq((1L, 10L, 100L, "u1"), (2L, 20L, 103L, "u2"),
      (3L, 10L, 104L, "u3"), (4L, 5L, 105L, "u4"))
      .toDF("k", "v", "seq", "payload")
    // k=1: identical (v, seq) → update wins; k=2: update is newer; k=3:
    // base is newer; k=4: insert (update only).
    val got = Analytics.mergeLatest(base, upd, Seq("k"), Seq("v", "seq"))
      .select("k", "payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "u1", 2L -> "u2", 3L -> "b3", 4L -> "u4"),
      s"got $got")
  }

  test("mergeLatest: exactly one row per key, schema = input + _src") {
    val out = Analytics.queries("q73_merge_upsert")(spark, sf001)
    val keys = out.select("user_id", "event_type")
    assert(keys.count() == keys.distinct().count())
  }

  // ---------------------------------------------------------------- KMV --

  test("kmvDistinct: estimator within 3 standard errors; exact when n <= k") {
    val ev = Tables.events(spark, sf001)
    val k = 32
    val rows = Analytics.kmvDistinct(ev, "event_type", "user_id", k)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact").toDouble,
        r.getAs[Double]("kmv_est"))
      if (r.getAs[Int]("k_used") < k) assert(est == exact)
      else {
        // KMV relative std error ≈ 1/sqrt(k-2); 3σ bound.
        val relErr = math.abs(est - exact) / exact
        assert(relErr < 3.0 / math.sqrt(k - 2.0),
          s"${r.getString(0)}: est $est vs exact $exact (relErr $relErr)")
      }
    }
  }

  test("kmvDistinct: sketch is mergeable — union re-sketch == whole sketch") {
    val ev = Tables.events(spark, sf001)
    // Split the input arbitrarily, sketch halves, merge by re-taking min-k
    // over the union of survivors: kth_min must equal the whole-input kth_min
    // (survivor sets contain each side's k smallest, so the union holds the
    // global k smallest — the KMV merge invariant).
    val k = 32
    val halves = Seq(ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1))
    val partials = halves.map { h =>
      val du = h.select(col("event_type"), col("user_id")).distinct()
        .withColumn("hv", expr(
          "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"))
      du.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("hv")))
        .filter(col("rn") <= k).select("event_type", "hv")
    }
    val merged = partials.reduce(_ unionByName _).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("hv")))
      .filter(col("rn") <= k)
      .groupBy("event_type").agg(max("hv").as("kth_min"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Analytics.kmvDistinct(ev, "event_type", "user_id", k)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kth_min")).toMap
    assert(merged == whole, s"merged $merged vs whole $whole")
  }

  test("kmvSketch: sketch-only columns agree with the comparison harness") {
    val ev = Tables.events(spark, sf001)
    val k = 32
    // The production operator must carry NO exact-count leg…
    val sk = Analytics.kmvSketch(ev, "event_type", "user_id", k)
    assert(sk.columns.toSeq == Seq("event_type", "k_used", "kth_min", "kmv_est"))
    // …structurally: the exact leg can only re-enter as a second aggregate
    // over the full distinct set JOINED back to the sketch (kmvDistinct's
    // shape) — so the sketch-only plan must be join-free.
    sk.collect()
    val plan = sk.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"kmvSketch grew an exact-leg join:\n$plan")
    val skRows = sk.collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    val cmp = Analytics.kmvDistinct(ev, "event_type", "user_id", k).collect()
      .map(r => r.getString(0) -> (r.getAs[Int]("k_used"),
        r.getAs[Long]("kth_min"), r.getAs[Double]("kmv_est"))).toMap
    assert(skRows == cmp)
  }

  test("kmvSketch: exact (== k_used) below k, no n_exact dependency") {
    val df = Seq.tabulate(5)(i => ("g", i.toLong)).toDF("g", "v")
    val r = Analytics.kmvSketch(df, "g", "v", k = 8).head()
    assert(r.getAs[Int]("k_used") == 5 && r.getAs[Double]("kmv_est") == 5.0)
  }

  test("kmvDistinct: NULL values are excluded, not hashed into the min-k") {
    val df = Seq((Some("a"), Some(1L)), (Some("a"), None),
      (Some("a"), Some(2L)), (Some("a"), Some(3L))).toDF("g", "v")
    val r = Analytics.kmvDistinct(df, "g", "v", k = 8).head()
    // 3 non-null distinct values; a hashed NULL would make it 4 (or poison
    // kth_min with a null-first sort artifact).
    assert(r.getAs[Long]("n_exact") == 3L && r.getAs[Int]("k_used") == 3)
    assert(r.getAs[Double]("kmv_est") == 3.0)
  }

  test("q68 plan: row_number <= k compiles to a WindowGroupLimit partial") {
    val p = Analytics.queries("q68_kmv_distinct")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no partial top-k pushdown:\n$p")
  }

  // --------------------------------------------------------- table diff --

  test("tableDiff: added/removed/changed/unchanged, null-safe comparison") {
    val a = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None),
      (4L, Some(40.0))).toDF("k", "v")
    val b = Seq((1L, Some(10.0)), (2L, Some(21.0)), (3L, None),
      (5L, Some(50.0))).toDF("k", "v")
    // k=1 unchanged; k=2 changed; k=3 unchanged (null <=> null must NOT
    // classify as changed); k=4 removed; k=5 added.
    val got = Analytics.tableDiff(a, b, Seq("k"), Seq("v"))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"), s"got $got")
  }

  test("tableDiff plan: one join, no subquery-per-column") {
    val df = Analytics.queries("q76_table_diff")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("FullOuter".r.findAllIn(p).size == 1,
      s"expected exactly one full-outer join (no per-column subqueries):\n$p")
  }

  // --------------------------------------------------------------- scd2 --

  test("scd2: run collapse, interval stitching, null values form runs") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val df = Seq(
      (1L, t(0), 1L, "a"), (1L, t(10), 2L, "a"), (1L, t(20), 3L, "b"),
      (1L, t(30), 4L, "a"),
      (2L, t(0), 5L, null), (2L, t(10), 6L, null), (2L, t(20), 7L, "x"))
      .toDF("k", "ts", "id", "v")
    val got = Analytics.scd2(df, "k", "ts", "id", "v")
      .orderBy("k", "run")
      .select("k", "run", "v", "valid_from_us", "valid_to_us", "n_events",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
      .toSeq
    val M = 1000000L
    assert(got == Seq(
      (1L, 1L, "a", 0L, 20 * M, 2L, false),
      (1L, 2L, "b", 20 * M, 30 * M, 1L, false),
      (1L, 3L, "a", 30 * M, -1L, 1L, true),
      (2L, 1L, null, 0L, 20 * M, 2L, false),
      (2L, 2L, "x", 20 * M, -1L, 1L, true)), s"got ${got.mkString("; ")}")
    // Intervals tile each key's timeline: every valid_to == next valid_from
    // (checked above) and exactly one current row per key.
    assert(got.count(_._7) == 2)
  }

  // ------------------------------------------------------------ skyline --

  test("skyline: equals brute-force strict domination; ties kept; group-count invariant") {
    val rows = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 9), (4L, 12.0, 9),
      (5L, 8.0, 3), (6L, 15.0, 50), (7L, 15.0, 49), (8L, 7.9, 3),
      (9L, 20.0, 50))
    val df = rows.toDF("id", "price", "size")
    val expect = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y) }
    }.map(_._1).toSet
    // (3) frontier at 10/9; (1)(2) dominated by (3); (5) dominated by (8);
    // (6) frontier; (7) dominated by (6); (8) frontier; (9) dominated by
    // (6). Ties on a frontier POINT are kept, dominated ties are not.
    assert(expect == Set(3L, 6L, 8L), "fixture sanity")
    for (groups <- Seq(1, 2, 64)) {
      val got = Analytics.skyline(df, "price", "size", numGroups = groups)
        .select("id").as[Long].collect().toSet
      assert(got == expect, s"numGroups=$groups: $got vs $expect")
    }
    // Equal-point frontier ties are ALL emitted.
    val tied = (rows :+ (10L, 7.9, 3)).toDF("id", "price", "size")
    val gotTied = Analytics.skyline(tied, "price", "size")
      .select("id").as[Long].collect().toSet
    assert(gotTied == Set(3L, 6L, 8L, 10L), s"got $gotTied")
  }

  // ------------------------------------------------- histogram quantiles --

  test("histogramQuantiles: hand replay; within one bin width of exact percentile") {
    val df = (0 until 100).map(_.toDouble).toDF("x")
    // 10 bins of width 10, 10 values each: r = p*100 lands in the bin whose
    // cumulative first reaches it; interpolation is exact on this uniform
    // fixture.
    val got = Analytics.histogramQuantiles(df, "x", 0.0, 10.0, 10,
      Seq(0.5, 0.99)).orderBy("p").collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0.5, 4, 50.0), (0.99, 9, 99.0)), got.mkString(";"))
    // Real-data sanity: estimate within one bin width of the exact
    // percentile (the documented resolution bound).
    val li = Tables.lineitem(spark, sf001)
    val est = Analytics.histogramQuantiles(li, "l_extendedprice",
      0.0, 5000.0, 20, Seq(0.5, 0.95)).orderBy("p")
      .collect().map(r => r.getDouble(2))
    val exact = li.selectExpr(
      "percentile(l_extendedprice, 0.5)", "percentile(l_extendedprice, 0.95)")
      .head()
    for (i <- 0 to 1)
      assert(math.abs(est(i) - exact.getDouble(i)) <= 5000.0,
        s"p-idx $i: est ${est(i)} vs exact ${exact.getDouble(i)}")
    // Clamp semantics: out-of-range values land in the edge bins and the
    // quantile walk still covers the full mass.
    val clamped = Analytics.histogramQuantiles(
      Seq(-100.0, 1.0, 2.0, 1e9).toDF("x"), "x", 0.0, 1.0, 4, Seq(1.0))
      .head()
    assert(clamped.getInt(1) == 3, "p=1 must land in the last bin")
  }

  // ---------------------------------------------------------- histogram --

  test("histogram: bins partition the input; out-of-range values clamp") {
    val df = Seq(-5.0, 0.0, 4.9, 5.0, 14.9, 99.0, 1e9)
      .toDF("x")
    val got = Analytics.histogram(df, "x", 0.0, 5.0, 4)
      .select("bin", "n").as[(Int, Long)].collect().toMap
    // -5 clamps into bin 0; 1e9 and 99 clamp into the last bin (3).
    assert(got == Map(0 -> 3L, 1 -> 1L, 2 -> 1L, 3 -> 2L), s"got $got")
    val total = Analytics.histogram(Tables.lineitem(spark, sf001),
      "l_extendedprice", 0.0, 5000.0, 20).agg(sum("n")).head().getLong(0)
    assert(total == Tables.lineitem(spark, sf001).count())
  }

  // -------------------------------------------------------- concurrency --

  test("intervalConcurrency: sweep counts overlaps; closed-interval bounds") {
    // Bucket size 100. [0,50] and [50,120] overlap AT 50 (closed ends →
    // peak 2 in bucket 0); [110,130] overlaps [50,120] in bucket 1 (peak
    // 2); [400,410] sits alone in bucket 4 — and bucket 2/3 emit nothing
    // (no change points there).
    val iv = Seq((0L, 50L), (50L, 120L), (110L, 130L), (400L, 410L))
      .toDF("s", "e")
    val got = Analytics.intervalConcurrency(iv, "s", "e", 100L)
      .select("bucket_us", "peak").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 100L -> 2L, 400L -> 1L), s"got $got")
  }

  test("intervalConcurrency: two-level prefix sum equals the naive sweep") {
    val sess = Analytics.sessionize(
      Tables.events(spark, sf001), "user_id", "ts", "event_id")
    val got = Analytics.intervalConcurrency(sess, "start_us", "end_us")
      .select("bucket_us", "peak", "n_changes")
      .as[(Long, Long, Long)].collect().map { case (k, p, n) => k -> (p, n) }.toMap
    // Naive single-window form: one global running sum, no bucket split.
    val deltas = sess.select(col("start_us").as("ts"), lit(1L).as("d"))
      .unionAll(sess.select((col("end_us") + 1L).as("ts"), lit(-1L).as("d")))
      .groupBy("ts").agg(sum("d").as("d"))
    val wAll = Window.orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = deltas.withColumn("conc", sum(col("d")).over(wAll))
      .groupBy(expr("ts div 3600000000 * 3600000000").as("bucket_us"))
      .agg(max("conc").as("peak"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().map { case (k, p, n) => k -> (p, n) }.toMap
    assert(got == naive)
    // Every interval opens and closes: the final running concurrency is 0.
    val totalDelta = deltas.agg(sum("d")).head().getLong(0)
    assert(totalDelta == 0L)
  }

  // -------------------------------------------------------------- trend --

  test("groupedTrend: exact fit on collinear points; degenerate groups drop") {
    // g1: y = 3x + 10 exactly (r2 = 1); g2: zero x-variance → null slope,
    // dropped; g3: a single point → n < 2, dropped.
    val df = Seq(
      ("g1", 1.0, 13.0), ("g1", 2.0, 16.0), ("g1", 3.0, 19.0),
      ("g2", 5.0, 1.0), ("g2", 5.0, 2.0),
      ("g3", 7.0, 7.0),
    ).toDF("g", "x", "y")
    val rows = Analytics.groupedTrend(df, "g", "x", "y").collect()
    assert(rows.length == 1, s"got ${rows.toSeq}")
    val r = rows.head
    assert(r.getString(0) == "g1" && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 10.0 &&
      r.getDouble(4) == 1.0, s"got $r")
  }

  // ----------------------------------------------------------- outliers --

  test("groupZScoreOutliers: flags the planted outlier, not the bulk") {
    // g1: nine 10s and one 1000 — the 1000 is ~3σ out (z = 9/sqrt(9.9) ≈
    // 2.86 with pop stddev... use z=2 to be safely inside); g2 constant →
    // sd = 0, whole group exempt (no division, no rows).
    val df = (Seq.fill(9)(("g1", 10.0)) ++ Seq(("g1", 1000.0)) ++
      Seq.fill(5)(("g2", 42.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = Analytics.groupZScoreOutliers(df, "g", "v", 2.0)
      .select("id", "v").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((9L, 1000.0)), s"got ${got.toSeq}")
    // Two-pass shape: the stats side must be a broadcast join, not a
    // group-partitioned window (skew posture at 100 TB).
    val plan = Analytics.groupZScoreOutliers(df, "g", "v", 2.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("resampleLocf: dense grid, LOCF across gaps, exact decimal sums") {
    import java.sql.Timestamp
    val rows = Seq(
      ("k", Timestamp.valueOf("2024-01-01 00:10:00"), 1.25),
      ("k", Timestamp.valueOf("2024-01-01 00:40:00"), 2.50),
      ("k", Timestamp.valueOf("2024-01-01 03:05:00"), 10.00),
      ("solo", Timestamp.valueOf("2024-01-02 07:30:00"), 7.77)
    ).toDF("key", "ts", "v")
    val out = Analytics.resampleLocf(rows, "key", "ts", "v")
      .orderBy(col("key"), col("bucket")).collect()
    val k = out.filter(_.getString(0) == "k")
    assert(k.length == 4, "grid must span hours 00..03 densely")
    assert(k.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(k.map(_.getBoolean(5)).toSeq == Seq(false, true, true, false))
    // exact decimal: 1.25 + 2.50 = 3.75 carried through both gap hours
    assert(k.map(r => Option(r.getDecimal(4)).map(_.toPlainString).orNull).toSeq ==
      Seq("3.75", "3.75", "3.75", "10.00"))
    assert(k.map(r => Option(r.getDecimal(3)).map(_.toPlainString)).toSeq ==
      Seq(Some("3.75"), None, None, Some("10.00")))
    val solo = out.filter(_.getString(0) == "solo")
    assert(solo.length == 1 && !solo.head.getBoolean(5)
      && solo.head.getDecimal(4).toPlainString == "7.77")
  }

  test("psi: identical distributions score 0; shifted mass produces the textbook terms") {
    import spark.implicits._
    // identical samples -> every p0 = p1 -> all terms 0, total 0
    val same = (1 to 10).flatMap(i => Seq((0L, i.toDouble), (1L, i.toDouble)))
    val s0 = Analytics.psi(same.toDF("a", "v"), col("a") === 1, "v", bins = 5)
      .collect()
    assert(s0.forall(r => r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0),
      s"identical samples must give PSI 0: ${s0.toSeq}")
    // arm1 shifts all mass to the top half: hand-compute one term
    val shifted = ((1 to 8).map(i => (0L, i.toDouble)) ++
      (5 to 8).map(i => (1L, i.toDouble))).toDF("a", "v")
    val out = Analytics.psi(shifted, col("a") === 1, "v", bins = 2)
      .orderBy(col("bin")).collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bin0: p0=0.5, p1=1e-6; bin1: p0=0.5, p1=1.0
    val t0 = r6((1e-6 - 0.5) * math.log(1e-6 / 0.5))
    val t1 = r6((1.0 - 0.5) * math.log(1.0 / 0.5))
    assert(out.map(_.getDouble(5)).toSeq == Seq(t0, t1),
      s"terms diverged: ${out.toSeq}; want $t0, $t1")
    assert(out.forall(_.getDouble(6) == r6(t0 + t1)))
  }

  test("ksTest: hand-computed sup and location; identical samples give 0") {
    import spark.implicits._
    // arm0 = {1,2,3,4}, arm1 = {3,4,5,6}: ECDF gap peaks at v=2
    // (F0=0.5, F1=0) and stays 0.5 through v in [2,4); sup located at the
    // SMALLEST v attaining it (tie-break).
    val rows = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0), (0L, 4.0),
      (1L, 3.0), (1L, 4.0), (1L, 5.0), (1L, 6.0))
    val out = Analytics.ksTest(rows.toDF("a", "v"), col("a") === 1, "v").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      (4L, 4L, 2.0, 0.5), s"KS replay diverged: $r")
    // identical samples -> D = 0 (any location)
    val same = Seq((0L, 1.0), (0L, 2.0), (1L, 1.0), (1L, 2.0)).toDF("a", "v")
    val s2 = Analytics.ksTest(same, col("a") === 1, "v").collect().head
    assert(s2.getDouble(3) == 0.0, s"identical samples must give D=0: $s2")
  }

  test("welchTest: hand-computed t and df; per-unit sums; degenerate NULL") {
    import spark.implicits._
    // arm 0 metric sums per unit: {1, 2, 3}; arm 1: {4, 6} (unit 12's
    // metric arrives as two rows 2+4 -> per-unit sum first)
    val rows = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0),
      (11L, 4.0), (12L, 2.0), (12L, 4.0))
    val out = Analytics.welchTest(rows.toDF("u", "v"),
      (col("u") >= 10).cast("long"), "u", "v")
      .orderBy(col("arm")).collect()
    val (m0, v0, n0) = (2.0, 1.0, 3)
    val (m1, v1, n1) = (5.0, 2.0, 2)
    val se2 = v0 / n0 + v1 / n1
    val t = (m1 - m0) / math.sqrt(se2)
    val dfW = se2 * se2 / (math.pow(v0 / n0, 2) / (n0 - 1) + math.pow(v1 / n1, 2) / (n1 - 1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((3L, 2.0), (2L, 5.0)))
    assert(out.forall(r => r.getDouble(4) == r6(t) && r.getDouble(5) == r6(dfW)),
      s"Welch stats diverged: ${out.toSeq}; want t=${r6(t)}, df=${r6(dfW)}")
    // both arms constant -> zero pooled variance -> NULL t/df
    val const = Seq((1L, 5.0), (2L, 5.0), (11L, 5.0), (12L, 5.0)).toDF("u", "v")
    val c = Analytics.welchTest(const, (col("u") >= 10).cast("long"), "u", "v").collect()
    assert(c.forall(r => r.isNullAt(4) && r.isNullAt(5)),
      s"zero-variance arms must NULL the test: ${c.toSeq}")
  }

  test("calibrationBins: edges clamp, degenerate range, exact rates") {
    import spark.implicits._
    // scores 0..10 over 2 bins: [0,5) -> bin0 (0..4), [5,10] -> bin1
    // (5..10, max clamps); positives = score >= 8.
    val df = (0 to 10).map(i => (i.toDouble, i >= 8)).toDF("s", "y")
    val out = Analytics.calibrationBins(df, "s", col("y"), bins = 2)
      .orderBy(col("bin")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toList == List((0, 5L, 0L, 2.0, 0.0), (1, 6L, 3L, 7.5, 0.5)),
      s"calibration replay diverged: ${out.toList}")
    // constant score -> single bin 0, no division by zero width
    val const = Seq((1.0, true), (1.0, false)).toDF("s", "y")
    val c = Analytics.calibrationBins(const, "s", col("y")).collect()
    assert(c.length == 1 && c.head.getInt(0) == 0 && c.head.getDouble(4) == 0.5)
  }

  test("abTest: hand-computed lift and z; events dedup per unit; saturated z is NULL") {
    import spark.implicits._
    // arm 0: 4 units, 1 converted; arm 1: 4 units, 3 converted (unit 11
    // converts via its SECOND event -> per-unit max, not event counts).
    val rows = Seq((1L, false), (2L, false), (3L, false), (4L, true),
      (11L, false), (11L, true), (12L, true), (13L, true), (14L, false))
    val df = rows.toDF("u", "conv")
    val out = Analytics.abTest(df, (col("u") >= 10).cast("long"), "u", col("conv"))
      .orderBy(col("arm")).collect()
    val p0 = 1.0 / 4; val p1 = 3.0 / 4; val pooled = 4.0 / 8
    val z = (p1 - p0) / math.sqrt(pooled * (1 - pooled) * (1.0 / 4 + 1.0 / 4))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.25, 0.75))
    assert(out.forall(r => r.getDouble(4) == 0.5 && r.getDouble(5) == r6(z)),
      s"stats diverged: ${out.toSeq}, want z=${r6(z)}")
    // all units converted -> pooled rate 1 -> z undefined, lift still 0
    val sat = Seq((1L, true), (2L, true)).toDF("u", "conv")
    val satOut = Analytics.abTest(sat, col("u") % 2, "u", col("conv")).collect()
    assert(satOut.forall(r => r.isNullAt(5) && r.getDouble(4) == 0.0),
      s"saturated pool must NULL the z: ${satOut.toSeq}")
  }

  test("eventCadence: gaps stay within (user, type); hand-computed median") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      // u1 type a at 0, 1, 3 -> gaps 60s, 120s; u2 type a at 0, 5 -> 300s
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "a"), (3L, ts(3), 1L, "a"),
      (4L, ts(0), 2L, "a"), (5L, ts(5), 2L, "a"),
      // u1 type b interleaved must NOT break type-a gaps; single b -> no gap
      (6L, ts(2), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.eventCadence(rows, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toList
    // type-a gaps {60, 120, 300}s -> median 120s; type b contributes none
    assert(out == List(("a", 3L, 120e6)), s"cadence replay diverged: $out")
  }

  test("funnelLatency: hand-computed gaps; gated stage order; non-completers drop") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      // u1: a@0 b@1 c@3 -> a>b gap 60s, b>c gap 120s
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"), (3L, ts(3), 1L, "c"),
      // u2: b BEFORE a never counts (ordered gating); a@2 b@4 -> gap 120s
      (4L, ts(0), 2L, "b"), (5L, ts(2), 2L, "a"), (6L, ts(4), 2L, "b"),
      // u3: a only -> contributes no gaps
      (7L, ts(0), 3L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.funnelLatency(rows, Seq("user_id"), "ts", "event_id",
      "event_type", Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4))).sortBy(_._1).toList
    // a>b latencies: u1 60s, u2 120s -> median 90s (micros)
    assert(out == List(("a", "b", 2L, 90e6), ("b", "c", 1L, 120e6)),
      s"latency replay diverged: $out")
  }

  test("benford: perfect Benford sample scores MAD 0; missing digits count") {
    import spark.implicits._
    // 1000 values distributed exactly per Benford (301, 176, 125, 97, 79,
    // 67, 58, 51, 46 ≈ round(1000·log10(1+1/d))): shares equal the
    // expectation to < 5e-4, so MAD < 5e-4 — near-conformance.
    val benfordCounts = (1 to 9).map(d => d -> math.round(1000 * math.log10(1 + 1.0 / d)).toInt)
    val good = benfordCounts.flatMap { case (d, c) =>
      Seq.fill(c)(("good", d * 100.0 + 1)) }
    // "bad": every value starts with digit 9 -> 8 missing digits must
    // still appear as spine rows with share 0 and full deviation.
    val bad = Seq.fill(50)(("bad", 900.0))
    val out = Analytics.benford((good ++ bad).toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(5)))
    val goodMad = out.filter(_._1 == "good").head._4
    assert(goodMad < 5e-4, s"Benford-shaped sample must conform, MAD=$goodMad")
    val badRows = out.filter(_._1 == "bad")
    assert(badRows.length == 9 && badRows.count(_._3 == 0L) == 8,
      s"missing digits must appear with n=0: ${badRows.toSeq}")
    assert(badRows.head._4 > 0.015, "all-9s sample must flag nonconformance")
  }

  test("abTest/welchTest: a missing arm keeps the present arm's row with NULL stats") {
    import spark.implicits._
    val oneArm = Seq((1L, true), (2L, false), (3L, true)).toDF("u", "conv")
    val ab = Analytics.abTest(oneArm, lit(0L), "u", col("conv")).collect()
    assert(ab.length == 1 && ab.head.getLong(1) == 3L && ab.head.isNullAt(5),
      s"single-arm abTest must keep the arm row and NULL z: ${ab.toSeq}")
    val wt = Analytics.welchTest(Seq((1L, 2.0), (2L, 4.0)).toDF("u", "v"),
      lit(0L), "u", "v").collect()
    assert(wt.length == 1 && wt.head.getLong(1) == 2L && wt.head.isNullAt(4),
      s"single-arm welchTest must keep the arm row and NULL t: ${wt.toSeq}")
  }

  test("groupedAuc: perfect separation, tie handling, single-class NULL") {
    import spark.implicits._
    val rows =
      // g1: pos {3,4} above neg {1,2} -> AUC 1.0
      Seq(("g1", 1.0, false), ("g1", 2.0, false), ("g1", 3.0, true), ("g1", 4.0, true),
        // g2: pos {2,3}, neg {1,2}: wins 3, tie 0.5 of 4 pairs -> 0.875
        ("g2", 1.0, false), ("g2", 2.0, false), ("g2", 2.0, true), ("g2", 3.0, true),
        // g3: only negatives -> undefined
        ("g3", 1.0, false), ("g3", 2.0, false))
    val out = Analytics.groupedAuc(rows.toDF("g", "score", "lab"),
      "g", "score", col("lab")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out("g1") == Some(1.0), s"perfect ranking must score 1.0: $out")
    assert(out("g2") == Some(0.875), s"tied pair must count half: $out")
    assert(out("g3").isEmpty, "single-class group must emit NULL")
  }

  test("targetEncode: out-of-fold means replayed in Scala; smoothing pulls to global") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd",
      i.toDouble)).toDF("id", "cat", "t")
    // recover each row's fold through the same published md5 contract
    val folds = df.selectExpr("id", "cat", "t",
      s"pmod(${graft.operators.CrossHash.h60Expr("id")}, 5) as fold")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val gm = folds.map(_._3).sum / folds.length
    def expected(cat: String, fold: Long): Double = {
      val inCat = folds.filter(_._2 == cat)
      val oof = inCat.filter(_._4 != fold)
      val e = (oof.map(_._3).sum + 20 * gm) / (oof.length + 20)
      BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Analytics.targetEncode(df, "cat", "id", "t")
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got.nonEmpty && got.forall { case ((c, f), (enc, n)) =>
      math.abs(enc - expected(c, f.toLong)) < 1e-6 &&
        n == folds.count(r => r._2 == c && r._4 != f.toLong)
    }, s"OOF encoding replay diverged: $got")
    // heavy prior crushes category signal toward the global mean
    val heavy = Analytics.targetEncode(df, "cat", "id", "t",
      priorWeight = 1000000).collect().map(_.getDouble(2))
    assert(heavy.forall(e => math.abs(e - gm) < 0.1),
      "priorWeight >> n must pull encodings to the global mean")
  }

  test("activeUsers: WAU carries 7 days, dead days stay in the spine, edge clips") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")
    // u1 on day 1 (twice — must dedup), u2 on day 3, u1 again on day 10
    val df = Seq((1L, t(1)), (1L, t(1)), (2L, t(3)), (1L, t(10)))
      .toDF("user_id", "ts")
    val out = Analytics.activeUsers(df, "user_id", "ts")
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toList
    assert(out.length == 10, "spine must span days 1..10 only (clip at max)")
    val byDay = out.map(r => r._1.takeRight(2).toInt -> (r._2, r._3)).toMap
    assert(byDay(1) == (1L, 1L) && byDay(3) == (1L, 2L),
      s"day-3 WAU must include u1 (day 1) + u2: $out")
    assert(byDay(7) == (0L, 2L) && byDay(8) == (0L, 1L),
      "u1's day-1 activity must leave WAU after day 7; u2 after day 9")
    assert(byDay(2) == (0L, 1L), "dead day keeps spine row with DAU 0")
    assert(byDay(9) == (0L, 1L) && byDay(10) == (1L, 1L),
      "u2 expires after day 9; day 10 holds only the returning u1")
  }

  test("equalFreqBins: ntile fill order, deterministic edge ties, exact decimal mass") {
    import spark.implicits._
    // 7 values, 3 bins -> sizes 3,2,2; the duplicate 2.0 values at the
    // bin-1/bin-2 edge must split by id (ids 3 then 4).
    val df = Seq((1L, 1.0), (2L, 1.5), (3L, 2.0), (4L, 2.0), (5L, 3.0),
      (6L, 4.0), (7L, 5.0)).map { case (i, v) => ("k", i, v) }
      .toDF("key", "id", "v")
    val out = Analytics.equalFreqBins(df, "key", "v", "id", bins = 3)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(1), r.getLong(2),
        r.getDecimal(3).toPlainString, r.getDecimal(4).toPlainString))
    assert(out.toList == List((1L, 3L, "1.00", "2.00"), (2L, 2L, "2.00", "3.00"),
      (3L, 2L, "4.00", "5.00")), s"binning diverged: ${out.toList}")
  }

  test("madOutliers: catches the spike stddev z-scores dilute; MAD=0 groups drop") {
    import spark.implicits._
    // 12 ones + one 100: median = 1, MAD = 0 -> whole group drops (the
    // documented undefined case). With varied data: median 5, MAD 2 ->
    // only the 100 crosses 3.5.
    val const = (1L to 12L).map(i => ("const", i, 1.0)) :+ (("const", 13L, 100.0))
    val varied = Seq(1.0, 3.0, 3.0, 5.0, 5.0, 7.0, 7.0, 9.0, 100.0)
      .zipWithIndex.map { case (v, i) => ("varied", i.toLong + 1, v) }
    val out = Analytics.madOutliers((const ++ varied).toDF("k", "id", "v"),
      "k", "v", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toList == List(("varied", 9L)),
      s"expected exactly the varied-group spike: ${out.toList}")
  }

  test("sessionPaths: trigrams stop at session boundaries; (n desc, path) cut") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      // u1 session A: a b c d -> paths a>b>c, b>c>d
      (1L, ts(0), "u1", "a"), (2L, ts(1), "u1", "b"),
      (3L, ts(2), "u1", "c"), (4L, ts(3), "u1", "d"),
      // u1 session B (2h later): c d e -> c>d>e; the cross-boundary
      // trigrams (c d | c), (d | c d) must NOT appear
      (5L, Timestamp.valueOf("2024-01-01 12:30:00"), "u1", "c"),
      (6L, Timestamp.valueOf("2024-01-01 12:31:00"), "u1", "d"),
      (7L, Timestamp.valueOf("2024-01-01 12:32:00"), "u1", "e"),
      // u2 repeats a b c -> a>b>c reaches n=2
      (8L, ts(0), "u2", "a"), (9L, ts(1), "u2", "b"), (10L, ts(2), "u2", "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Analytics.sessionPaths(rows, "user_id", "ts", "event_id",
      "event_type", k = 2).collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("a>b>c", 2L), ("b>c>d", 1L)),
      s"path mining diverged: $got")
    val all = Analytics.sessionPaths(rows, "user_id", "ts", "event_id",
      "event_type").collect().map(_.getString(0)).toSet
    assert(all == Set("a>b>c", "b>c>d", "c>d>e"),
      s"cross-boundary paths must be excluded: $all")
  }

  test("seasonalDecompose: flat series is pure trend; identity holds exactly; gaps zero-fill") {
    import spark.implicits._
    import java.sql.Timestamp
    // key "flat": constant 5.00/hour for 48h -> trend = 5, seasonal = 0,
    // remainder = 0 everywhere. key "gap": hours 0 and 2 only -> hour 1
    // zero-fills (NOT LOCF).
    val rows = (0 until 48).map(h =>
      ("flat", Timestamp.valueOf(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:30:00"), 5.0)) ++
      Seq(("gap", Timestamp.valueOf("2024-01-01 00:10:00"), 9.0),
        ("gap", Timestamp.valueOf("2024-01-01 02:10:00"), 3.0))
    val out = Analytics.seasonalDecompose(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .orderBy(col("k"), col("bucket")).collect()
    val flat = out.filter(_.getString(0) == "flat")
    assert(flat.length == 48)
    assert(flat.forall(r => r.getDouble(3) == 5.0 && r.getDouble(4) == 0.0
      && r.getDouble(5) == 0.0), "constant series must decompose to pure trend")
    val gap = out.filter(_.getString(0) == "gap")
    assert(gap.length == 3 && gap(1).getDouble(2) == 0.0,
      s"missing hour must zero-fill, got ${gap.toSeq}")
    // additive identity is exact by construction (decimal subtraction)
    assert(out.forall(r =>
      math.abs(r.getDouble(2) - r.getDouble(3) - r.getDouble(4) - r.getDouble(5)) < 1e-9),
      "value = trend + seasonal + remainder must hold")
  }

  test("touchAttribution: first/last split, direct fallback, session isolation, one exchange") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      // u1 session A: view -> click -> purchase (first=view, last=click)
      (1L, ts(0), "u1", "view"), (2L, ts(1), "u1", "click"),
      (3L, ts(2), "u1", "purchase"),
      // u1 session B (90 min later): bare purchase -> direct, twice
      (4L, ts(2), "u1", "purchase"), // same session A: also view/click
      (5L, Timestamp.valueOf("2024-01-01 13:00:00"), "u1", "purchase"),
      // u2: click then purchase NEXT session -> that click must not leak
      (6L, ts(0), "u2", "click"),
      (7L, Timestamp.valueOf("2024-01-01 12:00:00"), "u2", "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.touchAttribution(rows, "user_id", "ts", "event_id",
      "event_type", "purchase", Seq("view", "click"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toList
    // conversions: id3 (view/click), id4 (view/click), id5 direct, id7 direct
    assert(got == List(("click", 0L, 2L), ("direct", 2L, 2L), ("view", 2L, 0L)),
      s"attribution replay diverged: $got")
    // the session windows must ride the user-key exchange (sort only), and
    // the two-flag explode must NOT duplicate the window pipeline: exactly
    // two distinct shuffles — user key + final channels roll-up.
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = raw"Exchange hashpartitioning\(([^,)]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchanges.size <= 2,
      s"expected <= 2 distinct exchange keys (user sort + rollup), got $exchanges")
    assert("(?m)^\\s*\\+?-? ?Union".r.findFirstIn(plan).isEmpty,
      "two-flag fan-out must explode, not self-union (doubles the window pass)")
  }

  test("coOccurrence: hand replay; basket cap prunes pairs; duplicate rows collapse") {
    import spark.implicits._
    // baskets: u1 {a,b,c}, u2 {a,b}, u3 {b,c}, u4 {a} — with duplicate
    // (u1,a) rows that must collapse before counting.
    val rows = Seq(("u1", "a"), ("u1", "a"), ("u1", "b"), ("u1", "c"),
      ("u2", "a"), ("u2", "b"), ("u3", "b"), ("u3", "c"), ("u4", "a"))
    val df = rows.toDF("b", "it")
    val got = Analytics.coOccurrence(df, "b", "it")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(p => (p._1, p._2)).toList
    // marginals a=3, b=3, c=2, N=4; lift(ab)=2*4/9, lift(ac)=1*4/6, lift(bc)=2*4/6
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == List(("a", "b", 2L, r6(8.0 / 9)), ("a", "c", 1L, r6(4.0 / 6)),
      ("b", "c", 2L, r6(8.0 / 6))), s"co-occurrence replay diverged: $got")
    // cap = 2 keeps each basket's two SMALLEST items: u1 -> {a,b}, so (a,c)
    // and (b,c) lose u1's contribution and c's marginal drops to 1.
    val capped = Analytics.coOccurrence(df, "b", "it", maxItemsPerBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2)).toList
    assert(capped == List(("a", "b", 2L), ("b", "c", 1L)),
      s"cap must prune deterministically: $capped")
  }
}
