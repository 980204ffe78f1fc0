package graft

import graft.operators.{Analytics, Privacy, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed contracts for the round-11 batch operators — tiny inputs
  * where the expected output is derivable on paper, complementing the
  * DuckDB hash gate (which certifies fixture-scale agreement, not that
  * BOTH engines aren't wrong the same way). */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("cusumAlarms: closed form matches the sequential recursion and emits onsets only") {
    // One key, values 10,10,40,40,10; mu = 22.00. Deviations: -12,-12,18,18,-12.
    // P: -12,-24,-6,12,0; minP: -12,-24,-24,-24,-24; S = P - min(0,minP):
    // 0,0,18,36,12. Threshold 30 → S crosses at row 4 only (36), and row 5
    // (12) resets below — exactly one onset.
    val df = Seq((1, ts(1), 1L, 10.0), (1, ts(2), 2L, 10.0), (1, ts(3), 3L, 40.0),
      (1, ts(4), 4L, 40.0), (1, ts(5), 5L, 10.0))
      .toDF("k", "t", "id", "v")
    val out = Analytics.cusumAlarms(df, "k", "t", "id", "v", threshold = 30)
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 4L &&
      out(0).getDecimal(3).compareTo(new java.math.BigDecimal("36.00")) == 0,
      s"expected one onset at id=4 with cusum 36.00: ${out.mkString(",")}")
  }

  test("ewmaSmooth: weights halve per step and partial windows renormalize") {
    // Two points, values 1.00 then 3.00: row 1 ewma = 1.0000 (only itself);
    // row 2 ewma = (128*300 + 64*100) / (192*100) = 2.3333 (cents weights
    // 128 current + 64 lag-1, half-up at 4 dp of 7/3).
    val df = Seq((1, ts(1), 1L, 1.0), (1, ts(2), 2L, 3.0)).toDF("k", "t", "id", "v")
    val out = Analytics.ewmaSmooth(df, "k", "t", "id", "v")
      .orderBy("id").collect().map(_.getDecimal(4))
    assert(out(0).compareTo(new java.math.BigDecimal("1.0000")) == 0 &&
      out(1).compareTo(new java.math.BigDecimal("2.3333")) == 0,
      s"expected [1.0000, 2.3333]: ${out.mkString(",")}")
  }

  test("resampleInterp: a 3-hour gap interpolates the straight line, observed rows pass through") {
    // Observations at 10:00 (sum 1.00) and 14:00 (sum 3.00) → gap hours
    // 11,12,13 interpolate 1.50, 2.00, 2.50.
    def h(hh: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hh%02d:00:00")
    val df = Seq(("a", h(10), 1.0), ("a", h(14), 3.0)).toDF("k", "t", "v")
    val out = Analytics.resampleInterp(df, "k", "t", "v")
      .orderBy("bucket").collect()
    val interp = out.map(r => r.getDecimal(4).toPlainString)
    assert(interp.toSeq == Seq("1.0000", "1.5000", "2.0000", "2.5000", "3.0000"),
      s"expected the straight line: ${interp.toSeq}")
    assert(out.map(_.getBoolean(5)).toSeq == Seq(false, true, true, true, false))
  }

  test("winsorize: clamp counts and mean match hand computation") {
    // Ten values 1..9 and 100 (cents 100..900, 10000). p05: rank 9·0.05 =
    // 0.45 → 100 + 0.45·100 = 145, ceil→145. p95: rank 9·0.95 is
    // 8.549999… IN DOUBLE (0.95 is not binary-exact), so the interpolation
    // gives 5904.999… and the inward floor lands on 5904 — BOTH engines
    // compute this identically, which is exactly why the quantization is
    // floor/ceil of the shared double and not a 2-dp round. One low clamp
    // (100→145), one high (10000→5904). Cents sum = 145 + (200..900) +
    // 5904 = 10449 → half-up mean 10.4490.
    val df = (1 to 9).map(i => ("g", i.toDouble)) :+ (("g", 100.0))
    val out = Analytics.winsorize(df.toDF("k", "v"), "k", "v").collect()(0)
    assert(out.getLong(2) == 1L && out.getLong(3) == 1L,
      s"expected one clamp on each side: $out")
    assert(out.getDecimal(6).compareTo(new java.math.BigDecimal("10.4490")) == 0,
      s"expected winsorized mean 10.4490: $out")
  }

  test("forecastBacktest: lag-24 errors and scores match hand computation") {
    // Same hour two days: day1 10.00, day2 13.00 → one evaluated hour,
    // err 3.00, MAE 3.0000, APE 3/13 → 0.230769 → MAPE 0.230769.
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day 10:00:00")
    val df = Seq(("a", d(1), 10.0), ("a", d(2), 13.0)).toDF("k", "t", "v")
    val out = Analytics.forecastBacktest(df, "k", "t", "v").collect()(0)
    assert(out.getLong(1) == 1L &&
      out.getDecimal(2).compareTo(new java.math.BigDecimal("3.0000")) == 0 &&
      out.getDecimal(3).compareTo(new java.math.BigDecimal("0.230769")) == 0,
      s"expected (1, 3.0000, 0.230769): $out")
  }

  test("mergeActions: all four branches produce the right rows") {
    val target = Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("id", "nm", "bal")
    val feed = Seq((2L, "U", 5.0), (3L, "D", 0.0), (9L, "U", 7.0),
      (8L, "D", 1.0)).toDF("id", "op", "delta")
    val out = Analytics.mergeActions(target, feed, "id", "nm", "bal", "op",
      "delta")
      .orderBy("custkey").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).toPlainString, r.getString(3)))
    // 1 keeps, 2 updates to 25, 3 deletes, 9 inserts, 8's delete-of-absent
    // row vanishes entirely.
    assert(out.toSeq == Seq(
      (1L, "alice", "10.00", "keep"),
      (2L, "bob", "25.00", "update"),
      (9L, "new-9", "7.00", "insert")), s"merge branches wrong: ${out.toSeq}")
  }

  test("temperatureMix: equal groups get equal weights; zero-token group rate is 0, not NaN") {
    val df = Seq(("a", "x y"), ("b", "p q"), ("c", "")).toDF("lang", "text")
    val out = TextAnalysis.temperatureMix(df, "lang",
      expr("cast(size(filter(split(text, ' '), t -> t != '')) as bigint)"),
      budget = 2L)
      .orderBy("lang").collect()
    val weights = out.map(_.getDouble(4))
    assert(weights(0) == weights(1) && weights(0) == 0.5,
      s"two equal groups must split the tempered mass: ${weights.toSeq}")
    val cRow = out(2)
    assert(cRow.getDouble(5) == 0.0 && !cRow.getDouble(5).isNaN,
      s"zero-token group must have rate 0: $cRow")
  }

  test("purgeAudit: counts partition each table and subjects_hit counts matches, not list length") {
    val t1 = Seq((1L, "r1"), (2L, "r2"), (2L, "r3"), (3L, "r4")).toDF("uid", "x")
    val del = Seq(2L, 99L).toDF("subject") // 99 hits nothing
    val out = Privacy.purgeAudit(Seq(("t1", t1, "uid")), del, "subject")
      .collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4)) ==
      ((4L, 2L, 2L, 1L)),
      s"expected before=4 purged=2 after=2 subjects_hit=1: $out")
  }

  test("generalizationLadder: all-distinct QIs force full suppression; k-satisfied data stays at level 0") {
    // 10 customers in one (nation, segment, bucket) class: level 0 already
    // k-anonymous at k=5.
    val same = (1 to 10).map(i => (i.toLong, s"c$i", 1, 500.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val lvl0 = Privacy.generalizationLadder(same, 5).collect()
    assert(lvl0.length == 1 && lvl0(0).getInt(0) == 0 && lvl0(0).getLong(4) == 10L,
      s"homogeneous data must satisfy at level 0: ${lvl0.mkString(",")}")
    // 4 customers all in distinct nations/segments/buckets: every level
    // short of full suppression has classes of size < 5 → level 5.
    val distinct = (1 to 4).map(i => (i.toLong, s"c$i", i, i * 10000.0, s"S$i"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val lvl5 = Privacy.generalizationLadder(distinct, 5).collect()
    assert(lvl5.length == 1 && lvl5(0).getInt(0) == 5 && lvl5(0).getLong(4) == 4L,
      s"all-distinct data must fully suppress: ${lvl5.mkString(",")}")
  }
}
