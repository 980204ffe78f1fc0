package graft

import graft.operators.Analytics
import graft.streaming.StreamingQueries
import org.apache.spark.sql.functions._

/** Regression locks for the round-12 ADVICE fixes — each test is a tiny
  * hand-computable input that FAILED (or silently diverged cross-engine)
  * under the pre-fix code, so a revert re-reddens it. */
class Round12FixSpec extends SparkSpec {
  import spark.implicits._

  test("q213 quarantine predicate partitions every row — NULL values route to main, not nowhere") {
    // Pre-fix: bad = (value > 200) || user_id.isNull gave NULL for a
    // NULL-valued row with a non-null user, and filter(bad)/filter(!bad)
    // BOTH excluded it — the row vanished from main AND dlq.
    val rows = Seq(
      (Some(1L), "a", 1L, Some(10.0)),   // clean -> main
      (Some(2L), "a", 2L, Some(999.0)),  // value breach -> dlq
      (None: Option[Long], "a", 3L, Some(10.0)),  // null user -> dlq
      (Some(4L), "a", 4L, None: Option[Double]),  // NULL value -> main (oracle CASE)
      (None: Option[Long], "a", 5L, None: Option[Double])) // null user wins -> dlq
      .toDF("user_id", "event_type", "event_id", "value")
    val bad = StreamingQueries.quarantineBad
    val main = rows.filter(!bad).select("event_id").as[Long].collect().toSet
    val dlq = rows.filter(bad).select("event_id").as[Long].collect().toSet
    assert(main == Set(1L, 4L), s"main channel: $main")
    assert(dlq == Set(2L, 3L, 5L), s"dlq channel: $dlq")
    assert((main ++ dlq).size == 5, "main + DLQ must partition the input exactly")
  }

  test("woeIv counts a NULL label as good — n_bad + n_good == n in every bin") {
    // Pre-fix: when(_bad)/when(!_bad) both fell to otherwise(0) for a NULL
    // label, so the row counted as NEITHER class (n_bad + n_good < n) while
    // the DuckDB oracle's CASE counted it good.
    val df = Seq(
      (1.0, 1L, Some(true)), (2.0, 2L, Some(false)),
      (3.0, 3L, None: Option[Boolean]), (4.0, 4L, Some(true)))
      .toDF("f", "id", "lbl")
    val out = Analytics.woeIv(df, "f", "id", col("lbl"), bins = 2)
      .orderBy("bin").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1),
        s"bin ${r.getLong(0)}: n_bad + n_good must equal n: $r")
    }
    // NULL label landed in bin 2 (feature 3.0) and counts as GOOD there.
    assert(out(1).getLong(3) == 1L, s"NULL label must count as good: ${out(1)}")
  }

  test("cuped mean_y floors a negative cent-sum quotient exactly like DuckDB's //") {
    // One arm, 3 units; post-period sums -1.11, -2.22, +1.00 euros →
    // Σy cents = -233. mean_y = floor((2·(-233)·10000 + 3) / 6)·1e-6
    // = floor(-4659997/6)·1e-6 = -776667e-6 = -0.776667.
    // Pre-fix Spark `div` truncated toward zero → -0.776666 (1 ulp off
    // DuckDB's flooring `//` — the divergence already documented and fixed
    // for mean_y_adj).
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val df = Seq(
      (10L, t(0), 1.00), (10L, t(2), -1.11),
      (20L, t(0), 1.00), (20L, t(2), -2.22),
      (30L, t(0), 1.00), (30L, t(2), 1.00))
      .toDF("user_id", "ts", "value")
    val out = Analytics.cuped(df, "user_id", "ts", "value", lit(0L)).collect()
    assert(out.length == 1)
    val meanY = out(0).getDecimal(2)
    assert(meanY.compareTo(new java.math.BigDecimal("-0.776667")) == 0,
      s"mean_y must be the FLOOR quotient -0.776667, got $meanY")
  }
}
