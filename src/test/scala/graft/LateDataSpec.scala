package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark semantics under controlled late data (SURVEY §2.2 streaming
  * row: "watermarks, windows, late data"): an event older than
  * watermark-delay behind the max seen event time must be dropped from an
  * append-mode windowed aggregation; a within-delay late event must land in
  * its (earlier) window. */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("append mode drops events later than the watermark delay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
    val name = s"late_${System.nanoTime()}"
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      // Batch 1: events at 10:00 and 10:04 (window 10:00), then 10:31 —
      // watermark advances to 10:21, finalizing the 10:00 window.
      input.addData((ts(0), "a"), (ts(4), "a"), (ts(31), "a"))
      q.processAllAvailable()
      // Batch 2: a 10:02 event — 19 min behind watermark > 10 min delay →
      // dropped. A 10:29 event — within delay → accepted (window 10:25).
      input.addData((ts(2), "a"), (ts(29), "a"))
      q.processAllAvailable()
      // Batch 3: advance watermark far enough to flush remaining windows.
      input.addData((ts(59), "a"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    assert(rows("2024-01-01 10:00:00.0") == 2L,
      s"late 10:02 event should have been dropped: $rows")
    assert(rows("2024-01-01 10:25:00.0") == 1L,
      s"within-delay 10:29 event should be present: $rows")
    assert(rows("2024-01-01 10:30:00.0") == 1L, rows.toString)
  }

  test("update mode re-emits only changed windows, once per change (q268 semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
    val name = s"upd_${System.nanoTime()}"
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    try {
      // Batch 1: two events in window 10:00 → ONE emission (n=2).
      input.addData((ts(0), "a"), (ts(4), "a"))
      q.processAllAvailable()
      // Batch 2: one more 10:00-window event → the window RE-emits
      // (n=3); nothing else changed, so nothing else emits.
      input.addData((ts(3), "a"))
      q.processAllAvailable()
      // Batch 3: a 10:06 event (NEW window, n=1) plus a 10:59 event
      // advancing the watermark to 10:49 — the 10:00 window's state
      // drops. The 10:06 window changed, so it emits; the 10:00 window
      // did NOT change, so update mode must not re-emit it.
      input.addData((ts(6), "a"), (ts(59), "a"))
      q.processAllAvailable()
      // Batch 4: a 10:01 event — 48 min behind the watermark, beyond
      // the 10-min delay → dropped, NO re-emission of the 10:00 window.
      input.addData((ts(1), "a"))
      q.processAllAvailable()
    } finally q.stop()
    val hist = spark.table(name)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSeq
      .sorted
    // Full re-emission history: 10:00 emits twice (n=2 then n=3), each
    // other window exactly once; the late row adds nothing.
    assert(hist == Seq(
      ("2024-01-01 10:00:00.0", 2L), ("2024-01-01 10:00:00.0", 3L),
      ("2024-01-01 10:05:00.0", 1L), ("2024-01-01 10:55:00.0", 1L)),
      s"unexpected update-mode emission history: $hist")
    // The consumer's latest-per-key view (q268's max-n pick) reads the
    // final states — the batch aggregate over the non-dropped rows.
    val finalState = spark.table(name).groupBy(col("ws"))
      .agg(max(col("n")).as("n"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(finalState == Map(
      "2024-01-01 10:00:00.0" -> 3L, "2024-01-01 10:05:00.0" -> 1L,
      "2024-01-01 10:55:00.0" -> 1L))
  }
}
