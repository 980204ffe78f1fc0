package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Append-mode watermarked window finalization (q191's row-level
  * contract, driven on a controlled MemoryStream where the watermark can
  * be advanced precisely):
  *
  *  1. NO window is emitted before the watermark passes its end — the
  *     sink stays empty while every window is still open;
  *  2. advancing the watermark past a window's end emits that window
  *     EXACTLY ONCE, with the aggregate over everything that arrived
  *     while it was open (including cross-batch contributions);
  *  3. a row arriving after the watermark already closed its window is
  *     dropped — it neither re-emits the window nor perturbs its
  *     published aggregate.
  *
  * Complete mode (q82) re-emits the whole result every trigger and keeps
  * all window state forever; append mode is the bounded-state production
  * form, and these three properties are exactly what its oracle's
  * watermark-cutoff restriction encodes. */
class AppendModeSpec extends SparkSpec {
  import spark.implicits._

  test("append mode emits a window only after the watermark passes its end, exactly once, and drops later stragglers") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
    val name = s"sappend_${System.nanoTime()}"
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      // Two batches into the SAME 10:00 window. Watermark after them is
      // 10:40 − 10 min = 10:30 < 11:00, so the window is still open:
      // append mode must emit NOTHING yet.
      input.addData((ts(10, 0), "click", 1.0), (ts(10, 20), "click", 2.0))
      q.processAllAvailable()
      input.addData((ts(10, 40), "click", 4.0))
      q.processAllAvailable()
      assert(spark.table(name).isEmpty,
        "window emitted before the watermark passed its end")
      // 11:30 advances the watermark to 11:20 ≥ 11:00: the 10:00 window
      // finalizes with ALL THREE cross-batch rows folded in.
      input.addData((ts(11, 30), "click", 8.0))
      q.processAllAvailable()
      val emitted = spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(emitted.toSeq == Seq((ts(10, 0), "click", 3L, 7.0)),
        s"finalized window wrong: ${emitted.toSeq}")
      // A straggler INSIDE the already-closed 10:00 window (10:50 is far
      // behind the 11:20 watermark): dropped — no re-emission, no change.
      input.addData((ts(10, 50), "click", 100.0))
      q.processAllAvailable()
      val after = spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(after.toSeq == Seq((ts(10, 0), "click", 3L, 7.0)),
        s"late row perturbed a finalized window: ${after.toSeq}")
      // The 11:00 window (holding the 11:30 row) is still open at
      // watermark 11:20 — withheld, exactly the trailing-window rule the
      // q191 oracle replays with its max(ts) − delay cutoff.
    } finally q.stop()
  }
}
