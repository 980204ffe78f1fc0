package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup: `withWatermark + dropDuplicates(id)` keeps one
  * row per id across micro-batches (state bounded by the watermark) — the
  * streaming member of the dedup family (COVERAGE §2.3). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicates over a watermarked stream dedups across batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = input.toDF().toDF("event_id", "ts", "payload")
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id")
    val name = s"sdedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      input.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a-dup"))
      q.processAllAvailable()
      // cross-batch duplicate of id=2, plus a fresh id=3
      input.addData((2L, ts(3), "b-dup"), (3L, ts(4), "c"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      s"streaming dedup produced $rows")
  }

  /** The TTL'd variant (q148): `dropDuplicatesWithinWatermark` holds a
    * key's state only until the watermark passes its event time + delay —
    * THE required form when the dedup key domain is unbounded (event ids
    * at stream scale), because plain dropDuplicates state grows with
    * lifetime key cardinality. The contract pins all three behaviors on a
    * controlled MemoryStream: in-TTL duplicate dropped, post-eviction
    * re-arrival re-admitted, state bounded by live-window keys. */
  test("dropDuplicatesWithinWatermark drops in-TTL dups and evicts state after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = input.toDF().toDF("event_id", "ts", "payload")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val name = s"sttl_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      // Same-batch duplicate inside the TTL window: one emission.
      input.addData((1L, ts(10, 0), "a"), (1L, ts(10, 5), "a-dup"))
      q.processAllAvailable()
      // Advance the watermark (11:00 − 10 min = 10:50) past id=1's expiry
      // (last seen 10:05 + 10 min = 10:15): its state row is evicted.
      input.addData((2L, ts(11, 0), "b"))
      q.processAllAvailable()
      // The SAME id re-admits after eviction — TTL state, not lifetime
      // state. (Plain dropDuplicates would silently drop this row.)
      input.addData((1L, ts(11, 1), "a-again"))
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      if (ops.nonEmpty)
        assert(ops(0).numRowsTotal <= 2,
          s"TTL state should hold only live-window keys, got ${ops(0).numRowsTotal}")
    } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(2))).sortBy(p => (p._1, p._2))
    assert(out.toSeq == Seq((1L, "a"), (1L, "a-again"), (2L, "b")),
      s"TTL dedup produced ${out.toSeq}")
  }
}
