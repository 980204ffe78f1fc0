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
}
