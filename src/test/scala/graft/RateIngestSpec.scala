package graft

import graft.streaming.StreamingQueries

/** Drain-and-compare contract for the generator-source streaming ingestion
  * path (rate-micro-batch → bucketed rollup → memory sink): whatever number
  * of micro-batches committed before the stop, the snapshot must equal the
  * closed-form answer over value ∈ [0, M).
  */
class RateIngestSpec extends SparkSpec {

  test("drained rollup matches arithmetic over exactly the ingested rows") {
    val rowsPerBatch = 1000
    val buckets = 10
    val out = StreamingQueries.rateIngest(spark, rowsPerBatch, buckets,
      minRows = 2000).collect()

    val m = out.map(_.getLong(1)).sum // total rows ingested
    assert(m >= 2000, s"drained only $m rows")
    assert(m % rowsPerBatch == 0,
      s"memory sink exposed a partial micro-batch: $m rows")

    // value ∈ [0, M), bucket b = {b, b+buckets, …}: count c = M/buckets
    // (buckets divides rowsPerBatch), sum = c*b + buckets*c*(c-1)/2.
    val c = m / buckets
    assert(out.length == buckets)
    out.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == c, s"bucket $b count ${r.getLong(1)} != $c")
      val expectedSum = c * b + buckets.toLong * c * (c - 1) / 2
      assert(r.getLong(2) == expectedSum,
        s"bucket $b sum ${r.getLong(2)} != $expectedSum")
    }
  }
}
