package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's runtime filters): when one
  * join side carries a selective predicate, the optimizer injects a bloom
  * filter built from that side into the OTHER side's scan, so the fact
  * table drops non-joining rows before the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling only
  * the ~matching fraction — the runtime analog of static partition
  * pruning, and it composes with AQE. Default thresholds
  * (applicationSideScanSizeThreshold = 10 GB) exist precisely because the
  * filter only pays for itself at scale; the spec lowers them to observe
  * the injection on fixture data. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim predicate injects a bloom filter into the fact scan") {
    val s = spark
    // Force the shuffle-join path (broadcast joins get their own pruning)
    // and drop the size thresholds that gate injection at fixture scale.
    // The session is suite-shared: save EVERY touched key and restore it
    // exactly (no hard-coded "defaults" that drift with test ordering).
    val touched = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = touched.map(k => k -> s.conf.getOption(k)).toMap
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    try {
      val li = Tables.lineitem(s, sf001)
      val o = Tables.orders(s, sf001)
        .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("price"))
      val rows = j.collect()
      assert(rows.nonEmpty)
      // The injected filter shows as `might_contain(scalar-subquery ...)`
      // over the fact scan, fed by a `bloom_filter_agg` built on the
      // filtered dim side.
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter on the fact side:\n$p")
      assert(p.contains("bloom_filter_agg"),
        s"bloom filter not built from the creation side:\n$p")
    } finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }
}
