package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate contracts (SURVEY §4.2: HLL via
  * approx_count_distinct; sketch percentiles): bounded error vs the exact
  * forms. These stay out of SparkEntry.queries because their outputs are
  * estimator-defined, not SQL-oracle-hashable. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact (HLL++)") {
    val li = Tables.lineitem(spark, sf001)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile within 2% of exact interpolated percentile") {
    val o = Tables.orders(spark, sf001)
    val row = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx $approx vs exact $exact")
  }
}
