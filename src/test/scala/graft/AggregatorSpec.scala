package graft

import graft.functions.GeoMean
import org.apache.spark.sql.functions._

/** Typed Aggregator (UDAF) contract: geometric mean of l_quantity per
  * returnflag equals the SQL identity exp(avg(ln x)). */
class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("GeoMean Aggregator == exp(avg(ln)) per group") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
    val typed = li.groupByKey(_._1)
      .agg(new GeoMean[(String, Double)](_._2).toColumn.name("gm"))
      .collect().toMap
    val sql = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(exp(avg(log(col("l_quantity")))).as("gm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == sql.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - sql(k)) / sql(k) < 1e-9, s"group $k: $v vs ${sql(k)}")
    }
  }
}
