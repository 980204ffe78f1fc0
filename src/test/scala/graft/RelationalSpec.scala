package graft

import graft.operators.Relational

/** Structural checks per relational query: runs at sf0.001, asserts row
  * counts / invariants computable independently. Value-level correctness is
  * the DuckDB oracle gate (tools/check_oracle.py, driver t2). */
class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("q01 groups are the 6 returnflag/linestatus combos") {
    val rows = Relational.queries("q01_pricing_summary")(spark, sf0001).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.lineitem(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02").count()
    assert(total == filtered)
  }

  test("q08 outer join covers every customer exactly once") {
    val df = Relational.queries("q08_outer_join")(spark, sf0001)
    assert(df.count() == Tables.customer(spark, sf0001).count())
  }

  test("q09 rank never exceeds 3 and is dense from 1") {
    import org.apache.spark.sql.functions._
    val df = Relational.queries("q09_window_rank")(spark, sf0001)
    assert(df.agg(max(col("rn"))).head().getInt(0) <= 3)
    assert(df.filter(col("rn") === 1).count() ==
      df.select(col("o_custkey")).distinct().count())
  }

  test("q12 rollup grand total equals table count") {
    import org.apache.spark.sql.functions._
    val df = Relational.queries("q12_rollup")(spark, sf0001)
    val grand = df.filter(col("l_returnflag").isNull).select(col("n")).head().getLong(0)
    assert(grand == Tables.lineitem(spark, sf0001).count())
  }

  test("q16 topk is exactly 15 rows in descending price order") {
    val prices = Relational.queries("q16_topk")(spark, sf0001)
      .collect().map(_.getAs[Double]("price"))
    assert(prices.length == 15)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("recursive CTE cycle guard: a non-terminating recursion surfaces " +
      "the engine's level limit as a clean error, not a hang") {
    // A self-referencing hierarchy (parent == child) never shrinks, so the
    // recursion only stops when spark.sql.cteRecursionLevelLimit trips —
    // q99's closure terminates structurally (ancestor strictly halves);
    // this pins what happens when input data violates that assumption.
    // Limit lowered so the failure is immediate, then restored.
    val prev = spark.conf.getOption("spark.sql.cteRecursionLevelLimit")
    spark.conf.set("spark.sql.cteRecursionLevelLimit", 10)
    try {
      val e = intercept[Exception] {
        spark.sql("""
          WITH RECURSIVE cyc(key) AS (
            SELECT 1
            UNION ALL
            SELECT key FROM cyc WHERE key > 0
          )
          SELECT count(*) FROM cyc
        """).collect()
      }
      assert(e.getMessage.contains("RECURSION_LEVEL_LIMIT_EXCEEDED") ||
        e.getMessage.toLowerCase.contains("recursion"),
        s"expected the recursion-limit error, got: ${e.getMessage}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cteRecursionLevelLimit", v)
        case None => spark.conf.unset("spark.sql.cteRecursionLevelLimit")
      }
    }
  }
}
