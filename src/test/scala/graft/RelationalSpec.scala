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

  test("validate: single fused scan for row-local checks, nulls fail closed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = Seq(
      (Some(1L), Some("a"), Some(5.0)),
      (Some(2L), Some("b"), Some(50.0)),
      (Some(2L), None, None),
      (None, Some("z"), Some(-1.0))).toDF("k", "s", "x")
    val dim = Seq(1L, 2L).toDF("key")
    val rep = Relational.validate(t, Seq(
      Relational.Complete("k", minRatio = 0.9),
      Relational.Distinctness("k", minRatio = 0.6),
      Relational.InSet("s", Seq("a", "b"), minRatio = 0.5),
      Relational.InRange("x", 0.0, 100.0, minRatio = 0.5),
      Relational.RefIntegrity("k", dim, "key", minRatio = 0.7)))
    val rows = rep.collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getBoolean(3)))).toMap
    // completeness 3/4; distinct 2/4; in_set 2/4 (null + 'z' fail);
    // in_range 2/4 (null + -1 fail); ref 3/4 (null FK fails)
    assert(rows("complete(k)") == ((0.75, false)))
    assert(rows("distinct(k)") == ((0.5, false)))
    assert(rows("in_set(s)") == ((0.5, true)))
    assert(rows("in_range(x)") == ((0.5, true)))
    assert(rows("ref_integrity(k)") == ((0.75, true)))
    // the four row-local checks fuse into ONE scan of the input
    val localOnly = Relational.validate(t, Seq(
      Relational.Complete("k"), Relational.Distinctness("k"),
      Relational.InSet("s", Seq("a")), Relational.InRange("x", 0.0, 1.0)))
    val scans = localOnly.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"row-local checks must fuse into one scan, saw ${scans.size}")
    intercept[IllegalArgumentException] {
      Relational.validate(t, Seq(Relational.Complete("k"), Relational.Complete("k")))
    }
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
    assert(df.agg(max(col("rn"))).head().getLong(0) <= 3)
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
