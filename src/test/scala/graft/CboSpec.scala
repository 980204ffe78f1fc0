package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer posture: `ANALYZE TABLE ... COMPUTE STATISTICS`
  * feeds exact row counts (and column stats) into Catalyst, and with CBO
  * enabled a 3-way star join must keep the dim-broadcast shape — the fact
  * table streams, both dimension tables build broadcast hash maps. At
  * 100 TB this is the difference between two dim broadcasts and a pair of
  * fact-sized sort-merge shuffles; statistics are what keep the choice
  * stable once dim sizes approach the static threshold. */
class CboSpec extends SparkSpec {

  test("3-way star join keeps dim-broadcast shape with ANALYZE stats + CBO") {
    val s = spark
    Tables.lineitem(s, sf0001).write.mode("overwrite").saveAsTable("cbo_li")
    Tables.part(s, sf0001).write.mode("overwrite").saveAsTable("cbo_part")
    Tables.supplier(s, sf0001).write.mode("overwrite").saveAsTable("cbo_supp")
    Seq("cbo_li", "cbo_part", "cbo_supp").foreach { t =>
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // Save-and-restore EXACT prior values (not hard-coded defaults) — the
    // shared session means a sloppy restore leaks CBO state into whichever
    // suite runs next (RuntimeFilterSpec's comment documents the hazard).
    val touched = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = touched.map(k => k -> s.conf.getOption(k))
    touched.foreach(k => s.conf.set(k, "true"))
    try {
      // ANALYZE-provided statistics must reach the optimizer as EXACT row
      // counts (size-only estimates leave rowCount undefined).
      Seq("cbo_li" -> Tables.lineitem(s, sf0001).count(),
          "cbo_part" -> Tables.part(s, sf0001).count(),
          "cbo_supp" -> Tables.supplier(s, sf0001).count()).foreach {
        case (t, n) =>
          val rc = s.table(t).queryExecution.optimizedPlan.stats.rowCount
          assert(rc.contains(BigInt(n)), s"$t: rowCount stat $rc != $n")
      }
      val j = s.table("cbo_li")
        .join(s.table("cbo_part"), col("l_partkey") === col("p_partkey"))
        .join(s.table("cbo_supp"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("price"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      assert(bhj == 2, s"expected both dims broadcast, got $bhj BHJ:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"star join degraded to a fact-sized shuffle join:\n$p")
    } finally {
      saved.foreach { case (k, v) => v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
      Seq("cbo_li", "cbo_part", "cbo_supp")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
