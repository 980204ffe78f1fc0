package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled on-disk layout so fact-fact joins co-locate
  * without an exchange — the 100 TB answer to repeated joins on the same key
  * (SURVEY design stance: "co-locate joins via bucketing"). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs with no hash exchange") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Tables.lineitem(s, sf0001).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(s, sf0001).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
      val j = s.table("li_bucketed")
        .join(s.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"))
      assert(j.count() == Tables.lineitem(s, sf0001).count()) // FK: every item matches
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
