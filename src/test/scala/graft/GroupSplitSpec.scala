package graft

import graft.operators.{Analytics, TextAnalysis}
import org.apache.spark.sql.functions._

/** q221/q222 structural contracts. */
class GroupSplitSpec extends SparkSpec {
  import spark.implicits._

  test("groupSplit: no group ever straddles splits, and the split is a pure function of the group") {
    val df = (1 to 500).map(i => (i.toLong, (i % 37).toLong)).toDF("row_id", "grp")
    val out = TextAnalysis.groupSplit(df, "grp")
    val straddlers = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0, "a group landed in two splits")
    // reproducibility: same groups → same buckets on a disjoint row set
    val again = TextAnalysis.groupSplit(
      (1000 to 1100).map(i => (i.toLong, (i % 37).toLong)).toDF("row_id", "grp"),
      "grp")
    val j = out.select(col("grp"), col("bucket").as("b1")).distinct()
      .join(again.select(col("grp"), col("bucket").as("b2")).distinct(), "grp")
      .filter(col("b1") =!= col("b2")).count()
    assert(j == 0, "bucket moved for an existing group")
  }

  test("histogram-state merge equals the whole-table walk on any split") {
    val df = (1 to 1000).map(i => (i.toLong, (i * 7 % 997).toDouble)).toDF("id", "v")
    val whole = Analytics.histogramQuantiles(df, "v", 0.0, 100.0, 10,
      Seq(0.5, 0.9)).collect().map(r => (r.getDouble(0), r.getDouble(2))).toMap
    val merged = {
      def st(p: Int) = Analytics.histogramState(
        df.filter(pmod(col("id"), lit(3)) === p), "v", 0.0, 100.0, 10)
      Analytics.quantileWalk(
        st(0).unionByName(st(1)).unionByName(st(2))
          .groupBy(col("bin")).agg(sum(col("n")).as("n")),
        0.0, 100.0, Seq(0.5, 0.9))
        .collect().map(r => (r.getDouble(0), r.getDouble(2))).toMap
    }
    assert(whole == merged, s"merge diverged: $whole vs $merged")
  }
}
