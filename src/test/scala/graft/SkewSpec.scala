package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Skew-mitigation contracts: salted join/aggregate are result-identical to
  * their plain forms, and AQE's skew-join splitting engages on a skewed
  * shuffle join when thresholds make the skew visible. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // one hot key (0) with 50k rows, 99 cold keys with ~50 each; the md5
    // payload keeps shuffle bytes incompressible so the skew is visible in
    // map-output sizes (AQE detects skew on compressed partition sizes)
    val hot = spark.range(50000).select(lit(0L).as("k"), md5(col("id").cast("string")).as("v"))
    val cold = spark.range(5000).select((col("id") % 99 + 1).as("k"),
      md5(col("id").cast("string")).as("v"))
    hot.union(cold)
  }

  test("saltedJoin == plain join on skewed data") {
    val dim = spark.range(100).select(col("id").as("dk"),
      concat(lit("name_"), col("id")).as("name"))
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy(col("name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", 8)
      .groupBy(col("name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "50KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 1 row per key on the right: join output == |left|, skew stays on
      // the left's hot-key shuffle partition only.
      val right = spark.range(100).select(col("id").as("k2"),
        concat(lit("w"), col("id")).as("w"))
      // keep v in the output — otherwise column pruning drops the payload
      // before the shuffle and the hot partition compresses below threshold
      val df = skewed.join(right, col("k") === col("k2"))
        .select(col("k"), col("v"), col("w"))
      // execute df itself — count() would build a separate QueryExecution
      // and leave df's own AQE plan unfinalized
      assert(df.collect().length == skewed.count())
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skewed"), s"AQE did not mark the join skewed:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("keySkewProfile: hot key ranks first with exact shares; k-cut ties by key") {
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "b", "c", "d"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "i")
    val out = Skew.keySkewProfile(df, "k", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toList
    // 12 rows, 5 keys; ties a/b (2 each) cut alphabetically at k=3
    assert(out == List(
      (1, "hot", 6L, 12L, 5L, 0.5, 0.5),
      (2, "a", 2L, 12L, 5L, round6(2.0 / 12), round6(8.0 / 12)),
      (3, "b", 2L, 12L, 5L, round6(2.0 / 12), round6(10.0 / 12))),
      s"skew profile diverged: $out")
  }

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
