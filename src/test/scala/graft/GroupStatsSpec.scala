package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, TextAnalysis}

/** Round-8 grouped statistics: per-group histogram quantiles (q128) and
  * pairwise Jensen–Shannon divergence (q129). */
class GroupStatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedHistogramQuantiles: per-group answers match the global operator per group") {
    val rows = (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", (2 * i).toDouble))
    val df = rows.toDF("g", "v")
    val grouped = Analytics.groupedHistogramQuantiles(
        df, "g", "v", 0.0, 10.0, 12, Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    for (g <- Seq("a", "b")) {
      val solo = Analytics.histogramQuantiles(
          df.filter(col("g") === g), "v", 0.0, 10.0, 12, Seq(0.5, 0.9))
        .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
      for (p <- Seq(0.5, 0.9))
        assert(grouped((g, p)) == solo(p), s"group $g p=$p")
    }
  }

  test("groupedHistogramQuantiles: estimate within one bin width of the exact percentile") {
    val rows = (1 to 1000).map(i => ("u", i.toDouble))
    val out = Analytics.groupedHistogramQuantiles(
        rows.toDF("g", "v"), "g", "v", 0.0, 100.0, 10, Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(math.abs(out(0.5) - 500.0) <= 100.0)
    assert(math.abs(out(0.99) - 990.0) <= 100.0)
  }

  test("jsDivergence: identical groups → 0, disjoint groups → 1") {
    val docs = Seq(
      ("p", "x x y"), ("q", "x x y"),   // identical distributions
      ("r", "z w z w"))                 // disjoint from p and q
    val out = TextAnalysis.jsDivergence(docs.toDF("g", "text"), "g", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("p", "q")) == 0.0)
    assert(out(("p", "r")) == 1.0)
    assert(out(("q", "r")) == 1.0)
  }

  test("jsDivergence matches a brute-force computation on overlapping distributions") {
    // P: x=3/4, y=1/4.  Q: x=1/4, z=3/4.  Shared support {x} only.
    val docs = Seq(("p", "x x x y"), ("q", "x z z z"))
    val got = TextAnalysis.jsDivergence(docs.toDF("g", "text"), "g", "text")
      .collect()(0).getDouble(2)
    def log2(d: Double) = math.log(d) / math.log(2.0)
    val P = Map("x" -> 0.75, "y" -> 0.25); val Q = Map("x" -> 0.25, "z" -> 0.75)
    val exp = (P.keySet ++ Q.keySet).toSeq.map { t =>
      val (p, q) = (P.getOrElse(t, 0.0), Q.getOrElse(t, 0.0))
      val m = (p + q) / 2
      (if (p > 0) 0.5 * p * log2(p / m) else 0.0) +
        (if (q > 0) 0.5 * q * log2(q / m) else 0.0)
    }.sum
    assert(got == BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got > 0.0 && got < 1.0)
  }
}
