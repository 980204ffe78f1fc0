package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

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

  /** The shared K-M cell derivation (count-min rows, bloom bits, their
    * streaming twins, and every DuckDB oracle replay) pinned against an
    * independent JVM reimplementation — MessageDigest md5, hex-nibble
    * slices parsed with parseLong, plain long arithmetic. Guards the
    * hexSliceExpr string-slicing and the no-overflow bound the whole
    * sketch family rides on. */
  test("K-M cell derivation (SQL md5 slices) == JVM reference on random strings") {
    import graft.operators.Analytics
    val rnd = new scala.util.Random(7)
    val vals = ((0 until 300).map(_ =>
      rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString) :+ "" :+ "a b c")
      .distinct // short random strings collide; one row per value under test
    def refCells(v: String, depth: Int, width: Int): Seq[(Int, Long)] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
      (0 until depth).map(j => j -> (h1 + j * h2) % width)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val sql = df
      .select(col("v"), expr(Analytics.cmHash("v")).as("_h"))
      .select(col("v"), posexplode(expr(
        Analytics.cmCells("_h", 8, Analytics.BloomBits))).as(Seq("j", "cell")))
      .collect().groupBy(_.getString(0))
      .map { case (v, rows) =>
        v -> rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1).toSeq }
    vals.distinct.foreach { v =>
      assert(sql(v) == refCells(v, 8, Analytics.BloomBits), s"drift for '$v'")
    }
  }

  test("bloomFilter: no false negatives, bounded state, merge = bit-union") {
    import graft.operators.Analytics
    val docs = Tables.documents(spark, sf001)
      .select(explode(expr("filter(split(text, ' '), t -> t != '')")).as("tok"))
    // Probe every present token in a sample + one absent: every present
    // term MUST report maybe_present (Bloom's one-sided guarantee).
    val present = docs.distinct().limit(20).collect().map(_.getString(0)).toSeq
    val out = Analytics.bloomProbe(docs, "tok", present :+ "definitely#absent")
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    present.foreach { t =>
      assert(out(t)._1 && out(t)._2 > 0, s"false negative for present term $t")
    }
    // State bound: the sketch is the distinct set-bit positions, ≤ m rows.
    val nBits = Analytics.bloomFilter(docs, "tok").count()
    assert(nBits <= Analytics.BloomBits, s"bits $nBits exceed m")
    assert(nBits > 0)
    // Shard merge = UNION DISTINCT of positions ≡ building over the union.
    val half1 = docs.filter(length(col("tok")) % 2 === 0)
    val half2 = docs.filter(length(col("tok")) % 2 === 1)
    val merged = Analytics.bloomFilter(half1, "tok")
      .union(Analytics.bloomFilter(half2, "tok")).distinct()
      .collect().map(_.getLong(0)).toSet
    val whole = Analytics.bloomFilter(docs, "tok")
      .collect().map(_.getLong(0)).toSet
    assert(merged == whole, "sharded bit-union must equal the whole-corpus bitset")
  }

  /** heavyHitters' exact-confirm pass makes the output a pure function of
    * the input multiset: same answer as a full groupBy-HAVING, under any
    * partitioning, even with k barely above the hitter count. */
  test("heavyHitters == exact groupBy-HAVING under adversarial partitioning") {
    import spark.implicits._
    // 'a' 40%, 'b' 20%, long uniform tail — with k=3, threshold N/4 = 25%:
    // only 'a' qualifies; MG must evict tail noise without losing 'a'.
    val rows = Seq.fill(40)("a") ++ Seq.fill(20)("b") ++
      (0 until 40).map(i => s"t$i")
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("v").repartition(parts)
      val got = Analytics.heavyHitters(df, "v", k = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(("a", 40L, 100L)), s"parts=$parts: $got")
    }
  }

  test("heavyHitters: k=1 finds a strict majority element (Boyer-Moore case)") {
    import spark.implicits._
    val df = (Seq.fill(51)("maj") ++ (0 until 49).map(_.toString)).toDF("v")
      .repartition(4)
    val got = Analytics.heavyHitters(df, "v", k = 1).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("maj"))
    assert(got.head.getLong(1) == 51L && got.head.getLong(2) == 100L)
  }

  test("heavyHitters: nulls excluded, empty result when nothing crosses N/(k+1)") {
    import spark.implicits._
    val df = (Seq(Some("x"), None, Some("y"), Some("z"), None) ++
      (0 until 20).map(i => Some(s"u$i"))).toDF("v")
    assert(Analytics.heavyHitters(df, "v", k = 2).count() == 0L)
  }
}
