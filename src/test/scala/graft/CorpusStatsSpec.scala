package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, TextAnalysis}

/** Round-8 corpus statistics: count-min sketch (q125), PMI collocations
  * (q126), Zipf fit (q127). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("countMin estimates are one-sided: est >= exact, absent term est >= 0") {
    val stream = (Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++
      Seq.fill(1)("gamma")).toDF("v")
    val out = Analytics.countMinEstimate(stream, "v",
        Seq("alpha", "beta", "gamma", "absent"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 4)
    out.foreach { case (t, (est, exact)) =>
      assert(est >= exact, s"$t: CM must never under-estimate ($est < $exact)")
    }
    assert(out("alpha")._2 == 50L && out("beta")._2 == 7L && out("gamma")._2 == 1L)
    assert(out("absent")._2 == 0L)
    // 3 distinct values into 4×1024 cells: no collisions — estimates exact.
    assert(out.forall { case (_, (est, exact)) => est == exact })
  }

  test("countMin sketches merge by cell-wise sum (split stream == whole stream)") {
    val whole = (Seq.fill(20)("x") ++ Seq.fill(30)("y") ++ Seq.fill(9)("z")).toDF("v")
    val part1 = (Seq.fill(8)("x") ++ Seq.fill(30)("y")).toDF("v")
    val part2 = (Seq.fill(12)("x") ++ Seq.fill(9)("z")).toDF("v")
    val merged = Analytics.countMin(part1, "v").union(Analytics.countMin(part2, "v"))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val direct = Analytics.countMin(whole, "v")
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d = direct.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == d)
  }

  test("pmiCollocations matches brute-force PMI on a hand fixture") {
    // pair (a,b) co-occurs in all 4 docs; (a,c) in 2 of 4; c alone in 0.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a b c"), (4L, "b a"))
    val out = TextAnalysis.pmiCollocations(docs.toDF("doc_id", "text"),
        "doc_id", "text", minDf = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def pmi(nab: Long, fa: Long, fb: Long) = BigDecimal(
      math.log(nab.toDouble * 4 / (fa * fb)) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b")) == ((4L, pmi(4, 4, 4))))   // log2(4*4/16) = 0
    assert(out(("a", "c")) == ((2L, pmi(2, 4, 2))))   // log2(2*4/8)  = 0
    assert(out(("b", "c")) == ((2L, pmi(2, 4, 2))))
    assert(out.size == 3)
  }

  test("pmiCollocations orders by (pmi desc, tok1, tok2) and honors minDf/topK") {
    // (x,y) exclusive co-occurrence → high PMI; (a,b) independent-ish → low.
    val docs = Seq.tabulate(8)(i => (i.toLong, if (i < 2) "x y" else "a b")) ++
      Seq((8L, "a y"), (9L, "b x"))
    val rows = TextAnalysis.pmiCollocations(docs.toDF("doc_id", "text"),
      "doc_id", "text", minDf = 2, topK = 2).collect()
    assert(rows.length == 2)
    // (x,y): n_ab=2, df_x=3, df_y=3, N=10 → pmi=log2(20/9) > (a,b)'s log2(6.0*10/49)
    assert((rows(0).getString(0), rows(0).getString(1)) == (("x", "y")))
    assert(rows(0).getDouble(3) > rows(1).getDouble(3))
  }

  test("skipGramCounts matches brute-force windowed pairs; ordered pairs counted separately") {
    val docs = Seq((1L, "a b c a"), (2L, "b a"))
    val out = TextAnalysis.skipGramCounts(docs.toDF("doc_id", "text"),
        "doc_id", "text", window = 1, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // brute force over both docs, window 1
    val exp = docs.flatMap { case (_, t) =>
      val ts = t.split(" ")
      for (i <- ts.indices; j <- ts.indices
           if i != j && math.abs(i - j) <= 1) yield (ts(i), ts(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == exp)
    // center/context orientation: (c,a) appears once (doc 1 pos 2→3),
    // and (a,c) symmetric here — both directions present.
    assert(out(("c", "a")) == 1L && out(("a", "c")) == 1L)
  }

  test("skipGramCounts window bounds: distance > window never pairs; single-token docs drop") {
    val docs = Seq((1L, "x y z w"), (2L, "solo"))
    val out = TextAnalysis.skipGramCounts(docs.toDF("doc_id", "text"),
        "doc_id", "text", window = 2, topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(!out.contains(("x", "w"))) // distance 3 > 2
    assert(out(("x", "z")) == 1L)     // distance 2
    assert(!out.keys.exists { case (a, b) => a == "solo" || b == "solo" })
  }

  test("invertedIndex: df counts distinct docs; postings capped and ascending") {
    val docs = Seq(
      (3L, "b b a"),   // repeated token counts once per doc
      (1L, "a c"),
      (2L, "a b"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text",
        maxPostings = 2, topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // a in 3 docs but postings cap to the first 2 ascending ids;
    // b in docs 2,3 (the doc-3 repeat collapses); c only in doc 1.
    assert(out == Map(
      "a" -> (3L, "1,2"), "b" -> (2L, "2,3"), "c" -> (1L, "1")), s"got $out")
  }

  test("invertedIndex: topK keeps the highest-df tokens, df-then-token order") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text",
        maxPostings = 10, topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("x", "y"), s"got $out") // z (df 1) cut by topK=2
  }

  test("zipfFit recovers an exact power law: counts C/rank give slope -1, r2 1") {
    // counts 12, 6, 4, 3 at ranks 1..4: log2(cnt) = log2(12) - 1*log2(rank).
    val text = (Seq.fill(12)("t1") ++ Seq.fill(6)("t2") ++
      Seq.fill(4)("t3") ++ Seq.fill(3)("t4")).mkString(" ")
    val r = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == -1.0, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(2) == BigDecimal(math.log(12.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(3) == 1.0, s"r2 ${r.getDouble(3)}")
  }
}
