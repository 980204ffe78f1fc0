package graft

import org.apache.spark.sql.functions.col
import graft.operators.{Dedup, TextAnalysis}

/** Round-8 curation operators: corpus boilerplate removal (q122), char
  * entropy (q123), and cross-group MinHash corpus overlap (q124). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("removeBoilerplate drops corpus-frequent segments, keeps unique content in order") {
    // segment unit = 2 tokens, boilerplate df threshold = 2.
    // "nav bar" opens 4 docs (df=4 > 2 → boilerplate); each doc's tail is unique.
    val docs = (0 until 4).map(i => (i.toLong, s"nav bar unique$i tail$i body$i")) ++
      Seq(5L -> "free text only here", 6L -> "nav bar", 7L -> "")
    val out = TextAnalysis.removeBoilerplate(
        docs.toDF("doc_id", "text"), "doc_id", "text", segTokens = 2, maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // 4 nav-bar docs: 3 segments, 1 dropped, unique tail reassembled in order
    (0 until 4).foreach { i =>
      assert(out(i.toLong) == ((3L, 1L, s"unique$i tail$i body$i")))
    }
    // doc 5: nothing corpus-frequent — untouched (4 tokens → 2 segments)
    assert(out(5L) == ((2L, 0L, "free text only here")))
    // doc 6 is ALL boilerplate: survives with empty clean text
    assert(out(6L) == ((1L, 1L, "")))
    // doc 7 has zero tokens: absent
    assert(!out.contains(7L))
  }

  test("removeBoilerplate segments: last window may be short, reassembly == original when nothing drops") {
    val docs = Seq(1L -> "a b c d e f g h i j k") // 11 tokens, k=3 → 4 segments
    val r = TextAnalysis.removeBoilerplate(
        docs.toDF("doc_id", "text"), "doc_id", "text", segTokens = 3, maxDf = 1)
      .collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 0L)
    assert(r.getString(3) == "a b c d e f g h i j k")
  }

  test("chunkDedup keeps each distinct chunk once, at its first (doc, chunk) occurrence") {
    // chunk unit = 2 tokens. doc 1 = doc 0 verbatim → fully deduplicated
    // (NULL text); doc 2 shares its FIRST chunk with doc 0 but keeps its
    // unique tail; doc 3 repeats one chunk internally.
    val docs = Seq(
      0L -> "a b c d",
      1L -> "a b c d",
      2L -> "a b x y",
      3L -> "p q p q").toDF("doc_id", "text")
    val out = TextAnalysis.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(out(0L) == ((2L, 2L, Some("a b c d"))))
    assert(out(1L) == ((2L, 0L, None)), "verbatim copy must fully dedup to NULL")
    assert(out(2L) == ((2L, 1L, Some("x y"))), "shared head chunk collapses to doc 0's copy")
    assert(out(3L) == ((2L, 1L, Some("p q"))), "within-doc repeat keeps only the first")
    // Global invariant: kept chunks == distinct chunk texts corpus-wide.
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 2, 0)
    assert(out.values.map(_._2).sum ==
      chunks.select(col("chunk_text")).distinct().count())
  }

  test("chunkDedup property: matches a naive per-corpus replay on seeded random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Tiny vocab + short docs force heavy cross-document chunk collisions.
    val docGen = Gen.choose(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 3)).map(_.map("tok" + _).mkString(" ")))
    val corpusGen = Gen.listOfN(15, docGen)
    (0 until 6).foreach { seed =>
      val texts = corpusGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val k = 3
      // Naive reference: first (doc, chunk) occurrence of each chunk text.
      val naiveChunks = docs.flatMap { case (id, t) =>
        t.split(" ").filter(_.nonEmpty).grouped(k).zipWithIndex
          .map { case (toks, ci) => (id, ci, toks.mkString(" ")) }.toSeq
      }
      val winners = naiveChunks.groupBy(_._3).map { case (_, occ) =>
        occ.minBy(o => (o._1, o._2))
      }.toSet
      val expected = naiveChunks.groupBy(_._1).map { case (id, cs) =>
        val kept = cs.sortBy(_._2).filter(winners.contains)
        id -> ((cs.size.toLong, kept.size.toLong,
          if (kept.isEmpty) None else Some(kept.map(_._3).mkString(" "))))
      }
      val got = TextAnalysis.chunkDedup(
          docs.toDF("doc_id", "text"), "doc_id", "text", chunkTokens = k)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }

  test("charEntropy matches a direct Shannon computation; degenerate text → 0.0") {
    val docs = Seq(1L -> "aabb", 2L -> "zzzz", 3L -> "abcd", 4L -> "")
    val out = TextAnalysis.charEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 2, 1.0)))       // two chars, p=1/2 each → 1 bit
    assert(out(2L) == ((4L, 1, 0.0)))       // single char → 0 (and +0.0, not -0.0)
    assert(out(3L) == ((4L, 4, 2.0)))       // uniform over 4 → 2 bits
    assert(!out.contains(4L))               // empty text filtered
    assert(java.lang.Double.doubleToLongBits(out(2L)._3) == 0L) // not -0.0
  }

  test("charEntropy native == HOF formulation on the fixture (parity contract)") {
    val df = Tables.documents(spark, sf001)
    val native = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    val hof = TextAnalysis.charEntropyHof(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(native == hof)
  }

  test("charEntropy on fixture docs matches per-row brute force") {
    val df = Tables.documents(spark, sf0001).limit(20)
    val got = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val texts = df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      val n = t.length.toDouble
      val exp = -t.groupBy(identity).values
        .map(g => (g.length / n) * (math.log(g.length / n) / math.log(2.0))).sum
      assert(math.abs(got(id) - BigDecimal(exp + 0.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id")
    }
  }

  test("corpusOverlap: identical groups → 1.0/1.0; disjoint groups → est 0.0, exact 0.0") {
    val docs = Seq(
      ("ga", "alpha beta gamma delta epsilon"),
      ("gb", "alpha beta gamma delta epsilon"),   // gb == ga
      ("gc", "zeta eta theta iota kappa lambda")) // gc disjoint from both
    val out = Dedup.corpusOverlap(docs.toDF("src", "text"), "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(("ga", "gb")) == ((1.0, 1.0)))
    assert(out(("ga", "gc")) == ((0.0, 0.0)))
    assert(out(("gb", "gc")) == ((0.0, 0.0)))
  }

  test("corpusOverlap min-merge == sketch of the concatenated group (merge algebra)") {
    // group gx split over two docs vs group gy holding the same shingle set
    // in ONE doc: sketches must agree exactly (min over union = min of mins).
    val docs = Seq(
      ("gx", "one two three four five"),
      ("gx", "four five six seven eight"),
      ("gy", "one two three four five six seven eight"))
    val out = Dedup.corpusOverlap(docs.toDF("src", "text"), "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    // gx's two docs tile gy's token stream with a 2-token overlap, so gx's
    // shingle UNION equals gy's single-doc shingle set exactly — the merged
    // sketch must therefore equal gy's sketch position-for-position.
    assert(out(("gx", "gy")) == ((1.0, 1.0)))
  }

  /** dupSpans (q157): cross-doc shared span, internal period-8 repetition
    * (overlapping spans must UNION, not sum), and a short doc reporting
    * zeros. */
  test("dupSpans: coverage union over cross-doc and internal repeats") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x a b c d e f g h y z"),
      // period-8 repetition: dup grams at starts 0,1,8,9 → union covers all 17
      (3L, "p q r s t u v w p q r s t u v w p"),
      (4L, "too short to gram")) // 4 tokens < w=8
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // docs 1 and 2 share exactly one 8-gram ("a b c d e f g h")
    assert(out(1L) == ((10L, 3L, 1L, 8L, 0.8)))
    assert(out(2L) == ((11L, 4L, 1L, 8L, 0.7273)))
    // spans [0,7],[1,8],[8,15],[9,16] union to [0,16]: all 17 tokens
    assert(out(3L) == ((17L, 10L, 4L, 17L, 1.0)))
    assert(out(4L) == ((4L, 0L, 0L, 0L, 0.0)))
  }
}
