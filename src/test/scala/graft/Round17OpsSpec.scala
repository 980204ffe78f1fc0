package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Hand-computable locks for the round-17 curation operators: the
  * duplicated-span SCRUB transform (q232), the group-relative adaptive
  * quality gate (q233), and per-doc gram novelty (q234). Every expected
  * value below is derivable on paper from the inputs — the same
  * fixture-free discipline as Round11OpsSpec/Round12FixSpec. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- scrubDupSpans

  private def scrubRows(docs: Seq[(Long, String)], w: Int) =
    TextAnalysis.scrubDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq

  test("scrubDupSpans removes exactly the cross-doc duplicated window, keeps the rest in order") {
    // w=3: the only duplicated trigram is "b c d" (docs 1 and 2). It
    // covers positions 1..3 in each doc; survivors re-join in order.
    val out = scrubRows(Seq(
      1L -> "a b c d e f",
      2L -> "x b c d y"), w = 3)
    assert(out(0) == ((1L, 6L, 3L, 3L, "a e f")))
    assert(out(1) == ((2L, 5L, 2L, 3L, "x y")))
  }

  test("scrubDupSpans: a fully self-repeating doc scrubs to empty; short docs pass through") {
    // doc 3 is pure internal repetition — every trigram occurs >= 2 times
    // (internal repeats count, the q157 semantics), so every position is
    // covered. doc 4 is shorter than w (no grams, nothing removable), and
    // doc 5 locks the whitespace-collapse contract (clean_text is a
    // function of the token sequence, not the raw string).
    val out = scrubRows(Seq(
      3L -> "p q r p q r p q r",
      4L -> "u v",
      5L -> "m  n"), w = 3)
    assert(out(0) == ((3L, 9L, 0L, 9L, "")))
    assert(out(1) == ((4L, 2L, 2L, 0L, "u v")))
    assert(out(2) == ((5L, 2L, 2L, 0L, "m n")))
  }

  test("scrubDupSpans + dupSpans agree on the removed token mass") {
    // The transform's removed_tokens must equal the detector's
    // dup_tokens on the same corpus — they are two readings of one
    // interval union.
    val docs = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "z z a b c d e f g h i j q",
      3L -> "lone doc with no duplicate spans at all")
      .toDF("doc_id", "text")
    val removed = TextAnalysis.scrubDupSpans(docs, "doc_id", "text")
      .select(col("doc_id"), col("removed_tokens"))
    val detected = TextAnalysis.dupSpans(docs, "doc_id", "text")
      .select(col("doc_id"), col("dup_tokens"))
    assert(removed.join(detected, "doc_id")
      .filter(col("removed_tokens") =!= col("dup_tokens")).count() == 0)
  }

  // ------------------------------------------------------ gramNovelty

  test("gramNovelty: owner = min doc_id; internal repeats dedup map-side; gramless docs report zeros") {
    val out = TextAnalysis.gramNovelty(Seq(
      1L -> "a b c d",        // grams "a b c","b c d" — both first-owned
      2L -> "b c d e",        // "b c d" owned by 1; "c d e" novel
      3L -> "p q p q p q",    // distinct grams "p q p","q p q" — both novel
      4L -> "u v")            // < w tokens: no grams
      .toDF("doc_id", "text"), "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 2L, 1L, 0.5),
      (3L, 2L, 2L, 1.0),
      (4L, 0L, 0L, 0.0)))
  }

  // ------------------------------------------------------ adaptiveGate

  test("adaptiveGate thresholds are group-relative and inclusive at the exact integer positions") {
    // group A: n=10, values 1..10 — lo = ceil(200*10/1000) = pos 2 -> 2,
    //          hi = ceil(800*10/1000) = pos 8 -> 8; [2, 8] retained.
    // group B: n=5, values 100..104 — lo = pos 1 -> 100,
    //          hi = ceil(800*5/1000) = pos 4 -> 103; 104 alone drops.
    val df = ((1L to 10L).map(v => ("A", v)) ++
      (100L to 104L).map(v => ("B", v))).toDF("grp", "v")
    val out = TextAnalysis.adaptiveGate(df, "grp", "v", loPm = 200, hiPm = 800)
      .select(col("grp"), col("v"), col("lo"), col("hi"), col("retained"))
      .orderBy(col("grp"), col("v"))
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val a = out.filter(_._1 == "A")
    assert(a.forall(r => r._3 == 2L && r._4 == 8L))
    assert(a.map(r => r._2 -> r._5).toMap ==
      (1L to 10L).map(v => v -> (v >= 2 && v <= 8)).toMap)
    val b = out.filter(_._1 == "B")
    assert(b.forall(r => r._3 == 100L && r._4 == 103L))
    assert(b.map(r => r._2 -> r._5).toMap ==
      (100L to 104L).map(v => v -> (v <= 103)).toMap)
  }

  test("adaptiveGate inherits the exact-quantile integral-value contract") {
    val frac = Seq(("A", 1.5), ("A", 2.5)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.adaptiveGate(frac, "grp", "v", loPm = 100, hiPm = 900)
    }
    assert(e.getMessage.contains("integral"))
  }
}
