package graft

import graft.operators
import graft.operators.{Analytics, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computable locks for the round-17 operators: the duplicated-span
  * SCRUB transform (q232), the group-relative adaptive quality gate
  * (q233), per-doc gram novelty (q234), frame-level perceptual near-dup
  * (q235), time-decayed features (q236), and the matryoshka truncation
  * audit (q237). Every expected
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

  // ------------------------------------------- frameSimHashNearDup (q235)

  test("frameSimHashNearDup pairs byte-identical payloads at Hamming 0 and skips empty/unrelated ones") {
    // Docs 1 and 2 share every 16-byte frame (identical payload ->
    // identical frame hashes -> identical signature). Doc 3 is unrelated
    // content (disjoint frames -> different vote pattern), doc 4 is empty
    // (no frames -> excluded from signing entirely).
    val frameA = "abcdefghijklmnop" // exactly 16 bytes
    val payload = frameA + "qrstuvwxyz012345" + "FRAME_THREE_0016"
    val other = "ZYXWVUTSRQPONMLK" + "9876543210zyxwvu" + "THIRD_FRAME_0016"
    val out = operators.Multimodal.frameSimHashNearDup(Seq(
      1L -> payload, 2L -> payload, 3L -> other, 4L -> "")
      .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 2L, 0)))
  }

  test("FrameSimHash60 native expression matches the md5-fold reference algebra") {
    // Reference: md5 per 16-byte frame (partial last frame included),
    // 60-bit fold of digest bytes b0..b6 + high nibble of b7, ±1 votes,
    // tie -> 0. Exactly the algebra the q235 oracle replays in SQL.
    def ref(s: String, fb: Int): Long = {
      val bytes = s.getBytes("UTF-8")
      val votes = new Array[Int](60)
      val md = java.security.MessageDigest.getInstance("MD5")
      var st = 0
      while (st < bytes.length) {
        md.reset(); md.update(bytes, st, math.min(fb, bytes.length - st))
        val d = md.digest()
        var v = 0L
        (0 until 7).foreach(k => v = (v << 8) | (d(k) & 0xffL))
        v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
        (0 until 60).foreach(j =>
          if (((v >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
        st += fb
      }
      (0 until 60).foldLeft(0L)((acc, j) => if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val samples = Seq("abcdefghijklmnop", "short", "x" * 100,
      "spark dedup quality " * 40, "tail-not-multiple-of-16-bytes!!")
    graft.functions.GraftFunctions.register(spark)
    val got = samples.toDF("s")
      .select(expr("graft_frame_simhash60(s, 16)")).as[Long].collect().toSeq
    assert(got == samples.map(ref(_, 16)))
  }

  // ----------------------------------------------- decayedFeatures (q236)

  test("decayedFeatures: pre-rounded exponential terms sum exactly; NULL values add count mass only") {
    // tau = 100 s; the horizon is user 2's event at t0 + 200 s. Every
    // expected number below replays the operator's own term rule
    // (round(exp(-dt/tau), 9), exact decimal sum, round(,6) out).
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusSec: Long) = new java.sql.Timestamp(t0.getTime + plusSec * 1000)
    val rows = Seq(
      (1L, ts(200), Some(10.0)),  // dt=0   -> w=1
      (1L, ts(100), Some(20.0)),  // dt=100 -> w=round(e^-1, 9)
      (1L, ts(200), None: Option[Double]), // NULL value: count mass only
      (2L, ts(0), Some(5.0)))     // dt=200 -> w=round(e^-2, 9)
      .toDF("user_id", "ts", "value")
    val out = Analytics.decayedFeatures(rows, "user_id", "ts", "value", 100L)
      .orderBy("user_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w1 = r9(math.exp(-1.0)); val w2 = r9(math.exp(-2.0))
    assert(out(0)._1 == 1L && out(0)._2 == 3L)
    assert(out(0)._3 == r6(BigDecimal(2) + w1))
    assert(out(0)._4 == r6(BigDecimal(10) + r9(20.0 * math.exp(-1.0))))
    assert(out(1) == ((2L, 1L, r6(w2), r6(r9(5.0 * math.exp(-2.0))))))
  }

  // --------------------------------------------- matryoshkaRecall (q237)

  test("matryoshkaRecall: full-dim leg recalls 1.0; prefix leg loses exactly the hand-computed neighbor") {
    // Query 0 = (1, 0). Full-dim top-2 = {3, 4}; at prefix dim 1 every
    // positive-x vector ties at cosine 1.0 and the id tiebreak picks
    // {1, 3} -> exactly one survivor -> recall 0.5.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.5f, 10.0f)),  // full cos ~0.05; prefix cos 1.0 (tie, lowest id)
      (3L, Seq(10.0f, 0.0f)),  // full cos 1.0
      (4L, Seq(1.0f, -0.1f)))  // full cos ~0.995
      .toDF("vec_id", "embedding")
    val out = operators.Similarity.matryoshkaRecall(df, "vec_id", "embedding",
      col("vec_id") === 0L, dims = Seq(1, 2), k = 2)
      .orderBy("dim")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1, 0L, 1L, 0.5), (2, 0L, 2L, 1.0)))
  }
}
