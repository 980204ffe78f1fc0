package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BytePolyImpl, CharNgramsImpl, HyperplaneBucketsImpl, MinHashSigImpl, SimHash60Impl, TokenShinglesImpl, WinnowImpl}

/** Property tests pinning every native expression's JVM impl against a
  * naive, obviously-correct reference model — no Spark session, hundreds of
  * deterministic random cases per law (seeded ScalaCheck generators). These
  * guard the byte-level fast paths (incremental code-point walks,
  * single-pass folds) against off-by-one regressions that fixture-parity
  * tests might not reach.
  */
class NativeImplPropertySpec extends AnyFunSuite {

  private def cases[A](gen: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(33.toChar, 126.toChar), 3 -> Gen.const(' '))).map(_.mkString)

  private val anyText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.choose(33.toChar, 126.toChar), 2 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ß', '中', '日'), 1 -> Gen.const('€'))).map(_.mkString)

  test("CharNgrams == naive code-point sliding window") {
    cases(Gen.zip(anyText, Gen.choose(1, 5))).foreach { case (s, n) =>
      val got = CharNgramsImpl.ngrams(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val cps = s.codePoints().toArray
      val expect =
        if (cps.length < n) Seq.empty
        else (0 to cps.length - n).map(i => new String(cps, i, n))
      assert(got == expect, s"input='$s' n=$n")
    }
  }

  test("TokenShingles == naive split-filter-slide-distinct") {
    cases(Gen.zip(anyText, Gen.choose(2, 4))).foreach { case (s, n) =>
      val got = TokenShinglesImpl.shingles(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val toks = s.split(' ').filter(_.nonEmpty).toSeq
      val expect =
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString("_")).distinct
      assert(got == expect, s"input='$s' n=$n")
    }
  }

  test("SimHash60 == naive per-token md5-vote model") {
    val md = java.security.MessageDigest.getInstance("MD5")
    cases(anyText).foreach { s =>
      val got = SimHash60Impl.simhash(UTF8String.fromString(s))
      val votes = new Array[Int](60)
      s.split(' ').filter(_.nonEmpty).foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        val v = java.lang.Long.parseLong(hex, 16)
        for (j <- 0 until 60) if (((v >> j) & 1) == 1) votes(j) += 1 else votes(j) -= 1
      }
      val expect = (0 until 60).map(j => if (votes(j) > 0) 1L << j else 0L).sum
      assert(got == expect, s"input='$s'")
    }
  }

  test("MinHashSig == naive distinct-shingle permutation-min model") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val P = MinHashSigImpl.P
    cases(anyText).foreach { s =>
      val got = MinHashSigImpl.sig(UTF8String.fromString(s)).toLongArray().toSeq
      val toks = s.split(' ').filter(_.nonEmpty).toSeq
      val shingles =
        if (toks.length < 3) Seq.empty
        else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString("_")).distinct
      val expect =
        if (shingles.isEmpty) Seq.empty
        else (0 until 32).map { i =>
          shingles.map { sh =>
            val hex = md.digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
            val h = java.lang.Long.parseLong(hex, 16) % P
            (h * MinHashSigImpl.PermA(i) + MinHashSigImpl.PermB(i)) % P
          }.min
        }
      assert(got == expect, s"input='$s'")
    }
  }

  test("BytePoly == BigInt polynomial fold") {
    val gen = Gen.zip(asciiText, Gen.oneOf(1L, 31L),
      Gen.oneOf(997L, 1000000007L), Gen.choose(1, 16))
    cases(gen).foreach { case (s, mult, mod, step) =>
      val bytes = s.getBytes("UTF-8")
      val got = BytePolyImpl.fold(bytes, mult, mod, step)
      var acc = BigInt(0)
      var i = 0
      while (i < bytes.length) {
        acc = (acc * mult + (bytes(i) & 0xff)) % mod
        i += step
      }
      assert(got == acc.toLong, s"input='$s' mult=$mult mod=$mod step=$step")
    }
  }

  test("Winnow == naive gram-hash + window-min + distinct-sorted") {
    cases(Gen.zip(asciiText, Gen.choose(2, 8), Gen.choose(1, 5))).foreach {
      case (s, k, w) =>
        val bytes = s.getBytes("UTF-8")
        val got = WinnowImpl.winnow(bytes, k, w).toLongArray().toSeq
        val m = math.max(bytes.length - k + 1, 1)
        val hs = (0 until m).map { i =>
          bytes.slice(i, math.min(i + k, bytes.length))
            .foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xffL)) % 1000000007L)
        }
        val numW = math.max(m - w + 1, 1)
        val expect = (0 until numW).map(j => hs.slice(j, math.min(j + w, m)).min)
          .distinct.sorted
        assert(got == expect, s"input='$s' k=$k w=$w")
    }
  }

  test("TrigramLm == naive code-point scorer (incl. supplementary plane)") {
    // Texts mixing ASCII, BMP multibyte, and supplementary-plane code points
    // (surrogate PAIRS in the JVM String) — the regime where a code-UNIT
    // walk scores surrogate-half trigrams that can never hit a model trained
    // on code-point trigrams.
    val planeText: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(33.toChar, 126.toChar).map(_.toString),
      2 -> Gen.oneOf("é", "中", "€"),
      2 -> Gen.oneOf("😀", "🎉", "🚀"), // 😀 🎉 🚀
      1 -> Gen.const(" "))).map(_.mkString)
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    cases(Gen.zip(planeText, planeText), 200).foreach { case (train, text) =>
      // Model: every code-point trigram of `train`, logp = -(rank+1)/7.
      val cps = train.codePoints().toArray
      val trigrams = if (cps.length < 3) Seq.empty[String]
        else (0 to cps.length - 3).map(i => new String(cps, i, 3)).distinct
      val langs = Array("aa", "bb")
      val logps = trigrams.zipWithIndex
        .map { case (t, i) => t -> Array(-(i % 7 + 1) / 7.0, -(i % 5 + 1) / 5.0) }
        .toMap
      val floor = -9.25
      val table = new java.util.HashMap[UTF8String, Array[Double]]()
      logps.foreach { case (t, a) => table.put(UTF8String.fromString(t), a) }
      val lm = new graft.functions.TrigramLm(
        langs.map(UTF8String.fromString), table, floor)
      // Naive reference walks String code points.
      val tcps = text.codePoints().toArray
      val n = tcps.length - 2
      if (n > 0) {
        val grams = (0 until n).map(i => new String(tcps, i, 3))
        val expectMean = round6(
          grams.map(g => logps.get(g).map(_(0)).getOrElse(floor)).sum / n)
        assert(lm.meanLogP(UTF8String.fromString(text)) == expectMean,
          s"meanLogP diverged on train='$train' text='$text'")
        val sums = Array(0.0, 0.0)
        grams.foreach(g => logps.get(g).foreach { a =>
          sums(0) += a(0); sums(1) += a(1)
        })
        val r = Array(round6(sums(0)), round6(sums(1)))
        val best = if (r(1) > r(0)) 1 else 0
        val got = lm.predict(UTF8String.fromString(text))
        assert(got.getUTF8String(0).toString == langs(best) &&
          got.getDouble(1) == r(best),
          s"predict diverged on train='$train' text='$text'")
      } else {
        assert(lm.meanLogP(UTF8String.fromString(text)).isNaN)
      }
    }
  }

  test("HyperplaneBuckets == naive per-plane double dot") {
    val planes = HyperplaneBucketsImpl.planes(4, 3, 8)
    val vecGen = Gen.listOfN(8, Gen.choose(-5.0f, 5.0f)).map(_.toArray)
    cases(vecGen).foreach { v =>
      val got = HyperplaneBucketsImpl.buckets(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), planes, 4, 3)
        .toIntArray().toSeq
      val expect = (0 until 4).map { t =>
        (0 until 3).map { i =>
          val p = planes(t * 3 + i)
          val dot = (0 until 8).map(j => v(j).toDouble * p(j)).sum
          if (dot >= 0) 1 << i else 0
        }.sum
      }
      assert(got == expect)
    }
  }
}
