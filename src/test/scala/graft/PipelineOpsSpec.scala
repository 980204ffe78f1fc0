package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Contract tests for the LLM-pipeline operators whose outputs are not
  * SQL-oracle-hashable: approximate ANN recall, lang-ID sanity, simhash
  * locality, decode-stub plumbing. The hashable ones are covered by the
  * DuckDB gate (tools/check_oracle.py). */
class PipelineOpsSpec extends SparkSpec {

  test("ann lsh: recall vs brute-force top-10 is usable and never fabricates") {
    val exact = Similarity.queries("q60_knn_bruteforce")(spark, sf001)
      .select("qid", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annLsh(spark, sf001).select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every ANN hit must be a real vector pair with qid<5
    assert(approx.forall { case (q, n) => q < 5 && n != q })
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"LSH recall@10 = $recall (${approx.size} candidates returned)")
    assert(recall > 0.05, "LSH found nothing from the exact top-k at all")
  }

  test("topPairs: equals exact ranking restricted to LSH candidate pairs") {
    // Independent driver-side replay: same 9-decimal plane literals, same
    // sign rule, exact cosine over candidate pairs only.
    val vecs = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
    val planes = (0 until 32).map(p => Similarity.planeLits(p, 64).map(_.toDouble))
    def buckets(v: Array[Float]): Set[(Int, Int)] = (0 until 8).map { t =>
      t -> (0 until 4).map { i =>
        val pl = planes(t * 4 + i)
        var dot = 0.0
        for (j <- v.indices) dot += v(j).toDouble * pl(j)
        if (dot >= 0) 1 << i else 0
      }.sum
    }.toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bmap = vecs.map { case (id, v) => id -> buckets(v) }.toMap
    val expected = (for {
      (i, vi) <- vecs; (j, vj) <- vecs
      if i < j && (bmap(i) intersect bmap(j)).nonEmpty
    } yield (cos(vi, vj), i, j))
      .sortBy { case (c, i, j) => (-c, i, j) }.take(20)
      .map { case (c, i, j) =>
        (i, j, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    val got = Similarity.queries("q61_embedding_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected,
      s"LSH-candidate top-pairs drift; got=${got.take(3)} exp=${expected.take(3)}")
  }

  test("simhash: identical texts collide, near-dup pair is hamming-close") {
    val sh = Dedup.queries("q52_simhash")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q53 found exact-jaccard >= 0.5 near-dup pairs; their simhashes must be
    // closer than the corpus median pairwise distance.
    val pairs = Dedup.queries("q53_ngram_jaccard")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearDists = pairs.map { case (a, b) => ham(sh(a), sh(b)) }
    val ids = sh.keys.toArray.sorted.take(80)
    val background = for (i <- ids.indices; j <- (i + 1) until ids.length)
      yield ham(sh(ids(i)), sh(ids(j)))
    val bgMedian = background.sorted.apply(background.size / 2)
    info(s"near-dup hamming: ${nearDists.mkString(",")}; background median: $bgMedian")
    assert(nearDists.max < bgMedian,
      "near-duplicate documents should have closer simhashes than random pairs")
  }

  test("simhash native expression == aggregate formulation (incl. token-less docs)") {
    import spark.implicits._
    val base = Tables.documents(spark, sf0001).select("doc_id", "text")
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "solo"))
      .toDF("doc_id", "text")
    val docs = base.union(edge)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = m(Dedup.simHash(docs, "doc_id", "text"))
    val agg = m(Dedup.simHashAgg(docs, "doc_id", "text"))
    assert(native == agg, "native one-pass simhash drifted from the aggregate model")
    assert(!native.contains(9001L) && !native.contains(9002L),
      "token-less docs must produce no row (aggregate-form behavior)")
  }

  test("minhash native signature == aggregate formulation on the fixture") {
    import spark.implicits._
    val base = Tables.documents(spark, sf0001).select("doc_id", "text")
    val edge = Seq((9001L, "two words"), (9002L, "a b c")).toDF("doc_id", "text")
    val docs = base.union(edge)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq).toMap
    graft.functions.GraftFunctions.register(spark)
    val native = m(docs
      .select(col("doc_id"), expr("graft_minhash_sig(text)").as("sg"))
      .filter(size(col("sg")) > 0))
    val agg = m(Dedup.minHashSigAgg(docs, "doc_id", "text"))
    assert(native == agg, "native one-pass signature drifted from the aggregate model")
    assert(!native.contains(9001L) && native.contains(9002L))
  }

  test("minhash estimate correlates with exact jaccard on found pairs") {
    val est = Dedup.queries("q51_minhash_lsh")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.queries("q53_ngram_jaccard")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = est.keySet intersect exact.keySet
    assert(common.nonEmpty, "LSH should surface at least one true near-dup pair")
    val errs = common.toSeq.map(k => math.abs(est(k) - exact(k)))
    info(s"${common.size} common pairs, mean |est-exact| = ${errs.sum / errs.size}")
    assert(errs.sum / errs.size < 0.25)
  }

  test("ivf ann: equals exact search restricted to probed partitions") {
    // Driver-side independent reimplementation (2000 × 64 floats — tiny).
    val vecs = Tables.embeddings(spark, sf001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val centroids = vecs.groupBy(_._2).map { case (lbl, vs) =>
      lbl -> Array.tabulate(64)(i => (vs.map(_._3(i).toDouble).sum / vs.size).toFloat)
    }
    val expected = (0L until 5L).flatMap { qid =>
      val qe = vecs.find(_._1 == qid).get._3
      val probed = centroids.toSeq.map { case (l, c) => (cos(qe, c), l) }
        .sortBy { case (c, l) => (-c, l) }.take(3).map(_._2).toSet
      vecs.filter(v => probed.contains(v._2) && v._1 != qid)
        .map(v => (cos(qe, v._3), v._1))
        .sortBy { case (c, id) => (-c, id) }.take(10).zipWithIndex
        .map { case ((c, id), i) =>
          (qid, i + 1, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toSet
    val got = graft.operators.Similarity.queries("q64_ann_ivf")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4))).toSet
    assert(got == expected,
      s"IVF mechanism drift; only-got=${(got diff expected).take(3)} only-exp=${(expected diff got).take(3)}")
  }

  test("connected components: edge endpoints share components, labels are minima") {
    val edges = Dedup.queries("q53_ngram_jaccard")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = Dedup.queries("q54_neardup_components")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"edge ($a,$b) split across components")
    }
    comp.foreach { case (id, c) =>
      assert(c <= id, "component label must be the component's min id")
      assert(comp(c) == c, "the component representative labels itself")
    }
    // exactly the nodes that appear in edges are labeled
    assert(comp.keySet == edges.flatMap(e => Seq(e._1, e._2)).toSet)
  }

  test("lang-id predicts only known languages and is deterministic") {
    val df = TextAnalysis.queries("q44_lang_id")(spark, sf0001)
    val langs = Tables.documents(spark, sf0001).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    assert(rows.forall(r => langs.contains(r.getAs[String]("predicted_lang"))))
    val again = TextAnalysis.queries("q44_lang_id")(spark, sf0001).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("decode stub pipeline: schema, determinism, histogram sums to 1") {
    val df = Multimodal.queries("q71_decode_features")(spark, sf0001)
    assert(df.schema.fieldNames.sameElements(
      Array("doc_id", "width", "height", "features", "thumb")))
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      // features/thumb are canonicalized to strings for the driver dump:
      // comma-joined decimal(12,6) histogram bins, hex-encoded thumb bytes.
      val f = r.getAs[String]("features").split(',').map(_.toFloat)
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3, s"histogram not normalized: ${f.toSeq}")
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1)
      assert(r.getAs[String]("thumb").length == 64, "resize stub shape (32 bytes hex)")
    }
  }

  test("dedup ops tolerate documents with fewer than 3 tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one"), (2L, "two words"), (3L, ""),
      (4L, "a b c d e f g"), (5L, "a b c d e f g")).toDF("doc_id", "text")
    // short docs simply produce no shingles (matches the oracle's range(1,
    // len-1) empty-list behavior) — must not throw element_at(toks, 0)
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text").collect()
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((4L, 5L)))
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text").collect()
    assert(jac.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set((4L, 5L, 1.0)))
  }

  test("setSimilarityJoin: equals brute-force all-pairs Jaccard on a seeded corpus") {
    import spark.implicits._
    // 60 docs over a 12-token vocab — the tiny-vocabulary adversarial
    // regime where every token is corpus-hot and prefixes barely prune.
    // Sizes span 1..24 to cross every ⌈τ·sz⌉ integer boundary (incl. the
    // sz=10/20 values where a float ceil(0.9·sz) rounds UP and would
    // shorten the prefix below the completeness bound).
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'l').map(_.toString)
    val docs = ((1L to 58L).map { i =>
      val n = 1 + rnd.nextInt(24)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((59L, ""), (60L, "a b c d e f g h i j"))).toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val sets = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSet)
    val want = (for {
      (i1, s1) <- sets; (i2, s2) <- sets if i1 < i2
      inter = (s1 intersect s2).size.toLong
      union = (s1 union s2).size
      if union > 0
      // exact integer threshold (true J >= 9/10), matching the operator:
      // the rounded j is output-only
      if inter * 10 >= union * 9
      j = BigDecimal(inter.toDouble / union)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (i1, i2, inter, j)).toSet
    assert(got == want, "prefix-filtered join must equal brute force exactly")
    assert(want.nonEmpty, "fixture must actually exercise the threshold")
  }

  test("setSimilarityJoinCapped: all-duplicates corpus bounds to maxFam^2/2 flagged pairs; clean corpus matches uncapped") {
    import spark.implicits._
    // The 100 TB homogeneous-shard nightmare in miniature: 100 IDENTICAL
    // docs. Uncapped truth is C(100,2) = 4950 pairs; the valve must bound
    // the answer to C(8,2) = 28 pairs over the first 8 ids, every one
    // flagged capped (the family knowingly dropped members).
    val dups = (1L to 100L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val capped = Dedup.setSimilarityJoinCapped(dups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(capped.length == 28,
      s"expected C(8,2)=28 capped pairs, got ${capped.length}")
    assert(capped.forall(_._3), "every pair from a truncated family must be flagged")
    assert(capped.forall(p => p._1 <= 8 && p._2 <= 8),
      "member cap must keep the id-ordered prefix of the family")
    // A corpus with small duplicate families (< maxFamilySize) must be
    // untouched: same pairs as the uncapped operator, all flags false.
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'l').map(_.toString)
    val clean = (1L to 40L).map { i =>
      val n = 1 + rnd.nextInt(20)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoinCapped(clean, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.forall(!_._5), "no family truncates below the cap")
    val uncapped = Dedup.setSimilarityJoin(clean, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSet == uncapped.toSet,
      "below the cap, the valve must be a no-op on the pair set")
  }

  test("setSimilarityJoin: signature join keys on digests, not tokens; dups survive") {
    import spark.implicits._
    // The hot-token regime that breaks prefix filtering: every doc shares
    // token 'hot'. The signature join must key on whole part-content
    // digests, so 'hot' alone never becomes a join key — only docs with an
    // identical part survive to verify.
    val docs = (1L to 40L).map { i =>
      (i, s"hot u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h u${i}i")
    }.toDF("doc_id", "text")
    val out = Dedup.setSimilarityJoin(docs, "doc_id", "text").collect()
    assert(out.isEmpty, "one shared token must not produce J >= 0.9 pairs")
    val plan = Dedup.setSimilarityJoin(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // r21: the part digest is xxhash64 over the part's slice of the sorted
    // token hashes (was md5 over concatenated token text) — same
    // identical-content ⇒ identical-signature property, 8-byte join key.
    assert(plan.contains("xxhash64") && plan.contains("pmod"),
      "candidates must join on pigeonhole part digests")
    // identical docs always survive (completeness sanity at the extreme)
    val dup = Seq((1L, "p q r s t u v w x y"), (2L, "p q r s t u v w x y"))
      .toDF("doc_id", "text")
    val pairs = Dedup.setSimilarityJoin(dup, "doc_id", "text").collect()
    assert(pairs.length == 1 && pairs.head.getDouble(3) == 1.0)
  }

  test("ngramJaccard df-cap drops frequent shingles from the join fan-out") {
    import spark.implicits._
    // 'x y z' appears in every doc (boilerplate); each doc also has a unique
    // tail. With maxDf=2 the boilerplate shingle is excluded from index and
    // sizes, so no pair reaches J >= 0.5 through it.
    val docs = (1L to 6L).map(i => (i, s"x y z u$i v$i w$i")).toDF("doc_id", "text")
    val guarded = Dedup.ngramJaccard(docs, "doc_id", "text", minJ = 0.1, maxDf = 2)
    assert(guarded.count() == 0, "frequent shingle must not generate pairs")
    val unguarded = Dedup.ngramJaccard(docs, "doc_id", "text", minJ = 0.1, maxDf = 1000)
    assert(unguarded.count() == 6L * 5 / 2, "default cap keeps exact semantics")
  }

  test("minhash band-df cap: a hot exact-duplicate cluster cannot go quadratic") {
    import spark.implicits._
    // 300 identical docs share all 8 band signatures — uncapped, that is
    // 300²/2 candidate rows PER BAND (the crawl-corpus boilerplate blowup).
    val hot = (1L to 300L).map(i => (i, "the same boilerplate page text repeated verbatim"))
    val docs = (hot ++ Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta"),
      (1002L, "totally different content with no overlap at all"))).toDF("doc_id", "text")
    val capped = Dedup.minHashLsh(docs, "doc_id", "text", maxBandDf = 100)
    assert(capped.filter(col("id1") <= 300L).isEmpty,
      "capped band must not emit candidates from the hot cluster")
    // The composed pipeline still dedups the cluster: the exact-first
    // collapse sends ONE representative into the band join.
    val keepers = Dedup.dedupNearDup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 300L).foreach(i => assert(keepers(i) == 1L,
      s"copy $i must keep the cluster minimum, got ${keepers(i)}"))
    assert(keepers(1001L) == 1001L && keepers(1002L) == 1002L)
  }

  test("topPairs bucket-df cap: a degenerate embedding cluster cannot go quadratic") {
    import spark.implicits._
    // 300 identical vectors land in the same bucket of every table — 300²/2
    // candidate rows per table uncapped. With the cap they are excluded.
    val v = Array.fill(8)(0.5f)
    val rows = (1L to 300L).map(i => (i, v)).toDF("vec_id", "embedding")
    val capped = Similarity.topPairs(rows, "vec_id", "embedding", 8,
      topN = 50, maxBucketDf = 100)
    assert(capped.isEmpty, "capped bucket must not emit candidate pairs")
  }

  test("dedupNearDup: exact-first collapse is output-preserving vs the uncollapsed form") {
    val docs = Tables.documents(spark, sf0001)
    val composed = Dedup.dedupNearDup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Reference: the round-3 formulation — LSH over ALL docs, then CC.
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text")
    val comp = Dedup.connectedComponents(pairs, "id1", "id2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> comp.getOrElse(id, id)).toMap
    assert(composed == expected)
  }

  test("dedupNearDup folds exact duplicates even when too short to shingle") {
    import spark.implicits._
    // 2-token texts yield no MinHash signature, so the uncollapsed LSH form
    // would leave every copy to itself; the exact-collapse must still fold
    // them (and the q55 oracle replays exactly this).
    val docs = Seq((1L, "hi there"), (2L, "hi there"), (3L, "bye now"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupNearDup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("dedupNearDup: no candidate pairs short-circuits to identity keepers") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh"), (3L, "ii jj kk ll"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupNearDup(docs, "doc_id", "text").collect()
    assert(out.length == 3 && out.forall(r => r.getLong(1) == r.getLong(0)))
  }

  test("scrub masks every match and counts the redactions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob@mail.com or alice@corp.io today"),
      (2L, "no pii here at all"),
      (3L, "customer data for customer x")).toDF("doc_id", "text")
    val out = TextAnalysis.scrub(docs, "doc_id", "text",
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}|\\bcustomer\\b", "<PII>")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 2 &&
      out(0).getString(2) == "contact <PII> or <PII> today")
    assert(out(1).getInt(1) == 0 && out(1).getString(2) == "no pii here at all")
    assert(out(2).getInt(1) == 2 &&
      out(2).getString(2) == "<PII> data for <PII> x")
    // Metacharacter masks are inserted literally, never parsed as group
    // references ("$0" would re-insert the PII; "$" alone would throw).
    val dollar = TextAnalysis.scrub(docs, "doc_id", "text",
        "\\bcustomer\\b", "$0\\").orderBy("doc_id").collect()
    assert(dollar(2).getString(2) == "$0\\ data for $0\\ x")
  }

  test("stratified sample: exactly k per stratum, stable under repartitioning") {
    val docs = Tables.documents(spark, sf001)
    val s1 = TextAnalysis.stratifiedSample(docs, "source", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val perStratum = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 3), s"uneven strata: $perStratum")
    // Determinism claim: membership is a pure function of the ids, not of
    // the physical layout — a 7-way repartition must select the same rows.
    val s2 = TextAnalysis.stratifiedSample(docs.repartition(7), "source",
        "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(s1 == s2, "sample membership changed with physical partitioning")
  }

  test("repetition signals on crafted docs match hand-computed fractions") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: words [a,a,a,b] → top word 3/4; bigrams [a a, a a, a b] → 2/3;
    // dup fraction 1 - 2/4.
    assert(out(0).getInt(1) == 4)
    assert(out(0).getDouble(2) == 0.75)
    assert(out(0).getDouble(3) == 0.6667)
    assert(out(0).getDouble(4) == 0.5)
    assert(!out(0).getBoolean(5), "4-word doc must fail the n_words gate")
    // doc 2: one token — no bigrams, left join must coalesce to 0.0.
    assert(out(1).getInt(1) == 1 && out(1).getDouble(3) == 0.0)
  }

  test("bm25 on crafted docs matches a driver-side replay of the formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark io io"), // tf(spark)=3, dl=5
      (2L, "spark io"),                // tf(spark)=1, dl=2
      (3L, "io io io io"),             // no query term → filtered out
      (4L, "dup spark")                // rare term dominates
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("spark", "dup"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // Independent replay: N=4, avgdl=13/4, df(spark)=3, df(dup)=1.
    val (k1, b) = (1.2, 0.75)
    def idf(dfc: Long) = math.log(1.0 + (4L - dfc + 0.5) / (dfc + 0.5))
    def term(tf: Long, dl: Long, dfc: Long) =
      idf(dfc) * (tf * (k1 + 1.0)) / (tf + (1.0 - b + (dl * b) / 3.25) * k1)
    def score(tfS: Long, tfD: Long, dl: Long) =
      BigDecimal(term(tfS, dl, 3) + term(tfD, dl, 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Map(1L -> score(3, 0, 5), 2L -> score(1, 0, 2),
      4L -> score(1, 1, 2))
    // doc 3 scores 0 on every query term and must not appear at all
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L))
    assert(got.toMap.forall { case (id, s) =>
      math.abs(s - expect(id)) <= 0.0001 }, // replay rounds independently
      s"got ${got.toMap}, expected $expect")
    // ranking: doc 4 (rare term) above 2 (same length, common term only)
    val rank = got.map(_._1).toSeq
    assert(rank.indexOf(4L) < rank.indexOf(2L))
  }

  test("repetition signals == naive per-doc model over seeded random word bags") {
    import spark.implicits._
    // Tiny vocabulary forces heavy repetition — the regime the thresholds
    // discriminate in, which the near-uniform fixture docs barely reach.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff")
    val docs = (1L to 150L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val out = TextAnalysis.repetitionSignals(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val w = text.split(' ').filter(_.nonEmpty).toSeq
      val counts = w.groupBy(identity).view.mapValues(_.size)
      val bgs = w.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val r = out(id)
      assert(r.getInt(1) == w.size, s"doc $id n_words")
      assert(r.getDouble(2) == rnd4(counts.values.max.toDouble / w.size),
        s"doc $id top_word_frac ('$text')")
      val expTb = if (bgs.isEmpty) 0.0
        else rnd4(bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size)
      assert(r.getDouble(3) == expTb, s"doc $id top_bigram_frac ('$text')")
      assert(r.getDouble(4) == rnd4(1.0 - counts.size.toDouble / w.size),
        s"doc $id dup_frac ('$text')")
    }
  }

  test("contamination: eval population is exactly hashSplit's valid docs") {
    val docs = Tables.documents(spark, sf001)
    val contam = TextAnalysis.contamination(docs, "doc_id", "text").collect()
    val valid = TextAnalysis.hashSplit(docs, "doc_id")
      .filter(col("split") === "valid").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // every fixture doc has >= 3 tokens, so no eval doc is shingle-less
    assert(contam.map(_.getLong(0)).toSet == valid,
      "contamination's inline md5 split diverged from hashSplit's")
    contam.foreach { r =>
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0 && r.getInt(2) <= r.getInt(1))
      assert(r.getBoolean(4) == (frac >= 0.6), "flag must follow the rounded frac")
    }
  }

  test("operator outputs are invariant to the shuffle-partition count") {
    // The knob a cluster deployment actually turns: every operator's rows
    // must be a pure function of the data, not of how many partitions the
    // exchanges use. One shuffle-heavy representative per family.
    val docs = Tables.documents(spark, sf0001)
    def run(): Seq[Set[String]] = Seq(
      Dedup.minHashLsh(docs, "doc_id", "text"),
      TextAnalysis.tfidf(docs, "doc_id", "text"),
      TextAnalysis.contamination(docs, "doc_id", "text"),
      TextAnalysis.repetitionSignals(docs, "doc_id", "text"),
    ).map(_.collect().map(_.toString).toSet)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val wide = run()
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val narrow = run()
      wide.zip(narrow).zipWithIndex.foreach { case ((w, n), i) =>
        assert(w == n, s"operator #$i changed output with partition count")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("chunkDocuments: coverage, overlap, and tail invariants") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 toks → 2 chunks @64/16
      (2L, "a b c"),                                   // short → 1 chunk of 3
      (3L, ""),                                        // empty → no chunks
      (4L, (1 to 64).map(i => s"x$i").mkString(" ")),  // exactly one window
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 64, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(3L), "empty doc must yield no chunks")
    assert(byDoc(2L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0, "a b c", 3)))
    assert(byDoc(4L).map(_._2).toSeq == Seq(0) && byDoc(4L).head._4 == 64)
    // 100 tokens, stride 48: n_chunks = 1 + ceil((100-64)/48) = 2, covering
    // [0,64) and [48,100) — sizes 64 and 52, every token reached.
    val c1 = byDoc(1L).sortBy(_._2)
    assert(c1.map(_._2).toSeq == Seq(0, 1))
    assert(c1.map(_._4).toSeq == Seq(64, 52))
    // Every token index appears in at least one chunk (full coverage), and
    // consecutive chunks share exactly the 16-token overlap.
    val toks1 = (1 to 100).map(i => s"w$i")
    val chunkToks = c1.map(_._3.split(' ').toSeq)
    assert(chunkToks.flatten.toSet == toks1.toSet)
    assert(chunkToks(0).takeRight(16) == chunkToks(1).take(16))
  }

  test("chunkDocuments rejects inputs carrying reserved working columns") {
    import spark.implicits._
    val bad = Seq((1L, "a b c", 9)).toDF("doc_id", "text", "n_tok")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(bad, "doc_id", "text", 8, 2)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("langModel: driver-side model is bounded to langs×K on wide vocab") {
    import spark.implicits._
    // 2 langs × 500 distinct trigrams each — the open-vocab regime where an
    // uncapped collect would scale with the corpus. Frequencies vary so the
    // (tn desc, trigram asc) cap has real work to do.
    val tri = (for {
      lang <- Seq("aa", "bb")
      i <- 1 to 500
      _ <- 1 to (i % 7 + 1)
    } yield (lang, f"$lang$i%04d")).toDF("lang", "trigram")
    val k = 50
    val (langs, model) = TextAnalysis.langModel(tri, k)
    assert(langs.toSeq == Seq("aa", "bb"))
    assert(model.size <= langs.length * k,
      s"model holds ${model.size} trigrams, cap is ${langs.length * k}")
    // Each lang keeps exactly k entries (vocab 500 ≫ k); the other lang's
    // slot stays 0.0 because the vocabularies are disjoint.
    val perLang = langs.indices.map(j => model.values.count(arr => arr(j) != 0.0))
    assert(perLang.forall(_ == k), s"per-lang kept entries: $perLang != $k")
  }

  test("simHashNearDup: equals exact all-pairs Hamming<=3 on the fixture") {
    // 4x15-bit banding is a candidate SUPERSET for Hamming <= 3 (pigeonhole)
    // and the bit_count filter is exact, so with the band-df cap not binding
    // (fixture df << 1000) the operator must equal the brute-force answer.
    val docs = Tables.documents(spark, sf0001)
    val sig = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expect = (for {
      (i1, h1) <- sig; (i2, h2) <- sig
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2, java.lang.Long.bitCount(h1 ^ h2))).toSet
    val got = Dedup.simHashNearDup(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"banded join diverged from brute force: ${got.size} vs ${expect.size} pairs")
    assert(got.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("fuzzyJoin: equals brute-force blocked edit distance; cap bounds hot blocks") {
    import spark.implicits._
    val rows = Seq(
      (1L, "acme corporation"), (2L, "acme corp"), (3L, "acme corporatin"),
      (4L, "zenith labs"), (5L, "zenith lab"), (6L, "apex industries"),
      (7L, "akme corporation"), (8L, "totally different"))
    val df = rows.toDF("id", "nm")
    // Brute-force replay of the published semantics: same 4-char block,
    // length gap <= maxDist, exact Levenshtein <= maxDist.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (i1, t1) <- rows; (i2, t2) <- rows
      if i1 < i2 && t1.take(4) == t2.take(4) &&
        math.abs(t1.length - t2.length) <= 2 && lev(t1, t2) <= 2
    } yield (i1, i2, lev(t1, t2))).toSet
    val got = Dedup.fuzzyJoin(df, "id", "nm", maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect, s"fuzzy join diverged: $got vs $expect")
    assert(expect.contains((1L, 3L, 1)) && !expect.exists {
      case (a, b, _) => Set(a, b).contains(8L) }, "fixture sanity")
    // (1,7) differ inside the prefix -> never compared (blocking semantics).
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 7L) })
    // Hot block: 100 near-identical names, cap 10 -> at most 45 pairs, and
    // the kept rows are the 10 lowest ids (deterministic keeper rule).
    val hot = (1L to 100L).map(i => (i, s"samename$i")).toDF("id", "nm")
    val capped = Dedup.fuzzyJoin(hot, "id", "nm", maxDist = 3, maxBlockDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length <= 45, s"cap failed: ${capped.length} pairs")
    assert(capped.flatMap(p => Seq(p._1, p._2)).forall(_ <= 10L),
      "cap must keep the lowest-id rows per block")
  }

  test("sortedNeighborhood: equals brute-force windowed scan; blocks lose no pairs") {
    import spark.implicits._
    // 26 sort-adjacent variants force pairs across every rk div w block
    // boundary; the two null keys must be dropped, not sorted first.
    val rows = (0 until 26).map(i => (i.toLong, f"name$i%02d")) ++
      Seq((100L, "name07x"), (101L, "mame00"), (102L, null), (103L, null))
    val df = rows.toDF("id", "sk")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val w = 3
    val ranked = rows.filter(_._2 != null).sortBy(r => (r._2, r._1)).zipWithIndex
    val expect = (for {
      ((i1, s1), r1) <- ranked; ((i2, s2), r2) <- ranked
      if r2 > r1 && r2 - r1 < w && lev(s1, s2) <= 2
    } yield (i1, i2, (r2 - r1).toInt, lev(s1, s2))).toSet
    val got = Dedup.sortedNeighborhood(df, "id", "sk", w = w, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expect, s"SNM diverged: ${got.size} vs ${expect.size} pairs")
    // Block-boundary sanity: some expected pair must span adjacent blocks
    // (different rk div w), else the test never exercised the 2-block join.
    val rk = ranked.map { case ((id, _), r) => id -> r }.toMap
    assert(expect.exists { case (a, b, _, _) => rk(a) / w != rk(b) / w },
      "fixture must contain a cross-block pair")
    // SNM catches the prefix-divergent pair blocking misses: "mame00" sorts
    // adjacent to name00 (gap 1) though their 4-char prefixes differ.
    assert(got.exists { case (a, b, _, _) => Set(a, b).contains(101L) },
      "sort-key adjacency must catch the short-prefix variant")
  }

  test("bpeMerges: hand-replayed rounds — greedy runs, multi-char merges, tie order") {
    import spark.implicits._
    // corpus: "abab abab aaaa cd" -> pairs r1: (a,b)x4, (b,a)x2, (a,a)x3,
    // (c,d)x1 -> merge1 = ab(4). r2 symbols: [ab,ab]x2, [a,a,a,a], [c,d]:
    // pairs (ab,ab)x2, (a,a)x3, (c,d)x1 -> merge2 = aa(3) (greedy run
    // aaaa -> [aa][aa]). r3: (ab,ab)x2, (aa,aa)x1, (c,d)x1 -> merge3 =
    // abab(2). r4: (aa,aa)x1, (c,d)x1 -> tie: (aa,aa) < (c,d) -> aaaa.
    val docs = Seq("abab abab aaaa cd", "").toDF("text")
    val out = TextAnalysis.bpeMerges(docs, "text", rounds = 4)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toList
    assert(out == List((1, "ab", 4L), (2, "aa", 3L), (3, "abab", 2L),
      (4, "aaaa", 1L)), s"BPE replay diverged: $out")
  }

  test("bpeFertility: learned merges applied per word; exact counts and division") {
    import spark.implicits._
    // same corpus as the bpeMerges spec; after 4 rounds abab -> [abab],
    // aaaa -> [aaaa], cd -> [c, d]. Corpus words: abab x2, aaaa, cd
    // -> 4 words, 5 subwords, fertility 1.25.
    val docs = Seq(("g1", "abab abab aaaa cd")).toDF("lang", "text")
    val out = TextAnalysis.bpeFertility(docs, "text", "lang", rounds = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toList == List(("g1", 4L, 5L, 1.25)),
      s"fertility replay diverged: ${out.toList}")
  }

  test("containmentJoin: quote detected one direction; equals brute force; short docs drop") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val rows = Seq(
      (1L, quote), // fully quoted inside 2
      (2L, s"intro words here $quote and a long tail of unrelated tokens"),
      (3L, "totally disjoint content with many extra words"),
      (4L, "xy yz")) // < 3 tokens -> no shingles -> absent
    val df = rows.toDF("doc_id", "text")
    def shingles(t: String) =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val expect = (for {
      (i1, t1) <- rows; (i2, t2) <- rows
      if i1 != i2 && shingles(t1).nonEmpty && shingles(t2).nonEmpty
      // exact integer threshold (true C >= 4/5), matching the operator
      if shingles(t1).intersect(shingles(t2)).size * 5 >= shingles(t1).size * 4
    } yield (i1, i2)).toSet
    val got = Dedup.containmentJoin(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"containment diverged: $got vs $expect")
    // the asymmetry IS the feature: 1 ⊂ 2 but not 2 ⊂ 1 (Jaccard would
    // score this pair ~0.2 and symmetric joins at τ=0.8 would miss it).
    assert(got.contains((1L, 2L)) && !got.contains((2L, 1L)),
      "quote must be contained one direction only")
  }

  test("containmentJoinCapped: hot posting truncates to flagged id-prefix; cold corpus matches uncapped") {
    import spark.implicits._
    // 20 identical docs: every shingle's posting list holds all 20
    // containers. At maxPostings=5 each doc still probes and finds the
    // FIRST FIVE ids (minus itself), every pair flagged — output is
    // ~20×5 ordered pairs instead of the uncapped 20×19.
    val dups = (1L to 20L)
      .map(i => (i, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentJoinCapped(dups, "doc_id", "text",
        maxPostings = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(capped.forall(_._3), "every pair from a truncated posting is flagged")
    assert(capped.forall(_._2 <= 5),
      "containers must come from the id-ordered posting prefix")
    assert(capped.length == 5 * 4 + 15 * 5,
      s"ids 1-5 pair among themselves (5x4), ids 6-20 probe all of 1-5: got ${capped.length}")
    // Cold corpus (all postings below the cap): the valve is a no-op —
    // identical pair set to containmentJoin, all flags false.
    val cold = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta many extra words here"),
      (3L, "totally disjoint content with many extra words")).toDF("doc_id", "text")
    val got = Dedup.containmentJoinCapped(cold, "doc_id", "text",
        maxPostings = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(got.forall(!_._3), "no posting truncates below the cap")
    val want = Dedup.containmentJoin(cold, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(g => (g._1, g._2)).toSet == want,
      "below the cap, the valve must be a no-op on the pair set")
  }

  test("dedupAudit: P/R/F1 replayed from independently-collected channels") {
    val docs = Tables.documents(spark, sf0001)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Dedup.ngramJaccard(docs, "doc_id", "text")
      .select("id1", "id2"))
    val ap = pairs(Dedup.minHashLsh(docs, "doc_id", "text")
      .select("id1", "id2"))
    val tp = ap.intersect(truth).size
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Dedup.dedupAudit(docs, "doc_id", "text").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (truth.size.toLong, ap.size.toLong, tp.toLong), s"counts diverged: $row")
    assert(row.getDouble(3) == r6(tp.toDouble / ap.size) &&
      row.getDouble(4) == r6(tp.toDouble / truth.size), s"P/R diverged: $row")
    assert(truth.nonEmpty && ap.nonEmpty, "fixture must exercise both channels")
  }

  test("linkageScore: constant field stays finite (u clamps below 1)") {
    import spark.implicits._
    // 'c' is constant across rows and null on one: without the clamp the
    // disagreement weight is log2(0.05/0) = +Inf and the null pair would
    // score as the strongest possible match.
    val df = Seq((1L, "dup00", "x"), (2L, "dup00x", "x"), (3L, "dup01", null))
      .toDF("id", "nm", "c")
    val out = Dedup.linkageScore(df, "id", "nm", Seq("c"), m = 0.9, w = 3)
      .collect().map(_.getDouble(2))
    assert(out.nonEmpty && out.forall(s => !s.isInfinite && !s.isNaN),
      s"constant-field weights must stay finite: ${out.toSeq}")
  }

  test("linkageScore: hand-replayed FS weights; null fields disagree; u from histogram") {
    import spark.implicits._
    // 6 records, one SNM-adjacent name cluster; field f has values
    // x,x,x,y,y,null -> u = (3/6)^2 + (2/6)^2 = 13/36 over n = 6 (nulls
    // count in n, not in the histogram).
    val rows = Seq(
      (1L, "dup00", "x"), (2L, "dup00x", "x"), (3L, "dup01", "x"),
      (4L, "dup02", "y"), (5L, "dup03", "y"), (6L, "zzz", null))
    val df = rows.toDF("id", "nm", "f")
    val got = Dedup.linkageScore(df, "id", "nm", Seq("f"), m = 0.9, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(p => (p._1, p._2)).toList
    val u = 13.0 / 36.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val agree = r6(math.log(0.9 / u) / math.log(2.0))
    val disagree = r6(math.log(0.1 / (1 - u)) / math.log(2.0))
    // SNM pairs at w=3, d<=3 over sort order dup00,dup00x,dup01,dup02,dup03,zzz:
    // agreement on f for (1,2),(1,3),(2,3),(4,5); disagreement for
    // (2,4),(3,4),(3,5); zzz is > maxDist from every neighbor.
    val expect = List(
      (1L, 2L, agree, 1), (1L, 3L, agree, 1), (2L, 3L, agree, 1),
      (2L, 4L, disagree, 0), (3L, 4L, disagree, 0), (3L, 5L, disagree, 0),
      (4L, 5L, agree, 1))
    assert(got == expect, s"FS replay diverged:\n$got\nvs\n$expect")
  }

  test("vocabCoverage: hand replay, total order, coverage reaches 1.0 at full vocab") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a b c d"), (3L, "a  a")).toDF("doc_id", "text")
    // counts: a=6, b=3, c=2, d=1 (double space must not mint empty tokens)
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", topK = 3)
      .select("token", "cnt", "rank", "cum_frac")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._3)
    assert(got.toSeq == Seq(
      ("a", 6L, 1, 0.5), ("b", 3L, 2, 0.75), ("c", 2L, 3, math.BigDecimal(11.0/12).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      s"got ${got.mkString("; ")}")
    val full = TextAnalysis.vocabCoverage(docs, "doc_id", "text", topK = 10)
      .orderBy(col("rank")).collect()
    assert(full.length == 4 && full.last.getDouble(3) == 1.0,
      "full vocab must cover 1.0")
    // Deterministic under physical layout.
    val re = TextAnalysis.vocabCoverage(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(re == got.map(t => (t._1, t._3)).toSet)
  }

  test("corpusMix: quotas, prefix property, small groups taken whole, absent groups dropped") {
    val docs = Tables.documents(spark, sf0001)
    val w = Map("en" -> 0.5, "de" -> 0.5)
    val got = TextAnalysis.corpusMix(docs, "doc_id", "lang", w, 20L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.keySet == Set("en", "de"), s"absent langs leaked: $byLang")
    assert(byLang.values.forall(_ <= 10), s"quota exceeded: $byLang")
    // Prefix property: the n=20 draw is a per-group prefix of the n=40 draw.
    val bigger = TextAnalysis.corpusMix(docs, "doc_id", "lang", w, 40L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got.forall(bigger.contains), "growing n must only add rows")
    // Partitioning-invariant (md5 draw, not RNG).
    val re = TextAnalysis.corpusMix(docs.repartition(7), "doc_id", "lang", w, 20L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(re == got.toSet)
    // A quota larger than the group takes the whole group, no padding.
    val tiny = TextAnalysis.corpusMix(docs, "doc_id", "lang",
      Map("de" -> 1.0), 100000L).collect()
    val nDe = docs.filter(col("lang") === "de").count()
    assert(tiny.length == nDe, s"${tiny.length} vs $nDe")
    // The constant max-quota bound compiles to a WindowGroupLimit partial.
    val plan = TextAnalysis.corpusMix(docs, "doc_id", "lang", w, 20L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit partial in:\n$plan")
  }

  test("weightedSample: partitioning-invariant and prefix-consistent") {
    val docs = Tables.documents(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = rows(TextAnalysis.weightedSample(docs, "doc_id", "n_chars", 20))
    assert(a.size == 20)
    // Same draw regardless of physical layout (md5-derived keys, not RNG).
    val b = rows(TextAnalysis.weightedSample(
      docs.repartition(7), "doc_id", "n_chars", 20))
    assert(a == b, "sample depends on partitioning")
    // A-ES prefix property: the top-20 of a top-40 draw IS the top-20 draw.
    val c = rows(TextAnalysis.weightedSample(docs, "doc_id", "n_chars", 40))
    assert(c.take(20) == a, "k=40 prefix diverged from k=20 draw")
  }

  test("lmScore: reference-slice docs outscore off-distribution docs") {
    // The en-trained trigram LM must rate en documents above every other
    // lang's mean — the discriminative property the perplexity bucketing
    // depends on (same signal q44's argmax exploits).
    val docs = Tables.documents(spark, sf0001)
    val means = TextAnalysis.lmScore(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang").agg(avg("lm_score").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means.contains("en") && means.size > 1, s"fixture langs: ${means.keySet}")
    means.filter(_._1 != "en").foreach { case (l, m) =>
      assert(means("en") > m, s"en mean ${means("en")} not above $l mean $m")
    }
  }

  test("simHashNearDup cap contract: an over-cap identical-text flood drops " +
      "its pairs; simHashDedup folds it anyway") {
    import spark.implicits._
    // 12 identical docs + 2 distinct: every band of the flood has df=12, so
    // at maxBandDf=10 the raw pair operator must emit NO pairs for the flood
    // (the documented dropped-pair semantics — identical texts are exactly
    // the pairs the cap sacrifices to stay non-quadratic).
    val flood = (1L to 12L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val docs = (flood ++ Seq(
      (20L, "one two three four five six"),
      (21L, "unrelated text entirely here now"))).toDF("doc_id", "text")
    val rawPairs = Dedup.simHashNearDup(docs, "doc_id", "text", maxBandDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rawPairs.forall { case (a, b) => a >= 20L && b >= 20L },
      s"capped flood leaked pairs: $rawPairs")
    // The pipeline form collapses exact duplicates FIRST (keeper = md5-group
    // min), so the flood folds to doc 1 regardless of the cap.
    val keeper = Dedup.simHashDedup(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 12L).foreach(i => assert(keeper(i) == 1L, s"doc $i keeper ${keeper(i)}"))
    assert(keeper(20L) == 20L && keeper(21L) == 21L)
  }

  test("langId + lmScore walk code points: supplementary-plane corpus scores") {
    import spark.implicits._
    // Emoji are surrogate PAIRS in UTF-16: a code-unit scorer would slice
    // half-surrogate "trigrams" that never hit the model (score 0 / floor
    // everywhere) and would report n_tri != codepoints-2.
    val t1 = "😀🎉🚀😀🎉🚀😀" // 7 code points, 14 UTF-16 units
    val t2 = "🎉🚀😀🎉🚀😀🎉"
    val docs = Seq((1L, t1, "em"), (2L, t2, "em")).toDF("doc_id", "text", "lang")
    val pred = TextAnalysis.langId(docs, "doc_id", "text", "lang").collect()
    pred.foreach { r =>
      assert(r.getString(2) == "em")
      assert(r.getDouble(3) < 0.0,
        s"doc ${r.getLong(0)} scored ${r.getDouble(3)} — model never hit (code-unit walk?)")
    }
    val scored = TextAnalysis.lmScore(docs, "doc_id", "text", lit(true)).collect()
    assert(scored.length == 2)
    scored.foreach { r =>
      assert(r.getAs[Number]("n_tri").longValue == 5L,
        s"n_tri ${r.getAs[Number]("n_tri")} != codepoints-2")
      // Every trigram is in-model: mean logp must sit well above the
      // unseen-trigram floor ln(1/(N+1000)) ~= -6.9 for this tiny corpus.
      assert(r.getDouble(2) > -6.5,
        s"lm_score ${r.getDouble(2)} at the floor — scored trigrams missed the model")
    }
  }

  test("exact dedup keeper: keeper_id <= doc_id and keepers are fixpoints") {
    val rows = Dedup.queries("q50_exact_dedup")(spark, sf0001).collect()
    val keeper = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(keeper(r.getLong(1)) == r.getLong(1), "keeper must keep itself")
      assert(r.getBoolean(2) == (r.getLong(0) != r.getLong(1)))
    }
  }

  /** q153's load-bearing claim, asserted directly: screening a new batch
    * against the stored signature index is EXACTLY full-corpus LSH
    * restricted to batch-touching pairs — no recall is lost by not
    * re-signing the corpus. */
  test("incrementalNearDup == full-corpus LSH restricted to batch-touching pairs") {
    val docs = Tables.documents(spark, sf0001)
    val index = Dedup.minHashIndex(
      docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
    val inc = Dedup.incrementalNearDup(
      docs.filter(col("doc_id") % 5 === 0), index, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    val full = Dedup.minHashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
      .map(p => (p._1, p._2, p._3,
        if (p._1 % 5 == 0 && p._2 % 5 == 0) "batch" else "corpus"))
      .toSet
    assert(inc == full)
    assert(inc.nonEmpty, "fixture must exercise at least one batch-touching pair")
  }
}
