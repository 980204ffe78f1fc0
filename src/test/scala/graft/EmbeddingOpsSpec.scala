package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity}

/** Round-8 embedding/statistics operators: covariance matrix (q131), int8
  * quantization (q132), table profiling (q133). */
class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingCovariance matches a hand-computed 2-dim case") {
    // vectors (1,2), (3,4), (5,12): var(x)=4, var(y)=28, cov(x,y)=10 (sample)
    val df = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)), (3L, Array(5.0f, 12.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingCovariance(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((0, 0)) == 4.0)
    assert(out((0, 1)) == 10.0)
    assert(out((1, 1)) == 28.0)
    assert(out.size == 3) // upper triangle only
  }

  /** The distributed tree merge (forced via driverMergeMax=1, fanIn=2 —
    * multiple levels over the 8 input partitions) must produce the same
    * 6-dp-rounded matrix as the default bounded driver merge: same combine
    * algebra, different grouping, the ulps absorbed by the rounding both
    * paths share. This is the no-driver-merge-above-threshold contract —
    * the 1000-executor path is the TESTED path, not a comment. */
  test("embeddingCovariance tree merge matches the driver merge on the fixture") {
    val emb = Tables.embeddings(spark, sf0001).repartition(8)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val driver = asMap(Similarity.embeddingCovariance(emb, "embedding"))
    val tree = asMap(Similarity.embeddingCovariance(emb, "embedding",
      driverMergeMax = 1, fanIn = 2))
    assert(tree == driver)
  }

  test("embeddingCovariance fails fast on a null vector element") {
    // InternalRow array reads would silently yield 0.0 for a null slot —
    // the guard must surface it instead of skewing the moments.
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding")
    val e = intercept[Exception] {
      Similarity.embeddingCovariance(df, "embedding").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null element")), s"got: $e")
  }

  test("embeddingCovariance diagonal equals per-dimension variance on the fixture") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.embeddingCovariance(emb, "embedding")
      .filter(col("i") === col("j")).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val vars = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(round(var_samp(col("x").cast("double")), 6).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out == vars)
  }

  test("quantizeInt8: codes bounded to [-127, 127], max-|x| cell codes to ±127, dequant error <= scale/254") {
    val df = Seq(
      (1L, Array(0.5f, -2.0f)), (2L, Array(-1.0f, 1.0f)), (3L, Array(0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // dim 0 scale = 1.0; dim 1 scale = 2.0
    assert(out((2L, 0)) == -127)            // -1.0 / 1.0 * 127
    assert(out((1L, 1)) == -127)            // -2.0 / 2.0 * 127
    assert(out((1L, 0)) == 64)              // 0.5 * 127 = 63.5 → half-up 64
    assert(out((3L, 1)) == 0)
    assert(out.values.forall(c => c >= -127 && c <= 127))
  }

  test("quantizeInt8 handles an all-zero dimension (scale 0 → code 0)") {
    val df = Seq((1L, Array(0.0f, 3.0f)), (2L, Array(0.0f, -3.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(out((1L, 0)) == 0 && out((2L, 0)) == 0)
    assert(out((1L, 1)) == 127 && out((2L, 1)) == -127)
  }

  test("profileTable: counts, nulls, distincts, integral min/max") {
    val df = Seq(
      (1L, Some("a"), Some(10)), (2L, None, Some(20)),
      (3L, Some("a"), None), (4L, Some("b"), Some(20)))
      .toDF("id", "s", "n")
    val out = Relational.profileTable(df, Seq("id", "s", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    assert(out("id") == ((4L, 4L, 0L, 4L, Some(1L), Some(4L))))
    assert(out("s") == ((4L, 3L, 1L, 2L, None, None)))
    assert(out("n") == ((4L, 3L, 1L, 2L, Some(10L), Some(20L))))
  }

  // ------------------------------------------------------- kMeans (q154)

  /** Two well-separated 2-D blobs, one seed in each (ids 1 and 2): Lloyd
    * converges in one round; centroids are the exact integer means and the
    * inertia the hand-computed Σ(q−c)². */
  test("kMeans recovers two separated blobs exactly") {
    val df = Seq(
      (1L, Array(0.1f, 0.2f)), (2L, Array(0.9f, 0.8f)),
      (3L, Array(0.12f, 0.18f)), (4L, Array(0.14f, 0.22f)),
      (5L, Array(0.88f, 0.84f)), (6L, Array(0.92f, 0.78f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kMeans(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // cluster 0 = blob around (0.12, 0.20) → milli centroid (120, 200)
    assert(out((0, 0)) == ((120L, 3L, 1600L)))
    assert(out((0, 1)) == ((200L, 3L, 1600L)))
    // cluster 1 = blob around (0.90, 0.807) → milli centroid (900, 807)
    assert(out((1, 0)) == ((900L, 3L, 2667L)))
    assert(out((1, 1)) == ((807L, 3L, 2667L)))
  }

  /** All-identical vectors with k=2: every point ties to the smaller
    * cluster id in every round, so cluster 1 is empty in every update and
    * must inherit its seed centroid (the left-join/coalesce path) with
    * n=0, inertia=0. */
  test("kMeans emptied cluster keeps its seed centroid") {
    val df = Seq(
      (1L, Array(0.5f, 0.25f)), (2L, Array(0.5f, 0.25f)), (3L, Array(0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kMeans(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out((1, 0)) == ((500L, 0L, 0L)))
    assert(out((1, 1)) == ((250L, 0L, 0L)))
    assert(out((0, 0)) == ((500L, 3L, 0L)))
  }

  /** hybridSearch (q158): a doc ranked by BOTH channels must out-fuse
    * single-channel docs; RRF values are the hand-computed 1/(60+rank)
    * sums. */
  test("hybridSearch fuses lexical and semantic ranks by RRF") {
    val docs = Seq(
      (1L, "vector vector vector"), (2L, "vector stuff here"),
      (3L, "nothing relevant x"), (4L, "more nothing y"))
      .toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),  // the query vector
      (1L, Array(0.0f, 1.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.hybridSearch(docs, "doc_id", "text",
      embs, "vec_id", "embedding", Seq("vector"), queryVec = 0L, kEach = 2)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))
    // lex: d1 (tf 3) rank 1, d2 rank 2; sem: d2 rank 1, d3 rank 2
    assert(out.toSeq == Seq(
      (2L, Some(2), Some(1), 0.032522), // 1/62 + 1/61 — found by both
      (1L, Some(1), None, 0.016393),    // 1/61
      (3L, None, Some(2), 0.016129)))   // 1/62
  }

  /** The integer formulation's whole point: the result is a pure function
    * of the input SET — any repartitioning (any summation order) yields
    * byte-identical output. */
  test("kMeans is partition-invariant on the fixture") {
    val emb = Tables.embeddings(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.kMeans(df, "vec_id", "embedding")
        .orderBy(col("cluster"), col("pos")).collect().toSeq
    assert(run(emb.repartition(7)) == run(emb.coalesce(1)))
  }

  test("annRecall: hits replayed against independently-computed channel outputs") {
    val emb = Tables.embeddings(spark, sf0001)
    val pred = col("vec_id") < 5
    val out = Similarity.annRecall(emb, "vec_id", "label", "embedding", 64, pred)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 10 && out.forall(r => r._3 >= 0 && r._3 <= 10
      && r._4 == r._3 / 10.0), s"audit shape/bounds broke: ${out.toSeq}")
    // replay one method's hits from the channel outputs themselves
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.knnBruteForce(emb, "vec_id", "embedding", pred))
    val ivf = pairs(Similarity.ivfSearch(emb, "vec_id", "label", "embedding", pred))
    val want = ivf.groupBy(_._1).map { case (q, ps) =>
      q -> ps.count(exact.contains).toLong }
    val got = out.filter(_._1 == "ivf").map(r => r._2 -> r._3).toMap
    assert(got == (0L until 5L).map(q => q -> want.getOrElse(q, 0L)).toMap,
      s"ivf hits diverged: $got vs $want")
  }
}
