package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over `embeddings.embedding: ArrayType(FloatType)`
  * (north-star extension, SURVEY §2.3).
  *
  * Cosine is computed in *double* precision via higher-order functions
  * (`zip_with` + `aggregate`, strict left-fold — codegen'd, no UDF), matching
  * the oracle's explicit double formulation; DuckDB's own
  * `list_cosine_similarity` accumulates in float and differs at 1e-7, so the
  * oracle avoids it.
  *
  * Scale paths:
  *  - [[q60]] brute-force top-k: fine when the query side is small (queries ×
  *    corpus is a broadcast-nested-loop with a per-query TakeOrdered);
  *    corpus-only shuffle, no all-pairs materialization.
  *  - [[annLsh]] random-hyperplane LSH: deterministic signed projections
  *    bucket the corpus; candidates are bucket collisions only — the 100 TB
  *    path (bucket join instead of crossJoin), with measured recall in
  *    SimilaritySpec against the brute-force baseline.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** dot(a, b) in double precision as a SQL expression over float arrays. */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"

  private def normExpr(a: String): String =
    s"sqrt(aggregate($a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"

  /** Brute-force cosine top-k: for each query vector (vec_id < 5), the 10
    * nearest corpus vectors by cosine — via the codegen'd
    * [[graft.functions.CosineSimilarity]] expression (same double fold order
    * as the HOF/oracle formulation, so values are bit-compatible). */
  private val q60: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine_raw", expr("cosine_sim(embedding, qe)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Top-20 most-similar pairs corpus-wide (embedding near-dup detection —
    * the data has no pairs above cosine 0.52, so threshold-style dedup is
    * expressed as top-k rather than an empty cut). */
  private val q61: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id1"), col("y.vec_id").as("id2"),
        expr("cosine_sim(x.embedding, y.embedding)").as("cosine_raw"))
      .orderBy(col("cosine_raw").desc, col("id1"), col("id2"))
      .limit(20)
      .select(col("id1"), col("id2"), round(col("cosine_raw"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, j) derived from
    * md5 of the coordinate label — reproducible everywhere, no RNG state. */
  private[operators] def hyperplane(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val h = md.digest(s"plane_${p}_$j".getBytes("UTF-8"))
      // first 4 bytes → int → [-1, 1)
      val v = java.nio.ByteBuffer.wrap(h, 0, 4).getInt
      v.toDouble / Int.MaxValue.toDouble
    }
  }

  private val NumTables = 8 // L hash tables (OR-amplification for recall)
  private val PlanesPerTable = 4 // m planes → 16 buckets per table

  /** Random-hyperplane LSH ANN, multi-table: each vector lands in one bucket
    * per table (sign pattern of m projections); candidates = vectors sharing
    * *any* table's bucket with the query (OR-amplification), then ranked by
    * exact cosine. Signatures are codegen'd expressions — planes are literal
    * arrays in the plan (tiny: L × m × dim doubles). Recall vs the exact q60
    * baseline is measured in PipelineOpsSpec.
    *
    * At 100 TB: the corpus side is one map (signature) + one shuffle on
    * (table, bucket); candidate generation never materializes all-pairs. */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 5, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val dim = 64
    val bucketExprs = (0 until NumTables).map { t =>
      (0 until PlanesPerTable).map { i =>
        val pl = hyperplane(t * PlanesPerTable + i, dim)
        val arr = pl.map(v => f"${v}%.9fD").mkString("array(", ", ", ")")
        s"CASE WHEN ${dotExpr("embedding", arr)} >= 0 THEN ${1 << i} ELSE 0 END"
      }.mkString(" + ")
    }
    val bucketsArr = bucketExprs.mkString("array(", ", ", ")")
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val bucketed = emb.select(col("vec_id"),
      posexplode(expr(bucketsArr))).toDF("vec_id", "tbl", "bucket")
    val qB = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("tbl"), col("bucket"))
    val cand = bucketed.join(broadcast(qB), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("vec_id"))
    cand
      .join(emb, "vec_id")
      .join(broadcast(emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))),
        "qid")
      .withColumn("cosine_raw", expr("cosine_sim(embedding, qe)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  private val q62: Q = (s, d) => annLsh(s, d)

  /** Per-label centroids: element-wise mean via posexplode → (label, pos)
    * aggregate → reassembled array. The coarse-quantizer build step of an
    * IVF index (and a classic embedding-pipeline aggregate on its own).
    * Linear, one shuffle on (label, pos); at 100 TB this is exactly how
    * k-means assignment-step centroids are computed. */
  private val q63: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), (col("pos") + 1).as("pos"), col("col").cast("double").as("v"))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("av"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, av))), x -> round(x.av, 5))")
        .as("centroid"))
      .orderBy(col("label"))

  /** IVF-style ANN: labels act as the inverted-file partitions (the coarse
    * quantizer); per query, probe the `nprobe` partitions whose centroids
    * are most cosine-similar, then exact-rank only within those partitions.
    * Candidate set = corpus ∩ probed partitions — at scale the partition
    * column is the partitioning key, so probing reads only matching
    * partitions (partition pruning), never the full corpus.
    * Mechanism contract (PipelineOpsSpec): results equal brute-force search
    * restricted to the probed partitions. */
  def ivfSearch(s: SparkSession, d: String, nQueries: Int = 5, k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val centroids = emb
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"), col("col").cast("double").as("v"))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("av"))
      .groupBy(col("label"))
      .agg(expr("cast(transform(sort_array(collect_list(struct(pos, av))), x -> float(x.av)) as array<float>)")
        .as("centroid"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("label"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", expr("cosine_sim(qe, centroid)"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qe"), col("label"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("vec_id"))
    emb.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine_raw", expr("cosine_sim(embedding, qe)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        col("label"), round(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  private val q64: Q = (s, d) => ivfSearch(s, d)

  val queries: Map[String, Q] = Map(
    "q60_knn_bruteforce" -> q60,
    "q61_embedding_neardup" -> q61,
    "q62_ann_lsh" -> q62,
    "q63_label_centroids" -> q63,
    "q64_ann_ivf" -> q64,
  )

  private val duckDot =
    "list_sum(list_transform(list_zip(%s, %s), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private val duckNorm =
    "sqrt(list_sum(list_transform(%s, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  val oracles: Map[String, String] = Map(
    "q60_knn_bruteforce" -> s"""
      WITH e AS (SELECT vec_id, embedding, ${duckNorm.format("embedding")} AS nrm
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.qid, e.vec_id,
               ${duckDot.format("e.embedding", "q.qe")} / (e.nrm * q.qn) AS c
        FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
      ranked AS (
        SELECT qid, vec_id, c,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rank
        FROM scored)
      SELECT qid, CAST(rank AS INT) AS rank, vec_id AS neighbor_id,
             round(c, 6) AS cosine
      FROM ranked WHERE rank <= 10 ORDER BY qid, rank""",
    "q61_embedding_neardup" -> s"""
      WITH e AS (SELECT vec_id, embedding, ${duckNorm.format("embedding")} AS nrm
                 FROM embeddings)
      SELECT x.vec_id AS id1, y.vec_id AS id2,
             round(${duckDot.format("x.embedding", "y.embedding")} / (x.nrm * y.nrm), 6) AS cosine
      FROM e x JOIN e y ON x.vec_id < y.vec_id
      ORDER BY ${duckDot.format("x.embedding", "y.embedding")} / (x.nrm * y.nrm) DESC,
               id1, id2
      LIMIT 20""",
    // q62_ann_lsh / q64_ann_ivf intentionally oracle-free: approximate
    // operators — their contracts (recall / mechanism-exactness vs the exact
    // baseline) are asserted in PipelineOpsSpec.
    "q63_label_centroids" -> """
      WITH ex AS (SELECT label, unnest(list_zip(range(1, 65), embedding)) AS z
                  FROM embeddings),
      p AS (SELECT label, CAST(z[1] AS INT) AS pos, CAST(z[2] AS DOUBLE) AS v
            FROM ex),
      a AS (SELECT label, pos, avg(v) AS av FROM p GROUP BY label, pos)
      SELECT label, list(round(av, 5) ORDER BY pos) AS centroid
      FROM a GROUP BY label ORDER BY label""",
  )
}
