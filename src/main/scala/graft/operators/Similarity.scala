package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over `ArrayType(FloatType)` embedding columns
  * (north-star extension, SURVEY §2.3) — parameterized library functions
  * over any (id, vector) DataFrame; fixture-bound `queries` wrappers feed
  * the driver gate.
  *
  * Cosine runs through the codegen'd [[graft.functions.CosineSimilarity]]
  * expression in double precision (same index-ascending fold as the DuckDB
  * oracle's explicit double formulation — DuckDB's own
  * `list_cosine_similarity` accumulates in float and differs at 1e-7).
  *
  * Three search paths, in increasing scale:
  *  - [[knnBruteForce]]: small query set × corpus broadcast-nested-loop with
  *    partial+final WindowGroupLimit top-k — corpus never shuffles wide;
  *  - [[annLsh]]: multi-table random-hyperplane LSH — candidates are bucket
  *    collisions only (OR-amplified recall);
  *  - [[ivfSearch]]: IVF-style — probe the nprobe nearest coarse-quantizer
  *    partitions, exact-rank only within them (partition pruning at scale).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------ library API

  /** Exact top-k cosine neighbors for each row satisfying `isQuery`. */
  def knnBruteForce(df: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int = 10): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val emb = df.select(col(idCol), col(vecCol))
    val queries = emb.filter(isQuery)
      .select(col(idCol).as("qid"), col(vecCol).as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col(idCol))
    emb.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cosine_raw", expr(s"cosine_sim($vecCol, qe)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neighbor_id"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** Top-N most-similar pairs corpus-wide (embedding near-dup detection as
    * top-k when the corpus has no high-similarity cluster to threshold). */
  def topPairs(df: DataFrame, idCol: String, vecCol: String,
      topN: Int = 20): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val emb = df.select(col(idCol), col(vecCol))
    emb.as("x").join(emb.as("y"), col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id1"), col(s"y.$idCol").as("id2"),
        expr(s"cosine_sim(x.$vecCol, y.$vecCol)").as("cosine_raw"))
      .orderBy(col("cosine_raw").desc, col("id1"), col("id2"))
      .limit(topN)
      .select(col("id1"), col("id2"), round(col("cosine_raw"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, j) derived from
    * md5 of the coordinate label — reproducible everywhere, no RNG state. */
  private[operators] def hyperplane(p: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val h = md.digest(s"plane_${p}_$j".getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(h, 0, 4).getInt
      v.toDouble / Int.MaxValue.toDouble
    }
  }

  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"

  private val NumTables = 8 // L hash tables (OR-amplification for recall)
  private val PlanesPerTable = 4 // m planes → 16 buckets per table

  /** Random-hyperplane LSH ANN, multi-table: each vector lands in one bucket
    * per table (sign pattern of m projections); candidates = vectors sharing
    * *any* table's bucket with a query (OR-amplification), then ranked by
    * exact cosine. Signatures are literal-plane expressions in the plan.
    * Recall vs [[knnBruteForce]] is measured in PipelineOpsSpec.
    *
    * At 100 TB: the corpus side is one map (signature) + one shuffle on
    * (table, bucket); candidate generation never materializes all-pairs. */
  // (no default args here: the fixture-bound overload below carries them,
  // and Scala forbids defaults on two overloads of one name)
  def annLsh(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      isQuery: Column, k: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val bucketExprs = (0 until NumTables).map { t =>
      (0 until PlanesPerTable).map { i =>
        val pl = hyperplane(t * PlanesPerTable + i, dim)
        val arr = pl.map(v => f"${v}%.9fD").mkString("array(", ", ", ")")
        s"CASE WHEN ${dotExpr(vecCol, arr)} >= 0 THEN ${1 << i} ELSE 0 END"
      }.mkString(" + ")
    }
    val bucketsArr = bucketExprs.mkString("array(", ", ", ")")
    val emb = df.select(col(idCol), col(vecCol))
    val bucketed = emb.select(col(idCol), posexplode(expr(bucketsArr)))
      .toDF(idCol, "tbl", "bucket")
    val qB = bucketed.join(emb.filter(isQuery).select(col(idCol)), idCol)
      .select(col(idCol).as("qid"), col("tbl"), col("bucket"))
    val cand = bucketed.join(broadcast(qB), Seq("tbl", "bucket"))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol)).distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col(idCol))
    cand
      .join(emb, idCol)
      .join(broadcast(emb.select(col(idCol).as("qid"), col(vecCol).as("qe"))), "qid")
      .withColumn("cosine_raw", expr(s"cosine_sim($vecCol, qe)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neighbor_id"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** Per-partition centroids: element-wise mean via posexplode →
    * (partition, pos) aggregate → reassembled float array. The coarse-
    * quantizer build step of an IVF index. */
  def centroids(df: DataFrame, partCol: String, vecCol: String): DataFrame =
    df.select(col(partCol), posexplode(col(vecCol)))
      .select(col(partCol), col("pos"), col("col").cast("double").as("v"))
      .groupBy(col(partCol), col("pos"))
      .agg(avg(col("v")).as("av"))
      .groupBy(col(partCol))
      .agg(expr("cast(transform(sort_array(collect_list(struct(pos, av))), x -> float(x.av)) as array<float>)")
        .as("centroid"))

  /** IVF-style ANN: `partCol` values act as the inverted-file partitions;
    * per query, probe the `nprobe` partitions whose centroids are most
    * cosine-similar, then exact-rank only within those partitions. At scale
    * `partCol` is the physical partitioning key, so probing reads only
    * matching partitions (partition pruning), never the full corpus.
    * Mechanism contract (PipelineOpsSpec): results equal brute-force search
    * restricted to the probed partitions. */
  def ivfSearch(df: DataFrame, idCol: String, partCol: String, vecCol: String,
      isQuery: Column, k: Int = 10, nprobe: Int = 3): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val emb = df.select(col(idCol), col(partCol), col(vecCol))
    val cents = centroids(emb, partCol, vecCol)
    val queries = emb.filter(isQuery)
      .select(col(idCol).as("qid"), col(vecCol).as("qe"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col(partCol))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("csim", expr("cosine_sim(qe, centroid)"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qe"), col(partCol))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col(idCol))
    emb.join(broadcast(probes), Seq(partCol))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cosine_raw", expr(s"cosine_sim($vecCol, qe)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neighbor_id"),
        col(partCol), round(col("cosine_raw"), 6).as("cosine"))
  }

  // ------------------------------------------------- fixture-bound queries

  /** Back-compat signature used by PipelineOpsSpec. */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 5, k: Int = 10): DataFrame =
    annLsh(Tables.embeddings(s, d), "vec_id", "embedding", 64,
      col("vec_id") < nQueries, k).orderBy(col("qid"), col("rank"))

  val queries: Map[String, Q] = Map(
    "q60_knn_bruteforce" -> ((s, d) =>
      knnBruteForce(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 5).orderBy(col("qid"), col("rank"))),
    "q61_embedding_neardup" -> ((s, d) =>
      topPairs(Tables.embeddings(s, d), "vec_id", "embedding")),
    "q62_ann_lsh" -> ((s, d) => annLsh(s, d)),
    // Centroid canonicalized to a comma-joined fixed-scale-decimal string
    // (both engines) so the driver's hash compare — which cannot hash array
    // columns — consumes it; decimal(12,5) renders identically in Spark
    // (BigDecimal.toPlainString) and DuckDB (fixed-scale varchar).
    "q63_label_centroids" -> ((s, d) =>
      centroids(Tables.embeddings(s, d), "label", "embedding")
        .select(col("label"),
          expr("""array_join(transform(centroid,
                    x -> cast(cast(round(cast(x as double), 5) as decimal(12,5)) as string)), ',')""")
            .as("centroid"))
        .orderBy(col("label"))),
    "q64_ann_ivf" -> ((s, d) =>
      ivfSearch(Tables.embeddings(s, d), "vec_id", "label", "embedding",
        col("vec_id") < 5).orderBy(col("qid"), col("rank"))),
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
      SELECT label,
             array_to_string(list(CAST(round(CAST(CAST(av AS FLOAT) AS DOUBLE), 5) AS DECIMAL(12,5)) ORDER BY pos), ',') AS centroid
      FROM a GROUP BY label ORDER BY label""",
  )
}
