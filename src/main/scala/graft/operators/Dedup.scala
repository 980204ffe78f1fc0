package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication operators over `documents` (north-star extension, SURVEY
  * §2.3): exact, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Cross-engine-verifiable hashing: every hash bottoms out in md5 (available
  * and bit-identical in Spark and DuckDB), parsed to a 60-bit integer, so the
  * MinHash/SimHash pipelines have *exact* integer oracles — no
  * float-tolerance hand-waving in the correctness gate.
  *
  * Scale design (100 TB posture):
  *  - shingling/hashing is embarrassingly parallel map-side work (HOF
  *    expressions, codegen'd, no UDFs);
  *  - MinHash signatures reduce each document to 32 longs regardless of
  *    document size; LSH banding turns all-pairs O(n²) into a groupBy-join on
  *    band signatures — only colliding candidates are compared (the
  *    SURVEY §7.5 "never a blind crossJoin" rule);
  *  - the exact-Jaccard all-pairs form (q53) exists as the small-data oracle
  *    / recall baseline; at scale you run q51 (LSH) instead.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  private val P = 2147483647L // 2^31 - 1, prime modulus for permutation hashes
  private val NumPerms = 32
  private val BandSize = 4 // → 8 bands of 4 rows

  /** Deterministic permutation constants (i → (a, b)), shared verbatim by the
    * Spark plan and the DuckDB oracle below. */
  private val perms: Seq[(Int, Long, Long)] =
    (0 until NumPerms).map { i =>
      (i, (1103515245L * (i + 1)) % P, (12345L + 2654435761L * i) % P)
    }

  /** 60-bit integer from the first 15 hex chars of md5 — the engine-neutral
    * base hash. Spark: conv(hex,16,10); DuckDB: nibble fold (same value). */
  private def h60(colSql: String) =
    s"cast(conv(substring(md5($colSql), 1, 15), 16, 10) as bigint)"

  private val toksExpr = "filter(split(text, ' '), t -> t != '')"

  /** Distinct token 3-gram shingles (docs always have ≥3 tokens: n_chars is
    * 100–500 of space-joined short tokens, FIXTURES.md). */
  private val shinglesExpr =
    """array_distinct(transform(sequence(1, size(toks) - 2),
         i -> concat(element_at(toks, i), '_', element_at(toks, i + 1), '_', element_at(toks, i + 2))))"""

  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("sh"))

  // ---------------------------------------------------------------- queries

  /** Exact dedup by full text: hash-groupBy keeper assignment. Every doc maps
    * to the group's min doc_id; `is_dup` marks rows a dedup pass would drop.
    * (`dropDuplicates("text")` is the one-liner; this form also *audits*.) */
  private val q50: Q = (s, d) => {
    val w = Window.partitionBy(col("text"))
    Tables.documents(s, d)
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("keeper_id"),
        (col("doc_id") =!= col("keeper_id")).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** MinHash + LSH near-dup candidate pairs with estimated Jaccard.
    * shingle → 60-bit hash → 32 permutation min-hashes → 8 LSH bands of 4 →
    * band-signature equality join → signature-overlap estimate.
    *
    * The 32 min-hashes are 32 `min` aggregate columns over the shingle
    * stream — one codegen'd HashAggregate with map-side partials, no
    * (shingle × perm) row expansion (a 32× shuffle-volume saving that holds
    * at any scale). Bands then explode from the signature array: one row per
    * (doc, band) — 8 rows/doc regardless of document size. */
  private val q51: Q = (s, d) => {
    val hashed = shingled(s, d)
      .select(col("doc_id"), (expr(h60("sh")) % P).as("hv"))
    val minCols = perms.map { case (pid, a, b) =>
      min((col("hv") * a + b) % P).as(s"m$pid")
    }
    val sigArr = (0 until NumPerms).map(i => s"m$i").mkString("array(", ", ", ")")
    val sig = hashed.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), expr(sigArr).as("sg"))
    val bandExpr = (0 until NumPerms / BandSize).map { bi =>
      val parts = (0 until BandSize).map(j => s"string(sg[${bi * BandSize + j}])")
      s"concat('$bi', '_', ${parts.mkString(", '_', ")})"
    }.mkString("array(", ", ", ")")
    val bands = sig.select(col("doc_id"), explode(expr(bandExpr)).as("bsig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bsig") === col("y.bsig") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2")).distinct()
    cand
      .join(sig.select(col("doc_id").as("id1"), col("sg").as("sg1")), "id1")
      .join(sig.select(col("doc_id").as("id2"), col("sg").as("sg2")), "id2")
      .withColumn("est_jaccard", round(
        expr("size(filter(zip_with(sg1, sg2, (x, y) -> x = y), v -> v))").cast("double")
          / NumPerms, 4))
      .filter(col("est_jaccard") >= 0.35)
      .select(col("id1"), col("id2"), col("est_jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** SimHash-60 fingerprint per document: per-token 60-bit hash, per-bit
    * ±1 vote weighted by occurrence, sign → bit. Exact integer output.
    * Implemented as 60 parallel aggregate columns over the token stream (one
    * shuffle, no 60× row expansion, stays inside codegen'd HashAggregate). */
  private val q52: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(toksExpr)).as("t"))
      .select(col("doc_id"), expr(h60("t")).as("hv"))
    val votes = (0 until 60).map(j =>
      sum(expr(s"CASE WHEN (shiftright(hv, $j) & 1) = 1 THEN 1 ELSE -1 END"))
        .as(s"b$j"))
    val compose = (0 until 60)
      .map(j => s"CASE WHEN b$j > 0 THEN shiftleft(1L, $j) ELSE 0L END")
      .mkString(" + ")
    tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(compose).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Exact n-gram (shingle) Jaccard similarity — all pairs ≥ 0.5, via the
    * scalable inverted-index set-similarity join: explode shingles, self-join
    * on the shingle, count shared shingles per pair, then
    * J = |∩| / (|A| + |B| − |∩|). Never materializes all-pairs (a pair with
    * J > 0 must share a shingle, so candidates = index collisions only) and
    * never touches quadratic array ops — a 5000-doc corpus is ~1.4M candidate
    * pair-rows instead of 12.5M array intersections, and the shape is a plain
    * shuffle join that scales linearly in index postings. */
  private val q53: Q = (s, d) => {
    // Shingle identity = xxhash64 of the 3 token strings (no intermediate
    // concat string); collisions across the shingle vocabulary are
    // ~|V|²/2⁶⁵ — negligible even at 100 TB vocab. The inverted index is
    // persisted: both self-join branches and the size aggregate read it, and
    // without the persist Spark recomputes the (interpreted-HOF) shingling
    // once per branch.
    val inv = Tables.documents(s, d)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
             i -> xxhash64(element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))"""))
        .as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    inv.as("x").join(inv.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
      .withColumn("jaccard", round(col("inter").cast("double")
        / (col("sz1") + col("sz2") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  val queries: Map[String, Q] = Map(
    "q50_exact_dedup" -> q50,
    "q51_minhash_lsh" -> q51,
    "q52_simhash" -> q52,
    "q53_ngram_jaccard" -> q53,
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB rendering of the 60-bit md5 base hash (same value as h60). */
  private def duckH60(colSql: String) =
    s"""list_reduce(list_concat([CAST(0 AS BIGINT)],
          list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef', substr(md5($colSql), CAST(i AS INT), 1)) - 1 AS BIGINT))),
          (acc, c) -> acc * 16 + c)"""

  private val permsValues =
    perms.map { case (pid, a, b) => s"($pid, $a, $b)" }.mkString(", ")

  private val duckShingles = """
      toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
               FROM documents),
      sh AS (SELECT DISTINCT doc_id,
                    unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                      i -> tk[i] || '_' || tk[i+1] || '_' || tk[i+2]))) AS s
             FROM toks)"""

  val oracles: Map[String, String] = Map(
    "q50_exact_dedup" -> """
      SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keeper_id,
             doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_dup
      FROM documents ORDER BY doc_id""",
    "q51_minhash_lsh" -> s"""
      WITH $duckShingles,
      h AS (SELECT doc_id, (${duckH60("s")}) % $P AS hv FROM sh),
      perms(pid, a, b) AS (VALUES $permsValues),
      mh AS (SELECT doc_id, pid, min((a * hv + b) % $P) AS m
             FROM h CROSS JOIN perms GROUP BY doc_id, pid),
      sig AS (SELECT doc_id, list(m ORDER BY pid) AS sg FROM mh GROUP BY doc_id),
      bands AS (SELECT doc_id, pid // $BandSize AS band,
                       array_to_string(list(m ORDER BY pid), '_') AS bsig
                FROM mh GROUP BY doc_id, pid // $BandSize),
      cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
               FROM bands x JOIN bands y
                 ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
      est AS (SELECT id1, id2,
                     round(CAST(len(list_filter(list_zip(s1.sg, s2.sg), p -> p[1] = p[2])) AS DOUBLE)
                           / $NumPerms, 4) AS est_jaccard
              FROM cand
              JOIN sig s1 ON s1.doc_id = id1
              JOIN sig s2 ON s2.doc_id = id2)
      SELECT id1, id2, est_jaccard FROM est
      WHERE est_jaccard >= 0.35 ORDER BY id1, id2""",
    "q52_simhash" -> s"""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
        FROM documents),
      th AS (SELECT doc_id, ${duckH60("t")} AS hv FROM tok),
      votes AS (
        SELECT doc_id, j,
               sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
        GROUP BY doc_id, j)
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id ORDER BY doc_id""",
    "q53_ngram_jaccard" -> s"""
      WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
                    FROM documents),
      sets AS (SELECT doc_id,
                      list_distinct(list_transform(range(1, len(tk) - 1),
                        i -> tk[i] || '_' || tk[i+1] || '_' || tk[i+2])) AS sh
               FROM toks)
      SELECT x.doc_id AS id1, y.doc_id AS id2,
             round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
      FROM sets x JOIN sets y ON x.doc_id < y.doc_id
      WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(x.sh, y.sh))), 4) >= 0.5
      ORDER BY id1, id2""",
  )
}
