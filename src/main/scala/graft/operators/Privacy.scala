package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Privacy auditing for training-data release (north-star: a corpus is not
  * shippable until its re-identification surface is measured). The PII
  * *scrubbing* operator lives in TextAnalysis (q58); this module holds the
  * complementary *audit* side — the k-anonymity / l-diversity report a
  * data-release review runs over the quasi-identifier columns that survive
  * scrubbing.
  *
  * The reference has no privacy surface (it is a sort/shuffle kernel —
  * MapReduce.h:136-371); this is additive north-star capability, built as
  * one keyed aggregate so it holds at 100 TB: the shuffle key is the QI
  * tuple, the audit is a single groupBy with map-side partials, and the
  * output is bounded by the number of equivalence classes (≪ rows).
  */
object Privacy {
  type Q = (SparkSession, String) => DataFrame

  /** k-anonymity / l-diversity audit over quasi-identifier columns.
    *
    * Groups the table by the QI tuple (each row's equivalence class — the
    * set of records an attacker who knows the QIs cannot tell apart) and
    * reports, per class: its size, the number of DISTINCT sensitive values
    * (the class's l-diversity — a k-anonymous class with l = 1 still leaks
    * the sensitive value outright), whether it violates k-anonymity
    * (size < k), and the worst-case re-identification probability 1/size.
    *
    * Exactly one shuffle (the QI groupBy, with map-side combine); output
    * is one row per equivalence class. The risk division is a single IEEE
    * double op — bit-identical cross-engine (keySkewProfile's discipline).
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[Column], sensitiveCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"kAnonymityAudit: k must be >= 2, got $k")
    require(qiCols.nonEmpty, "kAnonymityAudit: need at least one QI column")
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sensitiveCol).as("l_distinct"))
      .withColumn("at_risk", col("class_size") < k)
      .withColumn("risk",
        round(lit(1.0) / col("class_size").cast("double"), 4))
  }

  /** q196: the audit over `customer` with QIs (nation, market segment,
    * account-balance bucket at $1000 granularity) and the exact balance as
    * the sensitive attribute. Bucket boundary is floor(acctbal/1000):
    * 2-dp balances land exactly on a boundary only at integer multiples
    * of 1000, where the double division is exact in both engines (binary
    * ratio of representable integers), so the floor is stable. */
  private val q196: Q = (s, d) =>
    kAnonymityAudit(Tables.customer(s, d),
      Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).as("bal_bucket")),
      col("c_acctbal"), k = 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))

  /** Generalization-ladder k-anonymization — the *fix* side of [[kAnonymityAudit]]:
    * walk a fixed coarsening ladder (finer balance buckets → coarser →
    * suppressed; then nation suppressed; then everything) and publish the
    * FIRST level at which every equivalence class reaches size k. This is
    * the classic generalization-lattice walk (Samarati/Sweeney) collapsed
    * to a total-ordered ladder, and the reference's O12 iterative-driver
    * shape applied to privacy: each probe is one tiny keyed aggregate
    * whose 1-row min lands on the driver; the loop re-plans, never
    * re-reads prior state. Suppressed cells generalize to the '*' string
    * (all QI columns stringify so every level shares one schema).
    *
    * The ladder is guaranteed to terminate satisfied — the last level is
    * the single whole-table class. Output: the chosen level's classes.
    *
    * Scale: probes are count aggregates with map-side partials (the k-min
    * check could even early-out via `count < k LIMIT 1`); the output is
    * bounded by the chosen level's class count. */
  def generalizationLadder(df: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"generalizationLadder: k must be >= 2, got $k")
    def bucket(w: Int): Column =
      floor(col("c_acctbal") / w.toDouble).cast("long").cast("string")
    val star = lit("*")
    val nation = col("c_nationkey").cast("string")
    val seg = col("c_mktsegment")
    val levels: Seq[(Column, Column, Column)] = Seq(
      (nation, seg, bucket(1000)),
      (nation, seg, bucket(5000)),
      (nation, seg, star),
      (star, seg, bucket(5000)),
      (star, seg, star),
      (star, star, star))
    def classesAt(l: Int): DataFrame = {
      val (a, b, c) = levels(l)
      df.groupBy(a.as("qi_nation"), b.as("qi_segment"), c.as("qi_bucket"))
        .agg(count(lit(1)).as("class_size"))
        .withColumn("level", lit(l))
    }
    val chosen = levels.indices
      .find { l =>
        // 1-row driver read per probe — the O12 iterative-driver bound.
        classesAt(l).agg(min(col("class_size"))).head.getLong(0) >= k
      }
      .getOrElse(levels.size - 1)
    classesAt(chosen)
      .select(col("level"), col("qi_nation"), col("qi_segment"),
        col("qi_bucket"), col("class_size"))
  }

  private val q201: Q = (s, d) =>
    generalizationLadder(Tables.customer(s, d), k = 5)
      .orderBy(col("qi_nation"), col("qi_segment"), col("qi_bucket"))

  /** Right-to-be-forgotten purge with audit — the GDPR/CCPA deletion pass
    * a data platform must run across every derived table: given a
    * deletion list of subject keys, anti-join each table on its subject
    * column and emit a per-table audit row (rows before / purged / after,
    * plus the distinct subjects actually hit — the number the compliance
    * report wants, which is NOT the list length: subjects with no rows
    * purge nothing). The purge itself is one anti-join per table with the
    * deletion list broadcast (the list is always ≪ the tables); the audit
    * is two counts per table, and nothing rescans a purged table.
    *
    * At 100 TB this is the same plan per table — broadcast anti-join,
    * streamed counts — plus a rewrite of affected files only if the lake
    * layout partitions by subject (the layout q96 certifies). */
  def purgeAudit(tables: Seq[(String, DataFrame, String)],
      subjects: DataFrame, subjectCol: String): DataFrame = {
    val s = subjects.select(col(subjectCol).as("_subj")).distinct()
      .localCheckpoint()
    tables.map { case (name, df, keyCol) =>
      val hit = df.join(broadcast(s), col(keyCol) === col("_subj"),
        "left_semi")
      val kept = df.join(broadcast(s), col(keyCol) === col("_subj"),
        "left_anti")
      val stats = df.agg(count(lit(1)).as("rows_before")).crossJoin(
        hit.agg(count(lit(1)).as("rows_purged"),
          count_distinct(col(keyCol)).as("subjects_hit"))).crossJoin(
        kept.agg(count(lit(1)).as("rows_after")))
      stats.select(lit(name).as("table"), col("rows_before"),
        col("rows_purged"), col("rows_after"), col("subjects_hit"))
    }.reduce(_ unionByName _)
  }

  /** q212: the deletion list derives deterministically (every 13th user);
    * events and orders are the derived tables (orders keys customers, so
    * its subject column is o_custkey). */
  private val q212: Q = (s, d) => {
    val del = Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(13)) === 0)
      .select(col("c_custkey").as("subject"))
    purgeAudit(Seq(
      ("events", Tables.events(s, d), "user_id"),
      ("orders", Tables.orders(s, d), "o_custkey"),
      ("customer", Tables.customer(s, d), "c_custkey")),
      del, "subject")
      .orderBy(col("table"))
  }

  /** t-closeness audit — the third leg of the release-audit triad
    * (k-anonymity bounds class SIZE, l-diversity bounds sensitive
    * VARIETY; both are satisfied by a class whose sensitive DISTRIBUTION
    * still differs wildly from the table's — the attribute-disclosure
    * leak t-closeness measures, Li/Li/Venkatasubramanian ICDE'07).
    * Per equivalence class: the Earth Mover's Distance between the
    * class's ordered-sensitive-bucket distribution and the global one,
    * t = Σ_b |cumP_b − cumQ_b| / (B − 1), flagged against `threshold`.
    *
    * Determinism: cumulative counts are exact integers; cumP and cumQ
    * are ONE IEEE division each; every |cumP − cumQ| term pre-rounds at
    * 9 dp before the B-bounded sum (the q185 PSI discipline); the final
    * /(B−1) is one more division, rounded at 6 dp.
    *
    * Shape: two corpus collapses (global buckets; class × bucket cells,
    * both with map-side partials), then everything lives on the
    * (classes × B)-bounded grid — spine cross-join, bounded cumulative
    * windows, one class-keyed roll-up. */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
      sensBucket: Column, threshold: Double): DataFrame = {
    require(qiCols.nonEmpty, "tClosenessAudit: need at least one QI column")
    require(threshold > 0 && threshold < 1,
      s"tClosenessAudit: threshold must be in (0,1), got $threshold")
    val qi = qiCols.map(col)
    val base = df.select(qi :+ sensBucket.as("_b"): _*).localCheckpoint()
    val global = base.groupBy(col("_b")).agg(count(lit(1)).as("_gn"))
    // NOTE: Spark resolves case-insensitively — "_B" would collide with
    // the bucket column "_b", hence the longer names.
    val nb = global.agg(count(lit(1)).as("_nbuckets"),
      sum(col("_gn")).as("_ntotal"))
    val wg = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Global cumulative counts on the B-bounded bucket frame.
    val gcum = global.withColumn("_gcum", sum(col("_gn")).over(wg))
      .select(col("_b"), col("_gcum"))
    val classes = base.groupBy(qi: _*).agg(count(lit(1)).as("n_class"))
    val cells = base.groupBy(qi :+ col("_b"): _*)
      .agg(count(lit(1)).as("_cn"))
    val grid = classes.crossJoin(broadcast(gcum))
      .join(cells, qiCols :+ "_b", "left")
      .withColumn("_cn", coalesce(col("_cn"), lit(0L)))
    val wc = Window.partitionBy(qi: _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = grid
      .withColumn("_ccum", sum(col("_cn")).over(wc))
      .crossJoin(broadcast(nb))
      .withColumn("_term", round(abs(
        col("_ccum").cast("double") / col("n_class")
          - col("_gcum").cast("double") / col("_ntotal")), 9))
    terms.groupBy(qi :+ col("n_class"): _*)
      .agg(round(sum(col("_term")) / (max(col("_nbuckets")) - 1), 6)
        .as("t_value"))
      .withColumn("violated", col("t_value") > threshold)
  }

  /** q246: QIs (nation, market segment); sensitive = the $1000 balance
    * bucket as the ordered attribute (q196's bucket rule — boundary-safe
    * floor). Completes the audit triad over the same table. */
  private val q246: Q = (s, d) =>
    tClosenessAudit(Tables.customer(s, d),
      Seq("c_nationkey", "c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long"), threshold = 0.25)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  // --------------------------------------------- entropy l-diversity --

  /** ENTROPY l-diversity audit (round 18) — the third leg of the
    * release-audit triad's diversity axis: [[kAnonymityAudit]]'s
    * distinct count (q196) passes a class where one sensitive value
    * holds 99% of the rows (distinct = 5 "diverse"), which is exactly
    * the skew an attacker exploits. Entropy l-diversity (Machanavajjhala
    * et al. 2007) requires −Σ p·ln p ≥ ln(l) per class, i.e. the
    * EFFECTIVE number of sensitive values exp(H) ≥ l — skew-aware where
    * the distinct count is not.
    *
    * Exactness: per-(class, value) counts are exact; each entropy term
    * −p·ln p is ONE identical-operand IEEE chain pre-rounded at 9 dp and
    * pinned to DECIMAL before the class sum (the q185 term rule —
    * order-free), and the verdict compares exp(H) ROUNDED at 6 dp
    * against the integer l, so no libm-boundary constant (ln l) enters
    * the comparison.
    *
    * Shape: ONE keyed exchange — the (class, value) collapse; the
    * per-class total rides a window on the SAME class partitioning
    * (subset key ⇒ sort only, no second exchange); the class roll-up is
    * classes-bounded. */
  def entropyLDiversityAudit(df: DataFrame, qiCols: Seq[Column],
      sensitiveCol: Column, l: Int = 3): DataFrame = {
    require(l >= 2, s"entropyLDiversityAudit: l must be >= 2, got $l")
    require(qiCols.nonEmpty, "entropyLDiversityAudit: need >= 1 QI column")
    val qiNames = qiCols.indices.map(i => s"_qi$i")
    val cells = df
      .select(qiCols.zip(qiNames).map { case (c, n) => c.as(n) } :+
        sensitiveCol.as("_sv"): _*)
      .groupBy((qiNames.map(col) :+ col("_sv")): _*)
      .agg(count(lit(1)).as("_c"))
    val wCls = Window.partitionBy(qiNames.map(col): _*)
    val terms = cells
      .withColumn("_n", sum(col("_c")).over(wCls))
      .withColumn("_t", expr(
        """cast(round(-(cast(_c as double) / _n)
               * ln(cast(_c as double) / _n), 9) as decimal(18,9))"""))
    terms.groupBy(qiNames.map(col): _*)
      .agg(min(col("_n")).as("class_size"),
        count(lit(1)).as("l_distinct"),
        sum(col("_t")).as("_H"))
      .select(qiNames.map(col) ++ Seq(
        col("class_size"), col("l_distinct"),
        round(col("_H").cast("double"), 6).as("entropy"),
        round(exp(col("_H").cast("double")), 6).as("entropy_l"),
        (round(exp(col("_H").cast("double")), 6) >= l).as("ok")): _*)
  }

  private val q256: Q = (s, d) =>
    entropyLDiversityAudit(Tables.customer(s, d),
      Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket")),
      col("c_acctbal"), l = 3)
      .withColumnsRenamed(Map("_qi0" -> "c_nationkey",
        "_qi1" -> "c_mktsegment", "_qi2" -> "bal_bucket"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))

  val queries: Map[String, Q] = Map(
    "q196_k_anonymity" -> q196,
    "q201_generalization" -> q201,
    "q212_gdpr_purge" -> q212,
    "q246_t_closeness" -> q246,
    "q256_entropy_ldiv" -> q256,
  )

  val oracles: Map[String, String] = Map(
    // Replays entropyLDiversityAudit: (class, value) collapse, 9-dp
    // pre-rounded -p*ln p terms, and the exp(H)-vs-integer-l verdict on
    // the ROUNDED effective-value count (no libm ln(l) constant enters).
    "q256_entropy_ldiv" -> """
      WITH cells AS (SELECT c_nationkey, c_mktsegment,
                            CAST(floor(c_acctbal / 1000.0) AS BIGINT)
                              AS bal_bucket,
                            c_acctbal AS sv,
                            CAST(count(*) AS BIGINT) AS c
                     FROM customer GROUP BY 1, 2, 3, 4),
      t AS (SELECT *,
                   CAST(sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment,
                     bal_bucket) AS BIGINT) AS n
            FROM cells),
      t2 AS (SELECT c_nationkey, c_mktsegment, bal_bucket, n,
                    CAST(round(-(CAST(c AS DOUBLE) / n)
                         * ln(CAST(c AS DOUBLE) / n), 9)
                         AS DECIMAL(18,9)) AS tm
             FROM t),
      cls AS (SELECT c_nationkey, c_mktsegment, bal_bucket,
                     CAST(min(n) AS BIGINT) AS class_size,
                     CAST(count(*) AS BIGINT) AS l_distinct,
                     sum(tm) AS h
              FROM t2 GROUP BY 1, 2, 3)
      SELECT c_nationkey, c_mktsegment, bal_bucket, class_size, l_distinct,
             round(CAST(h AS DOUBLE), 6) AS entropy,
             round(exp(CAST(h AS DOUBLE)), 6) AS entropy_l,
             round(exp(CAST(h AS DOUBLE)), 6) >= 3 AS ok
      FROM cls
      ORDER BY c_nationkey, c_mktsegment, bal_bucket""",
    // Replays tClosenessAudit: the bucket rule, global + per-class
    // cumulative counts over the ordered bucket spine, 9-dp pre-rounded
    // |cumP - cumQ| terms, the /(B-1) EMD normalization and the
    // threshold verdict on the ROUNDED t.
    "q246_t_closeness" -> """
      WITH base AS (SELECT c_nationkey, c_mktsegment,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b
                    FROM customer),
      gtab AS (SELECT b, CAST(count(*) AS BIGINT) AS gn
               FROM base GROUP BY 1),
      nb AS (SELECT CAST(count(*) AS BIGINT) AS nB,
                    CAST(sum(gn) AS BIGINT) AS nN
             FROM gtab),
      gcum AS (SELECT b, CAST(sum(gn) OVER (ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS gc
               FROM gtab),
      classes AS (SELECT c_nationkey, c_mktsegment,
                         CAST(count(*) AS BIGINT) AS n_class
                  FROM base GROUP BY 1, 2),
      cells AS (SELECT c_nationkey, c_mktsegment, b,
                       CAST(count(*) AS BIGINT) AS cn
                FROM base GROUP BY 1, 2, 3),
      grid AS (SELECT cl.c_nationkey, cl.c_mktsegment, cl.n_class,
                      g.b, g.gc, coalesce(ce.cn, 0) AS cn
               FROM classes cl CROSS JOIN gcum g
               LEFT JOIN cells ce
                 ON ce.c_nationkey = cl.c_nationkey
                AND ce.c_mktsegment = cl.c_mktsegment AND ce.b = g.b),
      terms AS (SELECT c_nationkey, c_mktsegment, n_class,
                       round(abs(CAST(sum(cn) OVER (
                           PARTITION BY c_nationkey, c_mktsegment
                           ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS DOUBLE) / n_class
                         - CAST(gc AS DOUBLE)
                           / (SELECT nN FROM nb)), 9) AS term
                FROM grid)
      SELECT c_nationkey, c_mktsegment, n_class,
             round(sum(term) / ((SELECT nB FROM nb) - 1), 6) AS t_value,
             round(sum(term) / ((SELECT nB FROM nb) - 1), 6) > 0.25
               AS violated
      FROM terms GROUP BY 1, 2, 3
      ORDER BY c_nationkey, c_mktsegment""",
    // Same single aggregate, independently formulated: class size, distinct
    // sensitive values, k-violation flag, 1/size risk.
    "q196_k_anonymity" -> """
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             count(*) AS class_size,
             count(DISTINCT c_acctbal) AS l_distinct,
             (count(*) < 5) AS at_risk,
             round(1.0 / CAST(count(*) AS DOUBLE), 4) AS risk
      FROM customer
      GROUP BY 1, 2, 3
      ORDER BY c_nationkey, c_mktsegment, bal_bucket""",
    // Replays the whole ladder: every level's classes, per-level min class
    // size, first satisfying level, then that level's classes.
    "q201_generalization" -> {
      val levelSelects = Seq(
        ("0", "CAST(c_nationkey AS VARCHAR)", "c_mktsegment",
          "CAST(CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS VARCHAR)"),
        ("1", "CAST(c_nationkey AS VARCHAR)", "c_mktsegment",
          "CAST(CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS VARCHAR)"),
        ("2", "CAST(c_nationkey AS VARCHAR)", "c_mktsegment", "'*'"),
        ("3", "'*'", "c_mktsegment",
          "CAST(CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS VARCHAR)"),
        ("4", "'*'", "c_mktsegment", "'*'"),
        ("5", "'*'", "'*'", "'*'"))
        .map { case (l, a, b, c) =>
          s"""SELECT $l AS level, $a AS qi_nation, $b AS qi_segment,
                     $c AS qi_bucket, count(*) AS class_size
              FROM customer GROUP BY 2, 3, 4"""
        }.mkString("\nUNION ALL\n")
      s"""
      WITH alln AS ($levelSelects),
      mins AS (SELECT level, min(class_size) AS m FROM alln GROUP BY level),
      chosen AS (SELECT coalesce(min(level), 5) AS level
                 FROM mins WHERE m >= 5)
      SELECT a.level, qi_nation, qi_segment, qi_bucket, class_size
      FROM alln a JOIN chosen c ON a.level = c.level
      ORDER BY qi_nation, qi_segment, qi_bucket"""
    },
    // Per-table before/purged/after + distinct subjects actually hit.
    "q212_gdpr_purge" -> """
      WITH del AS (SELECT DISTINCT c_custkey AS subj FROM customer
                   WHERE c_custkey % 13 = 0),
      a AS (
        SELECT 'events' AS tbl, count(*) AS rows_before,
               sum(CASE WHEN user_id IN (SELECT subj FROM del)
                        THEN 1 ELSE 0 END) AS rows_purged,
               count(DISTINCT CASE WHEN user_id IN (SELECT subj FROM del)
                                   THEN user_id END) AS subjects_hit
        FROM events
        UNION ALL
        SELECT 'orders', count(*),
               sum(CASE WHEN o_custkey IN (SELECT subj FROM del)
                        THEN 1 ELSE 0 END),
               count(DISTINCT CASE WHEN o_custkey IN (SELECT subj FROM del)
                                   THEN o_custkey END)
        FROM orders
        UNION ALL
        SELECT 'customer', count(*),
               sum(CASE WHEN c_custkey IN (SELECT subj FROM del)
                        THEN 1 ELSE 0 END),
               count(DISTINCT CASE WHEN c_custkey IN (SELECT subj FROM del)
                                   THEN c_custkey END)
        FROM customer)
      SELECT tbl AS "table", rows_before,
             CAST(rows_purged AS BIGINT) AS rows_purged,
             CAST(rows_before - rows_purged AS BIGINT) AS rows_after,
             CAST(subjects_hit AS BIGINT) AS subjects_hit
      FROM a ORDER BY tbl""",
  )
}
