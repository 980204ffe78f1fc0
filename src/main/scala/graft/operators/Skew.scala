package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation operators (SURVEY §7.5 "skewed keys → salting or AQE").
  *
  * [[saltedAggregate]] is the manual two-phase pattern for aggregations whose
  * key distribution is pathologically skewed (one key ≫ partition capacity):
  * phase 1 groups on (key, salt) — the hot key's rows spread over `salts`
  * partitions and partial-aggregate in parallel — phase 2 merges the ≤salts
  * partials per key. Semantics are identical to a plain groupBy (the oracle
  * is plain GROUP BY), cost is one extra tiny shuffle of (keys × salts) rows.
  * AQE's skew-join handling covers *joins*; aggregation salting is the
  * complementary manual tool, exposed here as a first-class operator.
  */
object Skew {
  type Q = (SparkSession, String) => DataFrame

  /** Row-varying salt in [0, salts): the salt must differ *within* one key's
    * rows (hashing the key would put the hot key in a single salt and defeat
    * the spread), and any assignment is result-correct — phase 2 merges all
    * salts — so uniformity, not stability under AQE re-partitioning, is the
    * only requirement. Explicit hash+pmod keeps that reasoning visible. */
  private def rowSalt(salts: Int): Column =
    pmod(hash(spark_partition_id(), monotonically_increasing_id()), lit(salts))

  /** Two-phase salted sum/count aggregation over `keyCol`. */
  def saltedAggregate(df: DataFrame, keyCol: String, sumCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(salts))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(sumCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }

  /** Salted count/sum of lineitem quantity by returnflag == plain groupBy
    * (the DuckDB oracle is the unsalted formulation). */
  private val q32: Q = (s, d) =>
    saltedAggregate(Tables.lineitem(s, d), "l_returnflag", "l_quantity", 16)
      .select(col("l_returnflag"), col("n"), round(col("total"), 2).as("total"))
      .orderBy(col("l_returnflag"))

  /** Salted join for a skewed key distribution: the (big, skewed) left side
    * gets a pseudo-random salt appended to its key; the (small) right side
    * is exploded to every salt value, so each hot key's rows spread across
    * `salts` partitions while join semantics are unchanged. Classic manual
    * complement to AQE's skew-join splitting (which needs the skew to be
    * visible in map-output sizes); result-identical to the plain join. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(salts))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }

  /** Join-key skew profile — the diagnostic run BEFORE choosing between a
    * plain shuffle join, AQE skew handling, or manual salting: the top-k
    * heaviest keys with their share of the table and the cumulative share,
    * plus the global (rows, distinct-keys) context on every row.
    *
    * Shape: one keyed count aggregate (map-side partial), one 2-row-ish
    * global aggregate, then TakeOrderedAndProject keeps only k rows under
    * the (cnt DESC, key ASC) total order — the rank/cum-share window runs
    * AFTER the k-cut, so its single-partition frame holds exactly k rows
    * (bounded by construction, the warning-free regime). Shares are one
    * IEEE division each — bit-identical cross-engine. */
  def keySkewProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"keySkewProfile: k must be >= 1, got $k")
    // NULL keys stringify to a sentinel BEFORE the (cnt DESC, key ASC)
    // k-cut: Spark orders ASC nulls-first, DuckDB nulls-last, so a null
    // key near the top-k boundary would otherwise rank (and cut)
    // differently cross-engine. '<null>' sorts like an ordinary string in
    // both — and NULL is precisely the hot key a skew profile must show.
    // DOCUMENTED LIMITATION: a genuine string key whose value is literally
    // "<null>" merges with NULL keys in the profile. This is a diagnostic
    // readout (which keys are hot), not a data transform, so the conflation
    // costs at most one blended profile row; callers whose key space can
    // contain the literal token should pre-map NULLs themselves before
    // calling. The q173 oracle mirrors the same sentinel, so the gate pins
    // the choice rather than hiding it.
    val counts = df
      .groupBy(coalesce(col(keyCol).cast("string"), lit("<null>")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key"))
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(w))
      .withColumn("share",
        round(col("cnt").cast("double") / col("total_rows"), 6))
      .withColumn("cum_share",
        round(sum(col("cnt")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .cast("double") / col("total_rows"), 6))
      .select(col("rank"), col("key"), col("cnt"), col("total_rows"),
        col("n_keys"), col("share"), col("cum_share"))
  }

  private val q173: Q = (s, d) =>
    keySkewProfile(Tables.orders(s, d), "o_custkey")
      .orderBy(col("rank"))

  val queries: Map[String, Q] = Map(
    "q32_salted_agg" -> q32,
    "q173_key_skew" -> q173,
  )

  val oracles: Map[String, String] = Map(
    "q32_salted_agg" -> """
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS total
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // Replays count -> k-cut -> rank/cumulative share; single divisions.
    "q173_key_skew" -> """
      WITH counts AS (
        SELECT coalesce(CAST(o_custkey AS VARCHAR), '<null>') AS key,
               count(*) AS cnt
        FROM orders GROUP BY 1),
      totals AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
                        CAST(count(*) AS BIGINT) AS n_keys FROM counts),
      top AS (SELECT key, cnt FROM counts ORDER BY cnt DESC, key LIMIT 10)
      SELECT CAST(row_number() OVER ord AS INT) AS rank, key,
             CAST(cnt AS BIGINT) AS cnt, total_rows, n_keys,
             round(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
             round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, key
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / total_rows, 6) AS cum_share
      FROM top, totals
      WINDOW ord AS (ORDER BY cnt DESC, key)
      ORDER BY rank""",
  )
}
