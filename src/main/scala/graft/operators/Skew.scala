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

  val queries: Map[String, Q] = Map("q32_salted_agg" -> q32)

  val oracles: Map[String, String] = Map(
    "q32_salted_agg" -> """
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS total
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
