package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (most-recent-prior) join — an operator Spark lacks natively
  * (SURVEY preference order (a): composed from built-ins, no custom
  * SparkPlan needed).
  *
  * Implementation: union the two sides tagged 0/1, one window pass per key
  * ordered by (time, tag), carry `last(right_time, ignoreNulls)` — each left
  * row then holds the greatest right timestamp ≤ its own. One shuffle on the
  * key, linear scan per partition; never a range crossJoin, so it holds at
  * 100 TB (the naive formulation is O(left × right) per key).
  *
  * Ties: a right row at exactly the left row's timestamp matches (tag orders
  * right-before-left), the same inclusive semantics as DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`, which is the oracle.
  */
object AsOf {
  type Q = (SparkSession, String) => DataFrame

  /** Generic as-of join: for each row of `left`, attach the latest `right`
    * row (its `valueCols`) with right.timeCol <= left.timeCol, per keyCol. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("_tag", lit(1))
      .withColumns(valueCols.map(v => s"_r_$v" -> lit(null).cast(
        right.schema(v).dataType)).toMap)
    val rTagged = right.select(
      (Seq(col(keyCol), col(timeCol), lit(0).as("_tag")) ++
        left.columns.filterNot(Seq(keyCol, timeCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(v => col(v).as(s"_r_$v"))): _*)
    val unioned = lTagged.unionByName(rTagged)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(s"_asof_$v",
        last(when(col("_tag") === 0, col(s"_r_$v")), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1)
      .select((left.columns.map(col) ++
        valueCols.map(v => col(s"_asof_$v").as(s"asof_$v"))): _*)
  }

  /** For every purchase event: the user's most recent click at/before it. */
  private val q31: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("value"), col("asof_click_id"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, Q] = Map("q31_asof_join" -> q31)

  val oracles: Map[String, String] = Map(
    "q31_asof_join" -> """
      SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
             round(p.value, 2) AS value, c.click_id AS asof_click_id
      FROM (SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM events
                      WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",
  )
}
