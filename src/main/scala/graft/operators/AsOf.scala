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

  /** Generic as-of join — pandas `merge_asof` surface: for each row of
    * `left`, attach the `valueCols` of the matching `right` row per `keyCol`:
    *
    *  - `direction = "backward"` (default): latest right with
    *    right.time <= left.time (inclusive ties — DuckDB ASOF semantics);
    *  - `"forward"`: earliest right with right.time >= left.time;
    *  - `"nearest"`: whichever of the two is closer in time (tie →
    *    backward, pandas' rule);
    *  - `toleranceSec`: matches farther than this many seconds away are
    *    nulled (applied per direction before the nearest tie-break).
    *
    * Scale shape is unchanged from the single-direction form: ONE shuffle
    * on the key; the forward pass is the same carry under the reversed sort
    * order, so `nearest` costs one extra in-partition sort, never a second
    * exchange and never a range product. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String],
      direction: String = "backward",
      toleranceSec: Option[Double] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val lTagged = left.withColumn("_tag", lit(1))
      .withColumns(valueCols.map(v => s"_r_$v" -> lit(null).cast(
        right.schema(v).dataType)).toMap)
    val rTagged = right.select(
      (Seq(col(keyCol), col(timeCol), lit(0).as("_tag")) ++
        left.columns.filterNot(Seq(keyCol, timeCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(v => col(v).as(s"_r_$v"))): _*)
    val unioned = lTagged.unionByName(rTagged)

    // Backward carry: ascending (time, tag) puts an equal-time right row
    // BEFORE its left row → inclusive. Forward carry: the same frame under
    // the reversed sort (time desc, tag asc) — "preceding" rows then hold
    // larger times, and last() picks the smallest right time >= left time.
    //
    // ONE carried struct per direction: the matched right row's time and its
    // values travel together, so the tolerance/nearest checks and the
    // attached values always come from the SAME right row. (Carrying values
    // individually with last(_r_v, ignoreNulls) skips null right values back
    // to an older row — possibly outside the tolerance — while the carried
    // time stays at the nearest row; merge_asof attaches the nearest row's
    // value, null included.)
    def carry(df: DataFrame, forward: Boolean, prefix: String): DataFrame = {
      val ord = if (forward) Seq(col(timeCol).desc, col("_tag"))
        else Seq(col(timeCol), col("_tag"))
      val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(s"${prefix}s",
        last(when(col("_tag") === 0,
            struct((col(timeCol).as("_t") +:
              valueCols.map(v => col(s"_r_$v").as(s"_r_$v"))): _*)),
          ignoreNulls = true).over(w))
    }

    /** Seconds from a to b (b - a), for timestamp or numeric time columns. */
    def secsFrom(a: Column, b: Column): Column =
      left.schema(timeCol).dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          (unix_micros(b) - unix_micros(a)).cast("double") / 1e6
        case _ => b.cast("double") - a.cast("double")
      }
    def withinTol(dist: Column): Column =
      toleranceSec.map(t => dist <= t).getOrElse(lit(true))

    val needB = direction != "forward"
    val needF = direction != "backward"
    val carried0 = if (needB) carry(unioned, forward = false, "_b_") else unioned
    val carried = if (needF) carry(carried0, forward = true, "_f_") else carried0
    val lRows = carried.filter(col("_tag") === 1)

    def pick(v: String): Column = {
      val bOk = if (needB)
        col("_b_s").isNotNull && withinTol(secsFrom(col("_b_s._t"), col(timeCol)))
      else lit(false)
      val fOk = if (needF)
        col("_f_s").isNotNull && withinTol(secsFrom(col(timeCol), col("_f_s._t")))
      else lit(false)
      direction match {
        case "backward" => when(bOk, col(s"_b_s._r_$v"))
        case "forward" => when(fOk, col(s"_f_s._r_$v"))
        case "nearest" =>
          val bDist = secsFrom(col("_b_s._t"), col(timeCol))
          val fDist = secsFrom(col(timeCol), col("_f_s._t"))
          when(bOk && (!fOk || bDist <= fDist), col(s"_b_s._r_$v"))
            .when(fOk, col(s"_f_s._r_$v"))
      }
    }

    lRows.select((left.columns.map(col) ++
      valueCols.map(v => pick(v).as(s"asof_$v"))): _*)
  }

  /** Gate query for the `nearest` + tolerance arms (round 16 — the two
    * asofJoin directions q31/q121 leave unexercised by the oracle): every
    * purchase joined to the user's nearest click in EITHER direction
    * within 1 hour, null when no click lands inside the window. The
    * oracle is an independent formulation (per-purchase LATERAL min over
    * |gap| with the backward tie preference), so agreement certifies the
    * two-direction carry + tolerance nulling, not a shared recipe. The
    * operator's backward/forward candidates are exactly the per-side
    * nearest rows, so the global |gap| argmin is always one of them.
    * Determinism precondition (ENFORCED — FixtureInvariantSpec asserts it
    * against sf0.001/sf0.01/sf0.1, and it held on the 10× tier): no two
    * clicks of one user share a timestamp — equal-time right rows would
    * make the carry's winner order-dependent, i.e. a flaky oracle gate; a
    * violating fixture regen now fails the spec by name instead. */
  private val q227: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"),
      direction = "nearest", toleranceSec = Some(3600.0))
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("asof_click_id"))
      .orderBy(col("event_id"))
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

  /** Temporal (point-in-interval) join — enrich facts with the dimension
    * attribute valid AT each fact's time, the join every SCD2 dimension
    * exists to serve. Because [[Analytics.scd2]] intervals tile a key's
    * timeline (each `valid_to` equals the next `valid_from`), membership
    * `valid_from <= t < valid_to` is EQUIVALENT to a backward as-of match
    * on `valid_from` alone — so the implementation delegates to
    * [[asofJoin]]'s union-sort carry (one key-partitioned sort, no range
    * join, no per-fact interval probe) instead of an interval-overlap
    * join that Spark would plan as a broadcast nested loop. Facts before a
    * key's first interval get null attributes (left semantics).
    *
    * Determinism caveat shared with every as-of engine: two dim rows of
    * one key with the SAME `validFromCol` value make the winner
    * order-dependent; scd2 emits one run per (key, valid_from) except when
    * two state changes share a timestamp — dedup upstream if the source
    * allows that. */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      timeCol: String, validFromCol: String,
      valueCols: Seq[String]): DataFrame = {
    val dimR = dim.select(
      (col(keyCol) +: col(validFromCol).as(timeCol) +: valueCols.map(col)): _*)
    asofJoin(facts, dimR, keyCol, timeCol, valueCols)
  }

  /** Gate query: SCD2 state (latest signup/purchase event type per user)
    * joined AT TIME onto the click/view stream. The oracle deliberately
    * does NOT replay the scd2 → as-of composition: it answers the same
    * question with DuckDB's native ASOF join against the RAW state events
    * — an independent formulation, so the hash gate certifies that
    * run-collapse + backward-carry computes true point-in-time lookup, not
    * merely that both engines ran the same recipe. */
  private val q121: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val dim = Analytics.scd2(
      ev.filter(col("event_type").isin("signup", "purchase")),
      "user_id", "ts", "event_id", "event_type")
    val facts = ev.filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    temporalJoin(facts, dim, "user_id", "us", "valid_from_us",
      Seq("event_type"))
      .select(col("event_id"), col("user_id"), col("us"),
        col("asof_event_type").as("state"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, Q] = Map(
    "q31_asof_join" -> q31,
    "q121_temporal_join" -> q121,
    "q227_asof_nearest" -> q227)

  val oracles: Map[String, String] = Map(
    "q121_temporal_join" -> """
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      st AS (SELECT user_id, us AS sus, event_type AS state FROM e
             WHERE event_type IN ('signup', 'purchase')),
      f AS (SELECT event_id, user_id, us FROM e
            WHERE event_type IN ('click', 'view'))
      SELECT f.event_id, f.user_id, f.us, st.state
      FROM f ASOF LEFT JOIN st
        ON f.user_id = st.user_id AND f.us >= st.sus
      ORDER BY f.event_id""",
    "q31_asof_join" -> """
      SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
             round(p.value, 2) AS value, c.click_id AS asof_click_id
      FROM (SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM events
                      WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",
    // INDEPENDENT formulation of nearest-within-tolerance: per-purchase
    // LATERAL argmin over |gap| with the backward tie preference —
    // DuckDB's native ASOF is backward-only, so agreement certifies the
    // operator's two-direction carry, tolerance nulling, and tie rule.
    "q227_asof_nearest" -> """
      SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
             c.click_id AS asof_click_id
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN LATERAL (
        SELECT e.event_id AS click_id
        FROM events e
        WHERE e.event_type = 'click' AND e.user_id = p.user_id
          AND abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                  - epoch_us(CAST(p.ts AS TIMESTAMP))) <= 3600000000
        ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                     - epoch_us(CAST(p.ts AS TIMESTAMP))),
                 CASE WHEN e.ts <= p.ts THEN 0 ELSE 1 END
        LIMIT 1) c ON TRUE
      ORDER BY p.event_id""",
  )
}
