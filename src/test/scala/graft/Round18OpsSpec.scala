package graft

import graft.operators.{Analytics, Similarity}
import org.apache.spark.sql.functions._

/** Round-18 ADVICE locks: the pqAudit remainder contract (trailing
  * d mod m dims are dropped, matching the oracle's pos filter) and the
  * attributionModels degenerate-decay guard (w_tot = 0 falls back to
  * the linear split instead of NaN→null dropping the conversion). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ pqAudit remainder --

  test("pqAudit: trailing d mod m dims are dropped (r17 ADVICE contract)") {
    // d = 10, m = 4 => subvector width 2, coded positions 0..7; dims 9
    // and 10 must influence nothing. Corpus A carries junk in the
    // trailing dims; corpus B zeroes them — audits must be identical.
    def vecs(junk: Int => Double) = (0 until 10).map { i =>
      (i.toLong, (0 until 8).map(p => (i * 8 + p) / 10.0) ++
        Seq(junk(i), junk(i) * 2))
    }
    def audit(rows: Seq[(Long, Seq[Double])]) =
      Similarity.pqAudit(rows.toDF("vid", "vec"), "vid", "vec",
          m = 4, k = 8)
        .orderBy(col("sub"), col("code"))
        .as[(Int, Int, Long, Long, Option[Double])].collect().toSeq
    val withJunk = audit(vecs(i => 7.5 * i - 31.0))
    val zeroed = audit(vecs(_ => 0.0))
    assert(withJunk == zeroed)
    assert(withJunk.size == 32) // the full m x k spine survives
  }

  // ----------------------------------- attributionModels degenerate decay --

  test("attributionModels: all-zero decay weights fall back to the linear split (r17 ADVICE)") {
    // One click at t = 0, then purchases every 29 min (sub-gap chain =
    // ONE session) out to 46 * 29 min ≈ 22.2 h. Purchases 45 and 46 sit
    // > 21.4 h after the only touch, so their 9-dp weight rounds to 0
    // and w_tot = 0 — the pre-guard engine emitted NaN→null and the two
    // conversions vanished from decay_credit. The guard defines the
    // degenerate case as the linear split: every model credits exactly
    // one unit per conversion.
    val gapUs = 1740L * 1000000L // 29 min
    val ev = ((0L, "click") +: (1L to 46L).map(i => (i, "purchase")))
      .map { case (i, et) => (7L, i, et, i * gapUs) }
      .toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("timestamp_micros(t)").as("ts"))
    val out = Analytics.attributionModels(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("signup", "view", "click"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("click", 46L, 46.0, 46.0, 46.0)))
  }
}
