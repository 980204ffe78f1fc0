package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Unit locks for `Analytics.recommendItemsCapped` (q226) beyond the
  * oracle gate: the valve must degrade to the uncapped recommender when
  * the caps don't bite, flag exactly the users it truncates, never
  * re-admit owned items, and stay deterministic under repartitioning —
  * the q193/q194 valve-contract checklist applied to the recommender.
  */
class CappedRecommenderSpec extends SparkSpec {

  // Small deterministic basket relation: 12 users, 10 items, membership
  // by a fixed arithmetic rule (user u sees item i iff (u*3 + i*7) % 4
  // != 0) — dense enough that every item co-occurs, irregular enough
  // that scores differ across users.
  private lazy val baskets = {
    val rows = for {
      u <- 1 to 12; i <- 1 to 10
      if (u * 3 + i * 7) % 4 != 0
    } yield (u.toLong, i)
    spark.createDataFrame(rows).toDF("user", "item")
  }

  private def collectRecs(df: org.apache.spark.sql.DataFrame) =
    df.select("user", "rank", "rec", "score", "n_sources")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDecimal(3), r.getLong(4)))
      .toSet

  test("caps that don't bite degrade to recommendItems exactly, capped=false everywhere") {
    val uncapped = Analytics.recommendItems(baskets, "user", "item")
    val capped = Analytics.recommendItemsCapped(baskets, "user", "item",
      maxNeighborsPerItem = 1000, maxContribPerUser = 100000)
    assert(capped.filter(col("capped")).count() == 0,
      "no user should be flagged when caps exceed every fan-out")
    assert(collectRecs(capped) == collectRecs(uncapped),
      "with non-biting caps the valve must be the identity")
  }

  test("a biting per-user cap flags exactly the truncated users") {
    // Every user's contribution count is |seen_u| * min(deg, n) ≈ 60+;
    // C=20 truncates everyone while leaving unowned candidates alive.
    // (A tighter C can legitimately EMPTY the output: the top-C
    // contributions may all point at owned items, which the anti-join
    // then removes — the valve drops candidates, it never re-ranks.)
    val capped = Analytics.recommendItemsCapped(baskets, "user", "item",
      maxNeighborsPerItem = 1000, maxContribPerUser = 20)
    assert(capped.count() > 0)
    assert(capped.filter(!col("capped")).count() == 0,
      "C=20 truncates every user's contribution list — all rows must flag")
    // And each surviving score aggregates at most C contribution rows.
    assert(capped.agg(max(col("n_sources"))).head().getLong(0) <= 20)
  }

  test("owned items are never recommended, capped or not") {
    for (c <- Seq(5, 100000)) {
      val out = Analytics.recommendItemsCapped(baskets, "user", "item",
        maxNeighborsPerItem = 1000, maxContribPerUser = c)
      val owned = out.join(
        baskets.select(col("user"), col("item").as("rec")),
        Seq("user", "rec"), "inner").count()
      assert(owned == 0, s"C=$c recommended an owned item")
    }
  }

  test("per-user output is at most k rows with ranks 1..k") {
    val out = Analytics.recommendItemsCapped(baskets, "user", "item",
      k = 2, maxNeighborsPerItem = 3, maxContribPerUser = 7)
    val per = out.groupBy("user").agg(count(lit(1)).as("n"),
      min(col("rank")).as("lo"), max(col("rank")).as("hi")).collect()
    per.foreach { r =>
      assert(r.getLong(1) <= 2 && r.getInt(2) == 1 && r.getInt(3) <= 2)
    }
  }

  test("deterministic under input repartitioning (total-order caps)") {
    val a = collectRecs(Analytics.recommendItemsCapped(
      baskets.repartition(7), "user", "item",
      maxNeighborsPerItem = 4, maxContribPerUser = 9))
    val b = collectRecs(Analytics.recommendItemsCapped(
      baskets.repartition(2, col("item")), "user", "item",
      maxNeighborsPerItem = 4, maxContribPerUser = 9))
    assert(a == b, "cap survivors must not depend on physical partitioning")
  }
}
