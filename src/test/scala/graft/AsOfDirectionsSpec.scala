package graft

import graft.operators.AsOf

/** Mechanism contracts for the directional as-of join against a brute-force
  * reference: backward / forward / nearest × tolerance, on synthetic data
  * with numeric times (the timestamp path is covered by the q31 oracle).
  */
class AsOfDirectionsSpec extends SparkSpec {
  import spark.implicits._

  // left: (k, t, lid); right: (k, t, rv) — right times unique per key.
  private val leftRows = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"),
    (2L, 5L, "d"), (2L, 100L, "e"),
    (3L, 50L, "f")) // key with no right rows at all
  // (1, 33, null): a right row whose VALUE is null — merge_asof semantics
  // attach the nearest row's value (null), never skip back to an older row.
  private val rightRows = Seq(
    (1L, 8L, "r8"), (1L, 20L, "r20"), (1L, 30L, "r30"), (1L, 33L, null),
    (1L, 90L, "r90"), (2L, 40L, "r40"))

  private def run(direction: String, tol: Option[Double]): Map[(Long, Long), Option[String]] =
    AsOf.asofJoin(leftRows.toDF("k", "t", "lid"), rightRows.toDF("k", "t", "rv"),
        "k", "t", Seq("rv"), direction, tol)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(3)))
      .toMap

  private def brute(direction: String, tol: Option[Double]): Map[(Long, Long), Option[String]] =
    leftRows.map { case (k, t, _) =>
      val rs = rightRows.filter(_._1 == k)
      val back = rs.filter(_._2 <= t).sortBy(_._2).lastOption
        .filter(r => tol.forall(x => t - r._2 <= x))
      val fwd = rs.filter(_._2 >= t).sortBy(_._2).headOption
        .filter(r => tol.forall(x => r._2 - t <= x))
      val chosen = direction match {
        case "backward" => back
        case "forward" => fwd
        case "nearest" => (back, fwd) match {
          case (Some(b), Some(f)) => if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      // flatMap: a matched row with a null value and "no match" both surface
      // as None — the same observable output the join produces.
      (k, t) -> chosen.flatMap(r => Option(r._3))
    }.toMap

  for (direction <- Seq("backward", "forward", "nearest");
       tol <- Seq(None, Some(10.0), Some(0.0))) {
    test(s"direction=$direction tolerance=$tol matches brute force") {
      assert(run(direction, tol) == brute(direction, tol))
    }
  }

  test("backward default is unchanged: inclusive ties, null when no prior") {
    val m = run("backward", None)
    assert(m((1L, 20L)) == Some("r20")) // equal-time right matches
    assert(m((2L, 5L)) == None) // no right at/before
    assert(m((3L, 50L)) == None) // key absent from right
  }

  test("randomized matrix with null values matches brute force (seed 42)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val lRows = Seq.tabulate(150)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(400).toLong, s"l$i"))
    // Right times deduped per key: equal-time right rows have no defined
    // winner in either the window carry or the brute force.
    val rRows = Seq.tabulate(150)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(400).toLong,
          if (rnd.nextInt(4) == 0) null else s"r$i"))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val lDf = lRows.toDF("k", "t", "lid")
    val rDf = rRows.toDF("k", "t", "rv")
    for (direction <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(25.0))) {
      val got = AsOf.asofJoin(lDf, rDf, "k", "t", Seq("rv"), direction, tol)
        .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
      val exp = lRows.map { case (k, t, lid) =>
        val rs = rRows.filter(_._1 == k)
        val back = rs.filter(_._2 <= t).sortBy(_._2).lastOption
          .filter(r => tol.forall(x => t - r._2 <= x))
        val fwd = rs.filter(_._2 >= t).sortBy(_._2).headOption
          .filter(r => tol.forall(x => r._2 - t <= x))
        val chosen = direction match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) => if (t - b._2 <= f._2 - t) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
        lid -> chosen.flatMap(r => Option(r._3))
      }.toMap
      assert(got == exp, s"direction=$direction tol=$tol")
    }
  }

  test("null right value: the nearest row's null is attached, not an older value") {
    // left (1, 35): the as-of right row is (33, null) — the round-3 per-value
    // last(ignoreNulls) carry skipped it back to (30, "r30"), pairing the
    // tolerance time from one row with the value of another.
    assert(run("backward", None)((1L, 35L)) == None)
    assert(run("nearest", Some(10.0))((1L, 35L)) == None)
  }
}
