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

  test("temporalJoin over scd2 intervals == brute point-in-interval lookup") {
    import graft.operators.Analytics
    import org.apache.spark.sql.functions.{col, unix_micros}
    // state events per key: (key, ts-micros, id, value); runs collapse (A,A).
    val state = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 50L, 4L, "A"),
      (2L, 40L, 5L, "X")) // key 2 has a single open-ended interval
    val facts = Seq( // (key, t, fid) — includes t before any interval (f0)
      (1L, 5L, "f0"), (1L, 10L, "f1"), (1L, 29L, "f2"), (1L, 30L, "f3"),
      (1L, 49L, "f4"), (1L, 99L, "f5"), (2L, 39L, "g0"), (2L, 40L, "g1"),
      (3L, 7L, "h0")) // key 3 absent from the dimension entirely
    val stDf = state.toDF("k", "usv", "id", "v")
      .select(col("k"), col("id"), col("v"),
        org.apache.spark.sql.functions.timestamp_micros(col("usv")).as("ts"))
    val dim = Analytics.scd2(stDf, "k", "ts", "id", "v")
    val got = AsOf.temporalJoin(facts.toDF("k", "t", "fid"), dim,
        "k", "t", "valid_from_us", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    val exp = facts.map { case (k, t, fid) =>
      // brute: the state value of the latest change at-or-before t
      val runs = state.filter(_._1 == k).sortBy(_._2)
        .foldLeft(List.empty[(Long, String)]) { case (acc, (_, ts, _, v)) =>
          if (acc.headOption.exists(_._2 == v)) acc else (ts, v) :: acc
        }.reverse
      fid -> runs.filter(_._1 <= t).lastOption.map(_._2)
    }.toMap
    assert(got == exp)
  }
}
