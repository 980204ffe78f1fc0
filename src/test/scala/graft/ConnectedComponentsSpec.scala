package graft

import graft.operators.Dedup

/** Adversarial-topology contracts for connectedComponents: shapes where
  * one-hop min-propagation alone would exceed maxIter (long paths) — the
  * pointer-jumping step must converge in O(log diameter) rounds — plus
  * cycles, stars and disconnected pieces.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH strategies — the driver union-find fast path (default
    * threshold) and the distributed min-label loop (threshold 0) — and
    * asserts they agree before returning; every topology contract below
    * therefore covers both. */
  private def components(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val driver = Dedup.connectedComponents(df, "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(df, "a", "b", maxIter, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist,
      s"driver union-find and distributed min-label disagree: $driver vs $dist")
    driver
  }

  test("60-node path converges well within maxIter=20 (needs pointer jumping)") {
    val path = (0L until 59L).map(i => (i, i + 1))
    val comp = components(path)
    assert(comp.size == 60)
    assert(comp.values.forall(_ == 0L), s"unconverged labels: ${comp.filter(_._2 != 0L)}")
  }

  test("cycle + star + disconnected pair each collapse to their minimum") {
    val cycle = (0L until 10L).map(i => (i, (i + 1) % 10))
    val star = (101L to 110L).map(s => (100L, s))
    val pair = Seq((500L, 501L))
    val comp = components(cycle ++ star ++ pair)
    assert((0L until 10L).forall(comp(_) == 0L))
    assert((100L to 110L).forall(comp(_) == 100L))
    assert(comp(500L) == 500L && comp(501L) == 500L)
  }

  test("two paths merged by one bridge edge form a single component") {
    val p1 = (0L until 20L).map(i => (i, i + 1))
    val p2 = (100L until 120L).map(i => (i, i + 1))
    val comp = components(p1 ++ p2 :+ (20L, 100L))
    assert(comp.values.toSet == Set(0L))
  }

  test("seeded random graph: labels equal a union-find reference exactly") {
    // 200 nodes / 150 random edges — dozens of components of varied shapes
    // in ONE invocation, checked against an independent union-find.
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = (0 until n).map(find)
    // The operator labels edge endpoints only, so the expectation is
    // restricted to that population (isolated ids never appear).
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val endpointMin = nodes.groupBy(x => roots(x.toInt))
      .map { case (r, ns) => r -> ns.min }
    val expected = nodes.map(x => x -> endpointMin(roots(x.toInt))).toMap
    assert(components(edges) == expected)
  }
}
