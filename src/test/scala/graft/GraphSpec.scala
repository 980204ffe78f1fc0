package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank contracts: the fixed-point integer recurrence against a
  * hand-computed golden, mass accounting, and partitioning-independence
  * (the property float PageRank cannot give — summation-order invariance). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: path graph a-b-c matches the hand-run integer recurrence") {
    // Undirected path: deg(a)=deg(c)=1, deg(b)=2, N=3, r0=333333333 each.
    // Three rounds of r' = 150000000 div 3 + (85 * sum(r div deg)) div 100,
    // worked by hand (each div floors):
    //   r1 = (a 191666666, b 616666666, c 191666666)
    //   r2 = (a 312083333, b 375833332, c 312083333)
    //   r3 = (a 209729166, b 580541666, c 209729166)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("b" -> 580541666L, "a" -> 209729166L,
      "c" -> 209729166L), s"got ${got.toSeq}")
  }

  test("pageRank: mass is conserved up to deterministic div-floor leakage") {
    val edges = spark.range(200)
      .select(concat(lit("n"), col("id") % 50).as("s"),
        concat(lit("n"), (col("id") * 7 + 3) % 50).as("d"))
    val all = Graph.pageRank(edges, "s", "d", iters = 3, topK = 1000)
      .collect().map(_.getLong(1))
    assert(all.forall(_ > 0L))
    val total = all.sum
    // Each node leaks < deg units per round to rank-split flooring plus
    // < 100 units to the damping div and < nn to the teleport div; with
    // N <= 50 and 3 rounds the loss is far under 0.1% of Scale.
    assert(total <= Graph.Scale)
    assert(total >= Graph.Scale - Graph.Scale / 1000,
      s"leaked too much mass: $total of ${Graph.Scale}")
  }

  test("triangleCount: K4 plus a pendant edge has exactly 4 triangles") {
    // K4 has C(4,3) = 4 triangles; the pendant node adds none. Input is
    // deliberately directed/duplicated — symmetrize + distinct must absorb it.
    val k4 = for { i <- 1 to 4; j <- 1 to 4 if i != j } yield (s"n$i", s"n$j")
    val edges = (k4 :+ ("n4" -> "n5")).toDF("s", "d")
    val row = Graph.triangleCount(edges, "s", "d").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((5L, 7L, 4L)),
      s"got $row") // 5 nodes, 6 K4 edges + 1 pendant, 4 triangles
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    val edges = (for { c <- 1 to 6; s <- 1 to 3 if (c + s) % 2 == 0 }
      yield (s"c$c", s"s$s")).toDF("s", "d")
    assert(Graph.triangleCount(edges, "s", "d").collect().head.getLong(2) == 0L)
  }

  test("shortestPaths: hand graph distances; unreachable and over-depth excluded") {
    // Path a-b-c-d-e plus a shortcut a-c; island x-y unreachable.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "c"), ("x", "y")).toDF("s", "d")
    val got = Graph.shortestPaths(edges, "s", "d", "a", maxDepth = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // The a-c shortcut makes c dist 1 and d dist 2; e is dist 3 > maxDepth.
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2), s"got $got")
  }

  test("shortestPaths: early exit returns the full component, edges undirected") {
    // Directed input b->a; BFS from a must still reach b (symmetrized).
    val edges = Seq(("b", "a"), ("b", "c")).toDF("s", "d")
    val got = Graph.shortestPaths(edges, "s", "d", "a", maxDepth = 50)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2), s"got $got")
  }

  test("pageRank: identical results regardless of input partitioning") {
    val edges = spark.range(300)
      .select(concat(lit("x"), col("id") % 40).as("s"),
        concat(lit("x"), (col("id") * 13 + 1) % 40).as("d"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, "s", "d", iters = 3, topK = 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // Integer mass means the neighbor sum is associative-safe: any
    // partitioning (and so any partial-aggregation order) gives the SAME
    // longs — this is the property that makes the operator hash-gateable
    // and cluster-reproducible, and it would fail for float ranks.
    assert(run(edges.repartition(1)) == run(edges.repartition(16)))
  }

  /** K5 with a pendant path hanging off it: the 4-core is exactly the K5
    * (the path peels away over CASCADING rounds — removing p3 drops p2
    * below threshold, and so on — exercising the fixpoint loop, not just
    * the initial degree filter). */
  test("kCore: K5 plus a pendant path peels down to the clique") {
    val k5 = for (i <- 1 to 5; j <- 1 to 5 if i < j) yield (s"v$i", s"v$j")
    val path = Seq(("v1", "p1"), ("p1", "p2"), ("p2", "p3"))
    val edges = (k5 ++ path).toDF("src", "dst")
    val core = Graph.kCore(edges, "src", "dst", k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("v1" -> 4L, "v2" -> 4L, "v3" -> 4L, "v4" -> 4L, "v5" -> 4L))
    // k above the max degree: empty core, loop exits on n == 0.
    assert(Graph.kCore(edges, "src", "dst", k = 7).count() == 0L)
  }

  test("kCore: identical results regardless of input partitioning") {
    val edges = Graph.custSuppEdges(spark, sf0001)
    def run(e: org.apache.spark.sql.DataFrame) =
      Graph.kCore(e, "src", "dst", k = 4).orderBy("node")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(run(edges.repartition(1)) == run(edges.repartition(16)))
  }

  test("labelPropagation: equals a driver-side synchronous replay on a seeded graph") {
    val rnd = new scala.util.Random(7)
    val raw = (1 to 120).map(_ =>
      (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}")).distinct
    val edges = raw.toDF("src", "dst")
    val got = Graph.labelPropagation(edges, "src", "dst", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // independent replay: adjacency sets, 3 synchronous rounds,
    // (max count, then min label) argmax
    val und = raw.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.distinct).toMap
    var lbl: Map[String, String] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (n, ns) =>
        val cnts = ns.groupBy(lbl).view.mapValues(_.size).toSeq
        n -> cnts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == lbl, "synchronous LPA must equal the hand replay exactly")
  }

  test("labelPropagation: disjoint cliques converge to per-clique min label; partition-invariant") {
    val k1 = for (i <- 1 to 4; j <- 1 to 4 if i < j) yield (s"a$i", s"a$j")
    val k2 = for (i <- 1 to 4; j <- 1 to 4 if i < j) yield (s"b$i", s"b$j")
    val edges = (k1 ++ k2).toDF("src", "dst")
    def run(e: org.apache.spark.sql.DataFrame) =
      Graph.labelPropagation(e, "src", "dst", rounds = 4)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val r1 = run(edges.repartition(1))
    assert(r1.filter(_._1.startsWith("a")).values.toSet == Set("a1"))
    assert(r1.filter(_._1.startsWith("b")).values.toSet == Set("b1"))
    assert(r1 == run(edges.repartition(16)))
  }

  test("neighborhoodAgg: hand replay on a path; duplicate edges collapse; exact sums") {
    import spark.implicits._
    // path a - b - c (with the a-b edge duplicated and reversed once),
    // features a=1.10, b=2.20, c=4.40
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"))
      .toDF("s", "t")
    val feats = Seq(("a", 1.10), ("b", 2.20), ("c", 4.40)).toDF("n", "f")
    val out = Graph.neighborhoodAgg(edges, "s", "t", feats, "n", "f")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString))
      .toMap
    // h1: a=f(b)=2.20, b=f(a)+f(c)=5.50, c=f(b)=2.20
    // h2: a=h1(b)=5.50, b=h1(a)+h1(c)=4.40, c=h1(b)=5.50
    assert(out("a") == (1L, "2.20", "5.50"), s"a diverged: ${out("a")}")
    assert(out("b") == (2L, "5.50", "4.40"), s"b diverged: ${out("b")}")
    assert(out("c") == (1L, "2.20", "5.50"), s"c diverged: ${out("c")}")
  }
}
