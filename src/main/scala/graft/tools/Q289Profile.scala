package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Staged solo profile of q289_bridges (r21 optimization round): mirrors
  * [[graft.operators.Graph.bridges]]' stages at the bench basis and times
  * each — CC roots, BFS loop, parent/non-tree frames, ancestor closure,
  * subtree-XOR verdict — then the intact operator. Diagnostic, not a lock.
  *
  *   sbt "runMain graft.tools.Q289Profile [sfDir] [cpus]"
  */
object Q289Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_q289").toString)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q289prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    import graft.operators.{Dedup, Graph, CrossHash}
    val edges = timed("edge build (lazy)")(
      graft.operators.Graph.queries // touch
    )
    // mirror custSuppEdges
    val e = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
      .join(graft.Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
    val canon = timed("canon distinct + checkpoint") {
      e.select(col("src").as("x"), col("dst").as("y"))
        .filter(col("x") =!= col("y") && col("x").isNotNull && col("y").isNotNull)
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct().localCheckpoint()
    }
    val und = timed("und union + checkpoint")(
      canon.union(canon.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint())
    val roots = timed("CC roots (action)") {
      val r = Dedup.connectedComponents(canon, "a", "b")
        .filter(col("id") === col("component"))
        .select(col("id").as("node")).localCheckpoint()
      println(s"[q289prof] roots: ${r.count()}")
      r
    }
    var levels = roots.withColumn("dist", lit(0)).localCheckpoint()
    var frontier = levels
    var rounds = 0
    var n = frontier.count()
    timed("BFS loop total") {
      // r22 mirror: frontier/levels broadcast into the per-round joins and
      // the per-round checkpoint coalesced to 8 partitions (the operator's
      // bcastIf/compactIf path — these KB frames are always under the 1M-
      // row ceiling at this fixture).
      while (n > 0 && rounds < 24) {
        rounds += 1
        val next = timed(f"  BFS round $rounds") {
          val f = broadcast(frontier.select(col("node")))
          val pre = und.join(f, und("a") === f("node"))
            .select(und("b").as("node")).distinct()
            .join(broadcast(levels.select(col("node"))), Seq("node"), "left_anti")
            .withColumn("dist", lit(rounds))
            .coalesce(8)
          if (rounds == 2) {
            val txt = pre.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get("/tmp/q289_bfs_round_plan.txt"), txt)
            println("[q289prof] round-2 per-round plan -> /tmp/q289_bfs_round_plan.txt")
          }
          pre.localCheckpoint()
        }
        levels = levels.union(next)
        frontier = next
        n = next.count()
      }
    }
    println(s"[q289prof] BFS depth: $rounds")
    val la = levels.select(col("node").as("a"), col("dist").as("_da"))
    val lb = levels.select(col("node").as("b"), col("dist").as("_db"))
    val parent = timed("parent frame + checkpoint") {
      und.join(la, Seq("a")).join(lb, Seq("b"))
        .filter(col("_db") === col("_da") - 1)
        .groupBy(col("a").as("v")).agg(min(col("b")).as("par"))
        .localCheckpoint()
    }
    val nonTree = timed("nonTree + fingerprints") {
      val treeCanon = parent.select(least(col("v"), col("par")).as("a"),
        greatest(col("v"), col("par")).as("b"))
      canon.join(treeCanon, Seq("a", "b"), "left_anti")
        .withColumn("r", expr(CrossHash.h60Expr("concat(a, '|', b)")))
        .localCheckpoint()
    }
    val vals = nonTree.select(col("a").as("v"), col("r"))
      .union(nonTree.select(col("b").as("v"), col("r")))
      .groupBy(col("v")).agg(expr("bit_xor(r)").as("xv"))
    var closure = levels.select(col("node").as("v"), col("node").as("t"))
      .localCheckpoint()
    var jump = parent.select(col("v"), col("par").as("t")).localCheckpoint()
    var span = 1
    timed("closure doubling total") {
      while (span <= rounds) {
        val shifted = jump
          .join(closure.select(col("v").as("t"), col("t").as("t2")), Seq("t"))
          .select(col("v"), col("t2").as("t"))
        closure = closure.union(shifted).localCheckpoint()
        jump = jump.join(jump.select(col("v").as("t"), col("t").as("t2")), Seq("t"))
          .select(col("v"), col("t2").as("t"))
          .localCheckpoint()
        span *= 2
      }
    }
    timed("subtree XOR + verdict (count)") {
      val sub = closure.join(vals, Seq("v"))
        .groupBy(col("t")).agg(expr("bit_xor(xv)").as("sx"))
      val out = parent.join(sub, parent("v") === sub("t"), "left")
        .filter(coalesce(col("sx"), lit(0L)) === 0L)
        .select(least(col("v"), col("par")).as("a"),
          greatest(col("v"), col("par")).as("b"))
      println(s"[q289prof] bridges: ${out.count()}")
    }
    for (i <- 1 to 3) timed(s"end-to-end bridges noop #$i") {
      graft.operators.Graph.queries("q289_bridges")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
