package graft.tools

import org.apache.spark.sql.functions._

/** Staged solo profile of q159_setsim_join (VERDICT r15 item 3).
  *
  * q159's quiet-window floor drifted 6.24 → 9.57 s between r14 and r15 on
  * byte-identical, golden-locked code; r13's exoneration of the same query
  * came with a staged per-stage decomposition and r15's did not. This main
  * reproduces that instrument: it mirrors the stages of
  * [[graft.operators.Dedup.setSimilarityJoin]] (Dedup.scala:393 — sets
  * build/checkpoint, max-size bound, pigeonhole candidate join+distinct,
  * verify back-joins + exact intersect) at the bench basis (local[4],
  * 4 shuffle partitions, sf0.1 default) and times each, then the intact
  * end-to-end operator. If internals change, update the mirrored stages —
  * this is a diagnostic, not a lock (DedupSpec + the oracle gate hold the
  * semantics).
  *
  *   sbt "runMain graft.tools.Q159Profile"            # sf0.1, 4 threads
  *   sbt "runMain graft.tools.Q159Profile <dir> <n>"  # other fixture/threads
  */
object Q159Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_q159").toString)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q159prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val (jNum, jDen) = (9, 10)
    val docs = graft.Tables.documents(spark, sfDir)

    // Stage 1: distinct-token sets + 64-bit token hashes, checkpointed
    // (mirrors Dedup.scala's r21 `sets` — hash identities only, no token
    // text in the checkpoint).
    val sets = timed("sets build + localCheckpoint") {
      docs.select(col("doc_id").as("id"),
          expr("array_distinct(filter(split(text, ' '), t -> t != ''))")
            .as("dtoks"))
        .filter(size(col("dtoks")) > 0)
        .withColumn("sz", size(col("dtoks")).cast("long"))
        .withColumn("htoks", expr("array_sort(transform(dtoks, t -> xxhash64(t)))"))
        .select(col("id"), col("sz"), col("htoks"))
        .localCheckpoint()
    }
    val maxSz = timed("max set size agg")(sets.agg(max(col("sz"))).head().getLong(0))
    val m = (2L * maxSz * (jDen - jNum) / (jDen + jNum)).toInt + 1
    println(s"[q159prof] maxSz=$maxSz -> m=$m parts, n=${sets.count()} docs")

    val sigs = sets
      .select(col("id"), col("sz"),
        explode(expr(
          s"""transform(sequence(0, ${m - 1}), part -> struct(part,
              xxhash64(filter(htoks, h -> pmod(h, $m) = part)) as sig))"""))
          .as("ps"))
      .select(col("id"), col("sz"), col("ps.part").as("part"), col("ps.sig").as("sig"))
    val candsRaw = sigs.as("x").join(sigs.as("y"),
        col("x.part") === col("y.part") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id") &&
          col("x.sz") * jNum <= col("y.sz") * jDen &&
          col("y.sz") * jNum <= col("x.sz") * jDen)
      .groupBy(col("x.id").as("id1"), col("y.id").as("id2"),
        col("x.sz").as("sz1"), col("y.sz").as("sz2"))
      .agg(count(lit(1)).as("_mp"))
      .localCheckpoint(false)
    val nDistinct = timed("signature + candidate join + groupBy")(candsRaw.count())
    // r22 match-count filter (mirrors Dedup.setSimilarityJoin): a true
    // pair matches on >= m - d parts, d*(jDen+jNum) <= (sz1+sz2)*(jDen-jNum).
    val cands = candsRaw
      .filter((lit(m) - col("_mp")) * (jDen + jNum)
        <= (col("sz1") + col("sz2")) * (jDen - jNum))
      .select(col("id1"), col("id2"))
      .localCheckpoint(false)
    val nCands = timed("match-count filter")(cands.count())
    println(s"[q159prof] candidate pairs: $nDistinct distinct -> $nCands after count filter")

    val verified = cands
      .join(sets.select(col("id").as("id1"), col("htoks").as("s1"), col("sz").as("sz1")), "id1")
      .join(sets.select(col("id").as("id2"), col("htoks").as("s2"), col("sz").as("sz2")), "id2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .filter(col("inter") * jDen >= (col("sz1") + col("sz2") - col("inter")) * jNum)
    val nTrue = timed("verify joins + exact intersect")(verified.count())
    println(s"[q159prof] true J>=0.9 pairs: $nTrue")

    // End-to-end: the intact operator, both raw and with q159's orderBy,
    // the exact frame Bench writes to noop.
    for (i <- 1 to 3) timed(s"end-to-end setSimilarityJoin noop #$i") {
      graft.operators.Dedup.setSimilarityJoin(docs, "doc_id", "text")
        .orderBy(col("id1"), col("id2"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
