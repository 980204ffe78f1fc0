package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Fresh-vs-heated A/B profile of q226_recommend_capped (round 19,
  * VERDICT r18 item 2).
  *
  * q226's session-heat sensitivity has three sightings and no named
  * mechanism: r17 tier full-sweep 60.2 s fresh vs 88.7 s late-session,
  * the r18 32-thread driver window sampling [7.1, 14.8, 36.1, 65.5,
  * 22.1] s, committed quiet floor 6.05 s. This main reproduces the
  * pattern deliberately and attributes it: it times q226 three ways in
  * ONE session — (A) fresh, (B) immediately after a heavy mid-sweep
  * query stretch (the bench's name-order neighborhood), (C) after an
  * explicit System.gc() — while a task listener accumulates the
  * candidate mechanisms per phase:
  *
  *   - jvmGCTime: if B's wall-clock delta is ~its GC-time delta, the
  *     mechanism is heap pressure from session residue;
  *   - memory/diskBytesSpilled: if B spills where A didn't, execution
  *     memory is being squeezed (block residue or fragmentation) and
  *     the contribution sort is paying disk;
  *   - shuffle fetch wait: if B waits where A didn't, it's the shuffle
  *     service / disk contention, not the JVM;
  *   - phase C separates RECLAIMABLE pressure (C ≈ A after a full GC:
  *     the residue was collectable garbage) from structural leaks
  *     (C ≈ B: something is still live).
  *
  * Diagnostic, not a lock — results + the named mechanism go to
  * PERF.md round-19.
  *
  *   sbt "runMain graft.tools.Q226Probe"            # sf0.1, 4 threads
  *   sbt "runMain graft.tools.Q226Probe <dir> <n>"  # other basis
  */
object Q226Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-q226-probe")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_q226").toString)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.cteRecursionRowLimit", graft.Graft.CteRecursionRowCeiling)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gc = new AtomicLong; val memSpill = new AtomicLong
    val diskSpill = new AtomicLong; val fetchWait = new AtomicLong
    val shufWrite = new AtomicLong; val runTime = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          gc.addAndGet(m.jvmGCTime)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          fetchWait.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          runTime.addAndGet(m.executorRunTime): Unit
        }
      }
    })

    def snap() = (gc.get, memSpill.get, diskSpill.get, fetchWait.get,
      shufWrite.get, runTime.get)
    def heapUsed(): Long = {
      val r = Runtime.getRuntime; r.totalMemory - r.freeMemory
    }

    def execOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.unpersistBlocks(df)
      dt
    }

    def phase(label: String, names: Seq[String]): Unit = {
      val before = snap(); val h0 = heapUsed()
      val walls = names.map { n =>
        val w = execOnce(n); println(f"[q226probe] $label $n%-28s $w%7.2f s"); w
      }
      val after = snap()
      val d = after.productIterator.zip(before.productIterator)
        .map { case (a: Long, b: Long) => a - b }.toSeq
      println(f"[q226probe] $label TOTALS wall=${walls.sum}%.2f s " +
        f"gc=${d(0) / 1000.0}%.2f s memSpill=${d(1) / 1e6}%.1f MB " +
        f"diskSpill=${d(2) / 1e6}%.1f MB fetchWait=${d(3) / 1000.0}%.2f s " +
        f"shufWrite=${d(4) / 1e6}%.1f MB taskTime=${d(5) / 1000.0}%.2f s " +
        f"heapBefore=${h0 / 1e6}%.0f MB heapAfter=${heapUsed() / 1e6}%.0f MB " +
        f"rddBlocks=${spark.sparkContext.getRDDStorageInfo.length}")
    }

    val q = "q226_recommend_capped"
    // one untimed warm-up (JIT/codegen), then the fresh baseline
    execOnce(q): Unit
    phase("A-fresh ", Seq(q, q, q))
    // the heavy name-order stretch that precedes q226 in a sweep — the
    // session shape the tier full-sweep and the driver window both had
    val heat = Seq("q214_canonical_pick", "q218_recommend", "q219_cuped",
      "q232_span_scrub", "q234_gram_novelty", "q249_spearman_corr",
      "q187_dedup_audit", "q194_containment_capped", "q159_setsim_join",
      "q53_ngram_jaccard", "q169_skip_stats", "q191_stream_append")
    phase("B-heat  ", heat)
    phase("B-post  ", Seq(q, q, q))
    System.gc(); Thread.sleep(1000); System.gc()
    phase("C-postgc", Seq(q, q, q))
    spark.stop()
  }
}
