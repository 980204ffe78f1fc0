package graft

/** Bench-scale (sf0.1) plan-shape lock for the join-strategy-sensitive
  * class (VERDICT r14 item 8).
  *
  * The main plan golden is built at sf0.001, where every table fits under
  * the broadcast threshold — it pins CODE-driven drift but cannot see a
  * size/stats-driven BroadcastHashJoin↔SortMergeJoin flip that only
  * manifests at bench scale (the blind spot README/EXPLAIN.md document).
  * `SchemaGolden.statsSensitive` names the queries whose join selection is
  * stats-driven and whose construction is lazy; this spec re-plans each of
  * them against the sf0.1 fixtures and compares the SAME canonical
  * fingerprint to `golden_plans_sf01.txt`. Planning costs file listing +
  * parquet footers only — no job runs — so the lock is cheap enough for
  * every `sbt test`.
  *
  * Regenerate after a DELIBERATE plan change:
  *   sbt "runMain graft.SchemaGolden"
  */
class StatsPlanSpec extends SparkSpec {

  private lazy val golden: Map[String, String] =
    GoldenFiles.load("/golden_plans_sf01.txt")

  test("sf0.1 golden covers exactly the statsSensitive set") {
    val want = SchemaGolden.statsSensitive.toSet
    assert(want.subsetOf(SparkEntry.queries.keySet),
      s"statsSensitive names unknown queries: ${(want -- SparkEntry.queries.keySet).toSeq.sorted.mkString(", ")}")
    assert(golden.keySet == want,
      s"golden_plans_sf01.txt out of sync (run `sbt \"runMain graft.SchemaGolden\"`): " +
        s"missing=${(want -- golden.keySet).toSeq.sorted.mkString(",")} " +
        s"orphaned=${(golden.keySet -- want).toSeq.sorted.mkString(",")}")
  }

  test("sf0.1 plan fingerprints match golden (stats-driven join strategies pinned at bench scale)") {
    val mismatches = SchemaGolden.statsSensitive.sorted.flatMap { name =>
      val got = SchemaGolden.canonicalPlan(SparkEntry.queries(name)(spark, sf01))
      // golden.get, not golden(name): this test runs independently of the
      // coverage test above, so a missing entry must report the regenerate
      // hint, not a bare NoSuchElementException (r15 ADVICE item 3).
      golden.get(name) match {
        case Some(g) if g == got => None
        case Some(g) => Some(s"$name:\n  golden: $g\n  got:    $got")
        case None => Some(s"$name: missing from golden_plans_sf01.txt — regenerate")
      }
    }
    assert(mismatches.isEmpty,
      s"sf0.1 plan drift (stats-driven strategy flip or deliberate change — " +
        s"regenerate via `sbt \"runMain graft.SchemaGolden\"`):\n${mismatches.mkString("\n")}")
  }
}
