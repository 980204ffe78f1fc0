package graft

/** Type-drift regression lock (round 11, VERDICT r10 item 8).
  *
  * Every SparkEntry query's ANALYZED output schema must match the golden
  * snapshot in src/test/resources/golden_schemas.txt — field names, order,
  * and exact DataType including decimal precision/scale and integer width.
  * The driver's oracle hash is sensitive at exactly that granularity, so a
  * refactor that drops a pinning cast (e.g. the DECIMAL(38,2) on a
  * sum(DECIMAL(14,2)) or the BIGINT on ntile/row_number) fails HERE, in
  * `sbt test`, instead of in the driver's round gate.
  *
  * Regenerate after a DELIBERATE shape change:
  *   sbt "runMain graft.SchemaGolden"
  */
class OutputSchemaSpec extends SparkSpec {

  private def goldenFile(resource: String): Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(resource), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, value) = line.split("\t", 2)
      name -> value
    }.toMap
    finally src.close()
  }
  private lazy val golden: Map[String, String] =
    goldenFile("/golden_schemas.txt")
  private lazy val goldenPlans: Map[String, String] =
    goldenFile("/golden_plans.txt")

  test("golden plan fingerprints carry no environment leakage") {
    // The canonicalizer promises session-independence; if an exotic node's
    // nodeName ever smuggles a temp path, a warehouse dir, or an
    // expression id into a fingerprint, goldens would break on the next
    // machine. Static check — no Spark needed.
    val leaky = goldenPlans.filter { case (_, plan) =>
      plan.contains("/tmp") || plan.contains("graft_wh") ||
        plan.contains("file:") || plan.matches(".*#\\d+.*")
    }.keys
    assert(leaky.isEmpty,
      s"environment-specific content in golden plans of: ${leaky.toSeq.sorted.mkString(", ")}")
  }

  test("every query has a golden schema and no golden entry is orphaned") {
    val qs = SparkEntry.queries.keySet
    assert((qs -- golden.keySet).isEmpty,
      s"queries missing a golden schema (run `sbt \"runMain graft.SchemaGolden\"`): ${(qs -- golden.keySet).toSeq.sorted.mkString(", ")}")
    assert((golden.keySet -- qs).isEmpty,
      s"golden entries for deleted queries: ${(golden.keySet -- qs).toSeq.sorted.mkString(", ")}")
    assert((qs -- goldenPlans.keySet).isEmpty,
      s"queries missing a golden plan (run `sbt \"runMain graft.SchemaGolden\"`): ${(qs -- goldenPlans.keySet).toSeq.sorted.mkString(", ")}")
    assert((goldenPlans.keySet -- qs).isEmpty,
      s"golden plan entries for deleted queries: ${(goldenPlans.keySet -- qs).toSeq.sorted.mkString(", ")}")
  }

  test("analyzed schemas AND physical plan shapes match golden, no DECIMAL") {
    // All three checks ride ONE DataFrame build per query: streaming query
    // fns run their stream to completion on invocation, so each extra
    // per-query pass would add the full drain cost again (r12 ADVICE
    // item 1 — the decimal check used to be a second pass).
    //  - schema: the driver's oracle hash is type-strict (decimal
    //    precision/scale, int width) — a dropped pinning cast fails here.
    //  - DECIMAL: gate-incompatible output class (round-11 evidence), must
    //    go through DriverOutput.noDecimals in plan AND oracle.
    //  - plan (round 13): the STATIC physical plan shape — a silent
    //    broadcast→SMJ flip, a lost WindowGroupLimit, or a new exchange
    //    fails here instead of surfacing as a bench regression later.
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sf0001)
        val decimalErr =
          if (operators.DriverOutput.hasDecimal(df))
            Some(s"$name: DECIMAL in final output schema — wrap the query " +
              "in DriverOutput.noDecimals and CAST the oracle")
          else None
        val schemaErr = golden.get(name).flatMap { want =>
          val got = SchemaGolden.canonical(df.schema)
          if (got == want) None
          else Some(s"$name:\n  got    $got\n  golden $want")
        }
        val planErr = goldenPlans.get(name).flatMap { want =>
          val got = SchemaGolden.canonicalPlan(df)
          if (got == want) None
          else Some(s"$name PLAN drift (deliberate? rerun SchemaGolden):\n" +
            s"  got    $got\n  golden $want")
        }
        decimalErr.toSeq ++ schemaErr.toSeq ++ planErr.toSeq
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries drifted from their golden schema/plan " +
        s"snapshot:\n${diffs.mkString("\n")}")
  }
}
