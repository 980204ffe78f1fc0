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

  private lazy val golden: Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_schemas.txt"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, schema) = line.split("\t", 2)
      name -> schema
    }.toMap
    finally src.close()
  }

  test("every query has a golden schema and no golden entry is orphaned") {
    val qs = SparkEntry.queries.keySet
    assert((qs -- golden.keySet).isEmpty,
      s"queries missing a golden schema (run `sbt \"runMain graft.SchemaGolden\"`): ${(qs -- golden.keySet).toSeq.sorted.mkString(", ")}")
    assert((golden.keySet -- qs).isEmpty,
      s"golden entries for deleted queries: ${(golden.keySet -- qs).toSeq.sorted.mkString(", ")}")
  }

  test("analyzed output schemas match the golden snapshot exactly, no DECIMAL") {
    // The DECIMAL check (round-11 driver evidence: the gate hash
    // canonicalizes DECIMAL cells scale-insensitively on one side only, so
    // value- and type-identical decimal outputs still hash-mismatch when a
    // cell carries trailing zeros; policy = exact decimal arithmetic stays
    // INTERNAL, every final decimal column casts to DOUBLE via
    // DriverOutput.noDecimals in both the plan and the oracle) rides the
    // SAME DataFrame build as the golden comparison: streaming query fns
    // run their stream to completion on invocation, so a separate
    // per-query decimal pass would double this suite's runtime for a
    // nearly-redundant check (r12 ADVICE item 1).
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
        decimalErr.toSeq ++ schemaErr.toSeq
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries drifted from their golden output schema " +
        s"(type-sensitive driver hash!):\n${diffs.mkString("\n")}")
  }
}
