package graft.tools

/** Declarative sf0.1 correctness-coverage ledger (round 16) — the
  * TierCoverage discipline applied to the bench-scale ORACLE record.
  *
  * Round 16's first sf0.1 gate run caught three real cross-engine
  * divergences that four rounds of green sf0.01 gates had masked (q193's
  * NULL-dropped empty-part families, q194's digest-separator prefix-order
  * flip, q49's exact rounding boundary — PERF.md round-16 section). The
  * record (`CORRECTNESS_SF01.json`) only stays meaningful if it keeps up
  * with the surface: this ledger + `Sf01CoverageSpec` require every
  * `SparkEntry.queries` name to carry a PASSING entry in the committed
  * record (or a documented exemption), so a new query cannot ship
  * certified at fixture scale only.
  *
  * To certify a new query at sf0.1 (the q227–q230 recipe, ~1 min/query):
  *   sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/vq <name>"
  *   # copy <name>/ + a one-entry oracle_sql.json into a scratch dir,
  *   python3 tools/check_oracle.py <scratch> /root/testdata/sf0.1
  * then merge the PASS row into CORRECTNESS_SF01.json in the same commit.
  */
object Sf01Coverage {

  val recordPath = "CORRECTNESS_SF01.json"

  /** Full query names with a `"pass": true` entry in the committed
    * record. The record is this repo's own indent=1 json.dump output, so
    * the targeted regex (query key immediately followed by its "pass"
    * field) is exact here — no JSON library needed. */
  def passing(): Set[String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(recordPath)),
      "UTF-8")
    val row = """"(q\d+[a-z0-9_]*)":\s*\{\s*"pass":\s*(true|false)""".r
    row.findAllMatchIn(text)
      .collect { case m if m.group(2) == "true" => m.group(1) }
      .toSet
  }

  /** query -> reason no sf0.1 certification is required. Empty today:
    * all 230 queries (including every streaming drain and the 965k-row
    * q159 answer) are certified. Any future entry must argue the
    * STRUCTURAL reason, as in SmokeCoverage/TierCoverage. */
  val exempt: Map[String, String] = Map.empty
}
