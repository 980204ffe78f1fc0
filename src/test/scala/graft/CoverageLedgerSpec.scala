package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md ledger gate (round 17, VERDICT r16 item 2).
  *
  * COVERAGE.md is the operator→query→check ledger the verdict audits
  * from, and it has drifted silently FIVE separate times (r13 SURVEY
  * rows, r15 bench target, r16's q227–q231 — plus q36/q37, which had no
  * row at all until this spec's first run found them): the new-query
  * checklist says "COVERAGE row" and nothing enforced it. Same pattern as
  * Smoke/Tier/Sf01Coverage: every `SparkEntry.queries` name must appear
  * VERBATIM (full `qNNN_name` form) somewhere in COVERAGE.md, or carry a
  * documented exemption here.
  *
  * Substring containment, not table parsing: the ledger is prose-shaped
  * (three different table layouts plus inline mentions), and the failure
  * mode this gate exists for is a missing NAME, not a malformed row.
  */
class CoverageLedgerSpec extends AnyFunSuite {

  private val ledgerPath = "COVERAGE.md"

  /** query -> reason no COVERAGE.md row is required. Empty today: all 288
    * queries have rows. Any future entry must argue the STRUCTURAL
    * reason, as in SmokeCoverage/TierCoverage/Sf01Coverage. */
  private val exempt: Map[String, String] = Map.empty

  private lazy val text = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ledgerPath)),
    "UTF-8")

  test("every query appears verbatim in COVERAGE.md or is documented exempt") {
    val missing = SparkEntry.queries.keySet
      .filterNot(n => text.contains(n) || exempt.contains(n))
    assert(missing.isEmpty,
      s"queries with NO COVERAGE.md mention and NO documented exemption " +
        s"(add the ledger row in the same commit as the query): " +
        s"${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no stale or overlapping exemptions") {
    val staleEx = exempt.keySet -- SparkEntry.queries.keySet
    assert(staleEx.isEmpty,
      s"exempt entries for queries that no longer exist: " +
        s"${staleEx.toSeq.sorted.mkString(", ")}")
    val thin = exempt.filter(_._2.trim.length < 40).keys
    assert(thin.isEmpty,
      s"exemption reasons too thin to count as documented: " +
        s"${thin.toSeq.sorted.mkString(", ")}")
  }
}
