package graft.tools

/** Declarative 10×-tier coverage ledger (VERDICT r15 item 4) — the q226
  * lesson, institutionalized.
  *
  * Round 15's first tier sweep caught two defects the sf0.1 bench could
  * never show: a fixed recursion-row constant that was a unit mismatch
  * with data scale (q99), and a valve capping the wrong side of a join
  * that priced at 37× for 10× data (q226's first cut). Both shipped
  * oracle-green at sf0.01 — only the 10× measurement exposed them. The
  * smoke discipline has `SmokeCoverageSpec`; until this ledger, the tier
  * had nothing: a new operator could ship with no committed multi-scale
  * price.
  *
  * The gate (`TierCoverageSpec`): every `SparkEntry.queries` name must
  * either have a non-failed row in the committed tier record
  * (`tier_out.json`, short-key → seconds, written by the full-sweep Bench
  * over `tools/ScaleTier` data) or appear in `exempt` with the structural
  * reason a 10× wall-clock row adds nothing. Adding a query without
  * either fails `sbt test` in the same commit — the 37×-class defect can
  * no longer ship unmeasured.
  *
  * To cover a new query: run the tier bench for just it —
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_RUNS=1 \
  *     SPARK_GRAFT_ONLY=<name> sbt "runMain graft.Bench"
  * — merge its row into tier_out.json, and record the ratio vs its sf0.1
  * base in PERF.md (tools/tier_compare.py computes it).
  */
object TierCoverage {

  val tierRecordPath = "tier_out.json"

  /** Short keys ("q01") with a non-failed (>= 0) tier measurement, parsed
    * from the committed tier record. The record is one flat JSON line
    * whose only `"qNN":` keys are the per-query seconds (top-level keys
    * are metric/value/unit/sum_of_mins/runs/queries/sf), so a targeted
    * regex is exact here — no JSON library needed for a file this repo
    * itself writes. */
  def measured(): Set[String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tierRecordPath)),
      "UTF-8")
    val row = """"(q\d+)"\s*:\s*(-?[0-9.]+)""".r
    row.findAllMatchIn(text)
      .collect { case m if m.group(2).toDouble >= 0 => m.group(1) }
      .toSet
  }

  /** query (full name) -> reason no dedicated tier row is required.
    * Deliberately empty today: the r15 sweep ran the FULL 226-query
    * surface (streaming drains and scans included — their flat 0.1–1.2×
    * ratios are themselves the evidence the exemption would have
    * asserted), so every current query is measured, q226's post-redesign
    * 81.2 s row first among them. The map exists for a future operator
    * whose tier run is structurally meaningless (e.g. a driver-side
    * catalog readout); any entry must argue the STRUCTURAL reason, as in
    * SmokeCoverage. */
  val exempt: Map[String, String] = Map.empty
}
