package graft.tools

/** Declarative 30×-probe coverage ledger (round 18, VERDICT r17 item 5) —
  * the second-decade rule, institutionalized.
  *
  * Round 17's 30× probes were chosen by judgment (~15 cost leaders plus
  * each batch's heavy ops) and caught nothing by luck twice: q249's
  * naive rank form priced 6.75× at 10× and was redesigned PRE-commit
  * only because the builder happened to probe it. This ledger makes the
  * check structural: any query that is EXPENSIVE at the 10× tier
  * (committed tier row ≥ 5 s) AND grows super-linearly-looking there
  * (tier ≥ 3× its committed sf0.1 floor) must carry a committed 30×
  * probe row — a `[t10_fresh, t30_fresh]` pair measured in IDENTICAL
  * fresh sessions at both scales — or a documented exemption.
  *
  * Why not the raw "ratio ≥ 3" rule the r17 verdict sketched: on the
  * committed records that obliges ~64 queries, most of them sub-2 s
  * tier rows whose ratio is session fixed-cost noise (tier_compare.py's
  * long-standing caveat). The quadratic-signature class the probe
  * exists to catch prices tens of seconds at 10×; the ≥ 5 s tier guard
  * keeps the obligation on the rows where a second decade is evidence,
  * not noise. The rule is pinned pure in [[obliged]] so the spec can
  * exercise the boundary on synthetic maps.
  *
  * To probe a new obligee (the r17 recipe, PERF.md "Round-17 30x
  * probe"): materialize /tmp/graft_sf1 (K=10) and /tmp/graft_sf3 (K=30)
  * via `graft.tools.ScaleTier`, then run the SAME query list in one
  * fresh session per scale —
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_RUNS=1 \
  *     SPARK_GRAFT_ONLY=<names> sbt "runMain graft.Bench"
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf3 SPARK_GRAFT_RUNS=1 \
  *     SPARK_GRAFT_ONLY=<names> sbt "runMain graft.Bench"
  * — and merge the `[t10, t30]` rows into `tier30_out.json` (same
  * commit), with the slope analysis in PERF.md.
  */
object Tier30Coverage {

  val recordPath = "tier30_out.json"

  /** Short keys with a committed `[t10, t30]` probe row. Same targeted
    * regex discipline as TierCoverage: the record is this repo's own
    * flat one-line format, rows are exactly `"qNN":[a,b]`. */
  def measured(): Map[String, (Double, Double)] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(recordPath)),
      "UTF-8")
    val row = """"(q\d+)"\s*:\s*\[([0-9.]+)\s*,\s*([0-9.]+)\]""".r
    row.findAllMatchIn(text)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
      .toMap
  }

  /** The obligation rule (pure): short keys whose committed 10× tier row
    * is ≥ `minTierSec` AND ≥ `minRatio` × their committed sf0.1 floor.
    * Queries missing a floor (never benched at sf0.1) never oblige —
    * they fail the Sf01/Tier coverage gates first. */
  def obliged(tierSeconds: Map[String, Double],
      sf01Floors: Map[String, Double],
      minTierSec: Double = 5.0, minRatio: Double = 3.0): Set[String] =
    tierSeconds.collect { case (q, t)
      if t >= minTierSec &&
        sf01Floors.get(q).exists(f => f > 0 && t / f >= minRatio) => q
    }.toSet

  /** Per-query seconds from the committed 10× tier record (the same
    * file TierCoverage gates on, parsed to values instead of presence).
    * Failed rows (< 0) are dropped. */
  def tierSeconds(): Map[String, Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(TierCoverage.tierRecordPath)),
      "UTF-8")
    val row = """"(q\d+)"\s*:\s*(-?[0-9.]+)""".r
    row.findAllMatchIn(text)
      .collect { case m if m.group(2).toDouble >= 0 =>
        m.group(1) -> m.group(2).toDouble }
      .toMap
  }

  /** query (short key) -> reason no 30× probe is required despite
    * meeting the obligation rule — parsed from the record's own
    * top-level `"exempt":{...}` object (round 19, VERDICT r18 item 4:
    * the exemption arm was previously a code-side map, auditable only
    * by reading this file; as LEDGER ROWS in `tier30_out.json` itself,
    * exemptions live next to the probes they stand in for, and
    * Tier30CoverageSpec asserts obliged ⊆ probed ∪ exempted with zero
    * silent misses, no overlap, and non-thin reasons). Empty today:
    * every obligee on the committed records carries a probe row. Any
    * future entry must argue the STRUCTURAL reason (≥ 40 chars), as in
    * SmokeCoverage/TierCoverage. */
  def exemptions(): Map[String, String] =
    parseExemptions(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(recordPath)),
      "UTF-8"))

  /** Pure parser for the `"exempt"` object so the spec can exercise the
    * row shape on synthetic records. Parses with a REAL JSON reader
    * (Jackson, already on Spark's classpath) and THROWS on malformed
    * content (ADVICE r19: the previous regex form silently truncated
    * when a reason contained '}' or '"', yielding a smaller exemption
    * map instead of a loud failure — exactly the wrong behavior for a
    * coverage gate's input). Non-object `exempt`, non-string reasons
    * and non-qNN keys all fail loudly too. */
  def parseExemptions(text: String): Map[String, String] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text) // throws JsonProcessingException on malformed JSON
    val ex = root.get("exempt")
    if (ex == null) Map.empty
    else {
      require(ex.isObject, s"tier30 'exempt' must be a JSON object, got: $ex")
      val it = ex.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        require(e.getKey.matches("q\\d+"),
          s"tier30 exemption key must be qNN, got: ${e.getKey}")
        require(e.getValue.isTextual,
          s"tier30 exemption reason for ${e.getKey} must be a string")
        b += e.getKey -> e.getValue.asText()
      }
      b.result()
    }
  }
}
