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
    * record. No JSON library on the main classpath, so this is a
    * targeted regex — but one that tolerates key REORDERING inside each
    * query object (r16 ADVICE: the original required "pass" to be the
    * object's first key, so a record re-emitted by a differently-built
    * dict would silently drop rows past the spec's coarse >=200 size
    * guard). Query objects in this record are flat (no nested braces),
    * so "everything up to the next `}`" is exactly the object body. */
  def passing(): Set[String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(recordPath)),
      "UTF-8")
    val row = """"(q\d+[a-z0-9_]*)":\s*\{([^}]*)\}""".r
    row.findAllMatchIn(text)
      .collect {
        case m if """"pass":\s*true""".r.findFirstIn(m.group(2)).isDefined =>
          m.group(1)
      }
      .toSet
  }

  /** query -> reason no sf0.1 certification is required. Empty today:
    * every query on the surface (288 as of the round-20 close, including every streaming drain and the 965k-row
    * q159 answer) are certified. Any future entry must argue the
    * STRUCTURAL reason, as in SmokeCoverage/TierCoverage. */
  val exempt: Map[String, String] = Map.empty

  /** Certified queries whose CURRENT plan fingerprint no longer matches
    * the fingerprint snapshotted at sf0.1 certification time (round 17,
    * VERDICT r16 item 7): a certification certifies the ANSWERS of a
    * specific plan, so a query whose golden plan changed in a commit
    * without a same-commit re-certification is carrying a stale cert —
    * exactly how q49/q193/q194's rewrites would have shipped uncertified
    * if r16 hadn't re-run them by hand. Pure so the forced-change spec
    * case can exercise it on synthetic maps. A query missing from either
    * map counts stale (a cert must always have a pinned fingerprint). */
  def staleCertifications(certified: Set[String],
      certPlans: Map[String, String],
      goldenPlans: Map[String, String]): Set[String] =
    certified.filter { n =>
      val snap = certPlans.get(n)
      snap.isEmpty || snap != goldenPlans.get(n)
    }
}
