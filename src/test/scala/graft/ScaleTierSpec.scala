package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleTier

/** Invariants of the sf1-tier generator's per-copy text perturbation
  * (tools/ScaleTier.scala). The tier's scaling claims rest on these:
  * distinct targets make cross-copy token sets disjoint (pair-output-bound
  * joins grow ~K×, not K²×), and permutation targets keep `translate`
  * length-preserving so the fixture's `n_chars == length(text)` invariant
  * survives replication.
  */
class ScaleTierSpec extends AnyFunSuite {
  test("copy 0 is the identity target (literal predicates keep original rows)") {
    assert(ScaleTier.targets.head == ScaleTier.alpha)
  }

  test("all ten targets are pairwise distinct (no two copies share a text space)") {
    assert(ScaleTier.targets.distinct.size == ScaleTier.targets.size)
  }

  test("every target is a permutation of the source alphabet (length-preserving, no char merging)") {
    ScaleTier.targets.foreach { t =>
      assert(t.sorted == ScaleTier.alpha.sorted, s"target $t is not a permutation")
    }
  }

  test("any two targets disagree on most positions (cross-copy shingle overlap stays near zero)") {
    val ts = ScaleTier.targets
    for (i <- ts.indices; j <- ts.indices if i < j) {
      val agree = ts(i).zip(ts(j)).count { case (a, b) => a == b }
      assert(agree == 0, s"targets $i/$j agree on $agree positions — rotations of distinct shift never coincide")
    }
  }
}
