package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `-families` bench partition against the headline registry:
  * every listed gate must exist and be headline (a rename must fail here,
  * not silently bench nothing), no gate may appear in two families (it
  * would be double-counted in the total), and the runFamilies catch-all
  * covers anything unlisted — asserted by construction here so the
  * invariant survives new headline gates.
  */
class BenchFamiliesSpec extends AnyFunSuite {
  private val headline = Registry.all.filter(_.headline).map(_.name).toSet
  private val listed = Bench.families.flatMap(_._2)

  test("every family member is a live headline gate") {
    val stale = listed.filterNot(headline)
    assert(stale.isEmpty, s"stale/non-headline gates in Bench.families: $stale")
  }

  test("no gate is double-counted across families") {
    val dups = listed.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicated in Bench.families: $dups")
  }

  test("the PRODUCTION family plan covers the headline set exactly, no dups") {
    // familyPlan is the plan runFamilies executes (not re-derived here):
    // its flattened gate list must be a permutation of the headline set
    val planned = Bench.familyPlan(headline.toSeq.sorted).flatMap(_._2)
    assert(planned.sorted == headline.toSeq.sorted)
    assert(planned.distinct.size == planned.size)
  }
}
